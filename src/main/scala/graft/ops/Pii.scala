package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines — a standard
  * pre-training scrub stage (emails, phone numbers, IP addresses) the
  * reference's ecosystem applies before any text reaches a model.
  *
  * All pure `Column` expressions over Spark's codegen'd regexp
  * functions — per-row work, no shuffle, survives a 100 TB scan. The
  * patterns deliberately stay inside the common Java-regex/RE2 subset
  * (no backreferences, no lookaround) so an external engine (the
  * DuckDB oracle, or a downstream RE2-based scrubber) reproduces them
  * byte-for-byte.
  */
object Pii {

  /** Email addresses (pragmatic RFC-lite form). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"

  /** North-American-style phone numbers: optional +1- prefix, then
    * 3-3-4 groups separated by `-` or `.`. */
  val PhoneRe = "(\\+1-)?[0-9][0-9][0-9][-.][0-9][0-9][0-9][-.][0-9][0-9][0-9][0-9]"

  /** Dotted-quad IPv4 (octet ranges not validated — scrubbing wants
    * recall over precision). */
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** http/https URLs up to the next whitespace. */
  val UrlRe = "https?://[^\\s]+"

  /** Registrable domain of a URL (capture group 1). */
  val UrlDomainRe = "https?://([A-Za-z0-9.-]+)"

  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  def emailCount(text: Column): Column = countMatches(text, EmailRe)
  def phoneCount(text: Column): Column = countMatches(text, PhoneRe)
  def ipCount(text: Column): Column = countMatches(text, Ipv4Re)

  /** Redact all supported PII classes with typed placeholders.
    * Order matters: emails before IPs (an email's domain can contain
    * dotted tokens), URLs are left to [[domains]]/filtering — a URL is
    * provenance, not PII, in the reference's pipelines. Phones after
    * IPs so the IP pass cannot eat a phone's digit groups. */
  def redact(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Re, "<IP>")
    regexp_replace(noIp, PhoneRe, "<PHONE>")
  }

  /** All URL domains mentioned in the text (for blocklist joins). */
  def domains(text: Column): Column =
    regexp_extract_all(text, lit(UrlDomainRe), lit(1))

  /** True when the text mentions any domain in the (small, broadcast)
    * blocklist — the pre-join form for a blocklist filter when the
    * list fits in a literal; for large lists use an anti-join on
    * `explode(domains(text))` instead. */
  def mentionsBlockedDomain(text: Column, blocklist: Seq[String]): Column =
    exists(domains(text), d => d.isin(blocklist: _*))
}
