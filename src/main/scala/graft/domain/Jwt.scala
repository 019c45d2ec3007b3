package graft.domain

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** HS256 JSON Web Tokens, JDK-only (`javax.crypto.Mac`) — the session
  * layer the reference issues and reads back (auth.py:29-35 issues a
  * `{sub, exp}` HS256 token; auth.py:55-67 decodes it, rejecting bad
  * signatures and expired claims). Transport (the httponly cookie) is
  * out of engine scope; the token contract itself is here.
  *
  * Payloads are flat `{"sub": string, "exp": long, ...}` objects —
  * exactly what the reference encodes. Verification is strict:
  * structural parse, constant-time signature compare, then expiry.
  */
object Jwt {

  private val b64e = Base64.getUrlEncoder.withoutPadding
  private val b64d = Base64.getUrlDecoder

  private def hmac(data: String, secret: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(UTF_8), "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Issue a token: `{"sub": sub, "exp": now+ttl}` + extra string
    * claims, HS256-signed. `nowEpochSec` is injectable for tests. */
  def create(sub: String, secret: String, ttlSeconds: Long,
      extra: Map[String, String] = Map.empty,
      nowEpochSec: Long = System.currentTimeMillis() / 1000): String = {
    val header = b64e.encodeToString("""{"alg":"HS256","typ":"JWT"}""".getBytes(UTF_8))
    val claims = (Map("sub" -> s""""${jsonEscape(sub)}"""") ++
      extra.map { case (k, v) => k -> s""""${jsonEscape(v)}"""" }) +
      ("exp" -> (nowEpochSec + ttlSeconds).toString)
    val payload = claims.map { case (k, v) => s""""${jsonEscape(k)}":$v""" }
      .mkString("{", ",", "}")
    val signing = header + "." + b64e.encodeToString(payload.getBytes(UTF_8))
    signing + "." + b64e.encodeToString(hmac(signing, secret))
  }

  /** Minimal flat-JSON-object field extraction (string and integer
    * values) — enough for the `{sub, exp, ...}` payloads this module
    * itself mints; anything structurally unexpected verifies as None. */
  private[domain] def parseFlat(json: String): Option[Map[String, String]] = {
    val t = json.trim
    if (!t.startsWith("{") || !t.endsWith("}")) return None
    val fields = scala.collection.mutable.Map.empty[String, String]
    var i = 1
    val end = t.length - 1
    def skipWs(): Unit = while (i < end && t(i).isWhitespace) i += 1
    def parseString(): Option[String] = {
      if (t(i) != '"') return None
      i += 1
      val sb = new StringBuilder
      while (i < end && t(i) != '"') {
        if (t(i) == '\\' && i + 1 < end) {
          t(i + 1) match {
            case '"' => sb.append('"'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case 'u' if i + 5 < end =>
              sb.append(Integer.parseInt(t.substring(i + 2, i + 6), 16).toChar); i += 6
            case c => sb.append(c); i += 2
          }
        } else { sb.append(t(i)); i += 1 }
      }
      if (i >= end) None else { i += 1; Some(sb.toString) }
    }
    skipWs()
    if (i == end) return Some(Map.empty) // {}
    var ok = true
    var done = false
    while (ok && !done) {
      skipWs()
      parseString() match {
        case None => ok = false
        case Some(key) =>
          skipWs()
          if (i >= end || t(i) != ':') ok = false
          else {
            i += 1; skipWs()
            if (i < end && t(i) == '"') parseString() match {
              case Some(v) => fields(key) = v
              case None => ok = false
            } else {
              val start = i
              while (i < end && t(i) != ',' && !t(i).isWhitespace) i += 1
              val raw = t.substring(start, i)
              if (raw.nonEmpty && raw.forall(c => c.isDigit || c == '-')) fields(key) = raw
              else ok = false
            }
            skipWs()
            if (ok) {
              if (i == end) done = true
              else if (t(i) == ',') i += 1
              else ok = false
            }
          }
      }
    }
    if (ok) Some(fields.toMap) else None
  }

  /** Verify signature (constant-time) and expiry; return the claims.
    * `None` for malformed tokens, wrong signatures, non-HS256 headers,
    * and expired claims — the reference's 401 paths (auth.py:60-67). */
  def verify(token: String, secret: String,
      nowEpochSec: Long = System.currentTimeMillis() / 1000): Option[Map[String, String]] = {
    token.split('.') match {
      case Array(h, p, s) =>
        try {
          val headerJson = new String(b64d.decode(h), UTF_8)
          val expected = hmac(h + "." + p, secret)
          val presented = b64d.decode(s)
          for {
            header <- parseFlat(headerJson)
            if header.get("alg").contains("HS256") // no alg-confusion: only HS256 accepted
            if java.security.MessageDigest.isEqual(expected, presented)
            claims <- parseFlat(new String(b64d.decode(p), UTF_8))
            exp <- claims.get("exp")
            expSec <- exp.toLongOption
            if expSec > nowEpochSec
          } yield claims
        } catch { case _: IllegalArgumentException => None } // bad base64
      case _ => None
    }
  }

  /** The subject of a valid, unexpired token — or None. */
  def subject(token: String, secret: String,
      nowEpochSec: Long = System.currentTimeMillis() / 1000): Option[String] =
    verify(token, secret, nowEpochSec).flatMap(_.get("sub"))
}
