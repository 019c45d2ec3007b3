package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // (doc, group, idx, line): 3 docs in g1 — header in all 3 (and TWICE
  // in doc 1: distinct-doc counting must not double-count), "promo" in
  // 2 of 3, bodies unique; doc 4 alone in g2 shares g1's header text
  // (per-GROUP frequency must not leak across groups).
  private def lines = Seq(
    (1L, "g1", 0, "HDR"), (1L, "g1", 1, "body one"), (1L, "g1", 2, "HDR"),
    (2L, "g1", 0, "HDR"), (2L, "g1", 1, "body two"), (2L, "g1", 2, "promo"),
    (3L, "g1", 0, "HDR"), (3L, "g1", 1, "body three"), (3L, "g1", 2, "promo"),
    (4L, "g2", 0, "HDR"), (4L, "g2", 1, "body four")
  ).toDF("doc_id", "grp", "idx", "line")

  test("boilerplateSet: distinct-doc frequency, per group, small groups exempt") {
    val bp = Boilerplate.boilerplateSet(lines, "doc_id", "grp", "line", 0.6)
      .orderBy("grp", "line_md5").collect().toSeq.map(r => (r.getString(0), r.getString(1)))
    // g1: HDR 3/3 (once per doc — the doc-1 repeat must not double-count)
    // and promo 2/3 (0.67 ≥ 0.6) are boilerplate; bodies 1/3 are not.
    // g2 has ONE doc < minGrpDocs=2: every line is trivially "100%
    // frequent" there, so g2 contributes NO boilerplate — a single-page
    // site passes through instead of being wiped.
    val md5 = (s: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(bp.toSet == Set(("g1", md5("HDR")), ("g1", md5("promo"))))
  }

  test("stripLines removes boilerplate, keeps order, keeps all docs") {
    val out = Boilerplate.stripLines(lines, "doc_id", "grp", "idx", "line", 0.6)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 1L, "body one"),
      (2L, 3L, 1L, "body two"),
      (3L, 3L, 1L, "body three"),
      (4L, 2L, 2L, "HDR\nbody four")))  // single-doc group: untouched
  }

  test("reassembly preserves original line order under any input order") {
    val d = Seq(
      (1L, "g", 2, "c"), (1L, "g", 0, "a"), (1L, "g", 1, "b")
    ).toDF("doc_id", "grp", "idx", "line").repartition(3)
    val out = Boilerplate.stripLines(d, "doc_id", "grp", "idx", "line", 1.0,
      minGrpDocs = 1)
    // minGrpDocs=1 deliberately re-enables the degenerate single-doc
    // path: at threshold 1.0 every line is in 100% of (one) docs, all
    // boilerplate → the emptied doc must STILL survive with a row
    assert(out.as[(Long, Long, Long, String)].collect().toSeq ==
      Seq((1L, 3L, 0L, "")))
    val keepAll = Boilerplate.stripLines(
      d.union(Seq((2L, "g", 0, "z")).toDF("doc_id", "grp", "idx", "line")),
      "doc_id", "grp", "idx", "line", 0.9)
    // 2 docs now: each line is in 1/2 < 0.9 → all kept, order restored
    assert(keepAll.where(col("doc_id") === 1L).select("clean_text")
      .as[String].head() == "a\nb\nc")
  }

  test("broadcastSet=false (the many-sites path) is answer-identical") {
    val a = Boilerplate.stripLines(lines, "doc_id", "grp", "idx", "line", 0.6)
      .orderBy("doc_id").collect().toSeq
    val b = Boilerplate.stripLines(lines, "doc_id", "grp", "idx", "line", 0.6,
      broadcastSet = false).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("threshold validation and reserved columns") {
    intercept[IllegalArgumentException] {
      Boilerplate.boilerplateSet(lines, "doc_id", "grp", "line", 0.0)
    }
    intercept[IllegalArgumentException] {
      Boilerplate.stripLines(lines.withColumn("line_md5", lit("x")),
        "doc_id", "grp", "idx", "line", 0.5)
    }
  }
}
