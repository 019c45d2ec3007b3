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

  test("incremental: 60% build + 20% Append ≡ one-shot 80% set; batch-only chrome kept") {
    // lines over 10 docs in one group: header in ALL docs; body unique
    val all = (1L to 10L).flatMap(i => Seq(
      (i, "g", 0, "HDR"), (i, "g", 1, s"body $i"))).toDF("doc_id", "grp", "idx", "line")
    val part60 = all.where(col("doc_id") <= 6)
    val part20 = all.where(col("doc_id") > 6 && col("doc_id") <= 8)
    val oneShot80 = all.where(col("doc_id") <= 8)
    val batch = all.where(col("doc_id") > 8)
    val dir = java.nio.file.Files.createTempDirectory("graft-blstats").toString
    val inc = s"$dir/inc"; val one = s"$dir/one"
    try {
      Boilerplate.buildLineStats(part60, "doc_id", "grp", "line", inc)
      Boilerplate.buildLineStats(part20, "doc_id", "grp", "line", inc,
        org.apache.spark.sql.SaveMode.Append)
      Boilerplate.buildLineStats(oneShot80, "doc_id", "grp", "line", one)
      // counts are additive across batches (each doc in exactly one
      // batch), so the folded index must equal the one-shot index
      def set(p: String) = Boilerplate
        .boilerplateSetFromStats(spark, p, "grp", 0.6)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(set(inc) == set(one))
      // strip docs 9..10 against the folded stats: HDR (8/8 index docs)
      // goes; bodies stay — including body 9/10, which the index never
      // saw (batch-only lines keep, by design)
      val out = Boilerplate.stripLinesIncrement(batch, "doc_id", "grp",
          "idx", "line", inc, maxDocFrac = 0.6)
        .orderBy("doc_id").as[(Long, Long, Long, String)].collect().toSeq
      assert(out == Seq((9L, 2L, 1L, "body 9"), (10L, 2L, 1L, "body 10")))
    } finally deleteRecursively(dir)
  }

  test("removeLineStats: negative deltas ≡ one-shot recount over the survivors") {
    // two groups; group g has a header in all docs, group h is small.
    // Removing docs 5..10 flips HDR below the g-threshold AND drops h
    // under minGrpDocs — both must match a survivor recount exactly.
    val all = ((1L to 10L).flatMap(i => Seq(
      (i, "g", 0, "HDR"), (i, "g", 1, s"body $i"))) ++
      Seq((11L, "h", 0, "HH"), (12L, "h", 0, "HH"))).toDF("doc_id", "grp", "idx", "line")
    val removed = all.where(col("doc_id") >= 5L)
    val survivors = all.where(col("doc_id") < 5L)
    val dir = java.nio.file.Files.createTempDirectory("graft-blrm").toString
    val dec = s"$dir/dec"; val one = s"$dir/one"
    try {
      Boilerplate.buildLineStats(all, "doc_id", "grp", "line", dec)
      Boilerplate.removeLineStats(removed, "doc_id", "grp", "line", dec)
      Boilerplate.buildLineStats(survivors, "doc_id", "grp", "line", one)
      def set(p: String, frac: Double) = Boilerplate
        .boilerplateSetFromStats(spark, p, "grp", frac)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      // at every threshold the decremented stats answer like the recount
      for (frac <- Seq(0.3, 0.6, 0.9)) {
        assert(set(dec, frac) == set(one, frac), s"divergence at maxDocFrac=$frac")
      }
      // HDR still passes 0.6 among 4 survivors (4/4); group h is gone
      assert(set(dec, 0.6).exists(_._1 == "g"))
      assert(!set(dec, 0.6).exists(_._1 == "h"))
      // summed raw counts equal the recount's raw counts bit-for-bit
      def freq(p: String) = spark.read.parquet(s"$p/freq")
        .groupBy("grp", "line_md5").agg(sum("n_docs").as("n"))
        .where(col("n") =!= 0L)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(freq(dec) == freq(one))
      // a fully-removed group's rows sum to zero, never negative
      val mins = spark.read.parquet(s"$dec/grps")
        .groupBy("grp").agg(sum("n_docs_grp").as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(mins("h") == 0L && mins("g") == 4L)
    } finally deleteRecursively(dir)
  }

  test("materialize=true evaluates a derived input exactly once (not 4x)") {
    val acc = spark.sparkContext.longAccumulator("line-evals")
    val counting = udf { (s: String) => { acc.add(1L); s } }.asNondeterministic()
    def derived = Seq(
      (1L, "g", 0, "HDR"), (1L, "g", 1, "body one"),
      (2L, "g", 0, "HDR"), (2L, "g", 1, "body two"))
      .toDF("doc_id", "grp", "idx", "line")
      .withColumn("line", counting(col("line")))
    // materialized: the eager localCheckpoint evaluates the 4 input
    // rows once; all four downstream scans read the checkpoint
    Boilerplate.stripLines(derived, "doc_id", "grp", "idx", "line", 0.6,
      materialize = true).collect()
    assert(acc.value == 4L,
      s"derived input evaluated ${acc.value} row-times over 4 rows — " +
        "materialize=true must evaluate the upstream exactly once")
    // and the default really does re-scan (the documented 4x trade),
    // so the knob is load-bearing, not decorative
    acc.reset()
    Boilerplate.stripLines(derived, "doc_id", "grp", "idx", "line", 0.6)
      .collect()
    assert(acc.value > 4L,
      "unmaterialized path no longer re-scans — if the pipeline shape " +
        "changed, re-evaluate whether the materialize knob is still needed")
    // both paths agree on the answer
    val a = Boilerplate.stripLines(derived, "doc_id", "grp", "idx", "line",
      0.6, materialize = true).orderBy("doc_id").drop("clean_text").collect().toSeq
    val b = Boilerplate.stripLines(derived, "doc_id", "grp", "idx", "line",
      0.6).orderBy("doc_id").drop("clean_text").collect().toSeq
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
