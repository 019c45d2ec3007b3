package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[LmScore]] — stupid-backoff bigram fluency scoring. The gate
  * (`q_lm_fluency`) checks the integer-exact form against DuckDB; this
  * spec pins model arithmetic on a hand-computable corpus, the
  * fluent-beats-gibberish ordering both score forms share, totality
  * (unscorable docs keep a row), and the broadcast plan shape. */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  // target: tiny fluent corpus where every probability is hand-derivable
  private def target = Seq(
    Tuple1("the cat sat"),
    Tuple1("the cat ran"),
    Tuple1("the dog sat")).toDF("text")

  private def model = LmScore.train(target, "text")

  test("train: hand-computed stupid-backoff fixed-point probabilities") {
    val trans = model.trans.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // contexts: "the"→{cat:2, dog:1} (c1=3), "cat"→{sat:1, ran:1} (c1=2),
    // "dog"→{sat:1} (c1=1)
    assert(trans(("the", "cat")) == 1000000L * 2 / 3)
    assert(trans(("the", "dog")) == 1000000L / 3)
    assert(trans(("cat", "sat")) == 500000L)
    assert(trans(("dog", "sat")) == 1000000L)
    assert(model.nTokens == 9)
    val uni = model.uni.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni("the") == 3 && uni("sat") == 2 && uni("ran") == 1)
  }

  test("fixed-point scoring: seen transitions, backoff, OOV, totality") {
    val docs = Seq(
      (1L, "the cat sat"),      // all transitions seen
      (2L, "sat the cat"),      // "sat the" unseen → backoff to cu(the)
      (3L, "xyzzy plugh"),      // fully OOV → 0
      (4L, "solo")              // single token → no transitions, still a row
    ).toDF("doc_id", "text")
    val s = LmScore.scoreDocs(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("score"), r.getAs[Long]("n_trans"), r.getAs[Long]("mean_p"))).toMap
    assert(s(1L) == ((1000000L * 2 / 3 + 500000L, 2L, (1000000L * 2 / 3 + 500000L) / 2)))
    // doc 2: "sat the" backs off to 400000*cu(the)//9; "the cat" seen
    assert(s(2L)._1 == 400000L * 3 / 9 + 1000000L * 2 / 3)
    assert(s(3L) == ((0L, 1L, 0L)))
    assert(s(4L) == ((0L, 0L, 0L)), "unscorable docs must keep a row")
    assert(s.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("scoreDocsN at n=2 is byte-identical to the bigram surface") {
    val docs = Seq(
      (1L, "the cat sat"), (2L, "sat the cat"), (3L, "xyzzy plugh"),
      (4L, "solo"), (5L, "the dog sat the cat ran")
    ).toDF("doc_id", "text")
    val a = LmScore.scoreDocs(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect().toSeq
    val b = LmScore.scoreDocsN(docs, "doc_id", "text",
        LmScore.trainN(target, "text", 2))
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "n = 2 must reproduce the oracle-checked bigram scores exactly")
  }

  test("trigram stupid backoff: hand-computed levels, early-position context, 0.4^k chain") {
    // target "a b c a b d": bigrams (a,b)x2 (b,c) (c,a) (b,d);
    // trigrams (a b,c) (b c,a) (c a,b) (a b,d); N = 6
    val tgt = Seq(Tuple1("a b c a b d")).toDF("text")
    val m3 = LmScore.trainN(tgt, "text", 3)
    val docs = Seq(
      (1L, "a b c"),    // i=2 avail=2 bigram 10^6*2div2; i=3 trigram (a b,c): 10^6*1div2
      (2L, "c a b d"),  // all levels seen: 10^6 + 10^6 + 500000
      (3L, "b c d"),    // i=3: trigram (b c,d) miss, bigram (c,d) miss → uni d: 160000*1div6
      (4L, "z b")       // i=2: bigram (z,b) miss → uni b: avail=2 → 400000*2div6
    ).toDF("doc_id", "text")
    val s = LmScore.scoreDocsN(docs, "doc_id", "text", m3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("score")).toMap
    assert(s(1L) == 1000000L + 500000L)
    assert(s(2L) == 1000000L + 1000000L + 500000L)
    assert(s(3L) == 500000L + 160000L / 6)
    assert(s(4L) == 400000L * 2 / 6)
    // order guard: 0.4^k stays integer-exact only to n = 7
    intercept[IllegalArgumentException] { LmScore.trainN(tgt, "text", 8) }
    intercept[IllegalArgumentException] { LmScore.trainN(tgt, "text", 1) }
  }

  test("trigram model still ranks fluent above gibberish; broadcast-off path agrees") {
    val m3 = LmScore.trainN(target, "text", 3)
    val docs = Seq(
      (1L, "the cat sat"), (2L, "cat the sat ran dog"), (3L, "xyzzy plugh")
    ).toDF("doc_id", "text")
    val s = LmScore.scoreDocsN(docs, "doc_id", "text", m3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("mean_p")).toMap
    assert(s(1L) > s(2L) && s(2L) >= s(3L))
    val off = LmScore.scoreDocsN(docs, "doc_id", "text", m3,
        broadcastModel = false)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("mean_p")).toMap
    assert(off == s)
  }

  test("both forms agree: fluent docs beat gibberish (perplexity inverted)") {
    val docs = Seq(
      (1L, "the cat sat the cat ran"),
      (2L, "ran sat xyzzy cat qwfpgj the")).toDF("doc_id", "text")
    val fp = LmScore.scoreDocs(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("mean_p")).toMap
    assert(fp(1L) > fp(2L), "fluent must out-score scrambled+OOV")
    val ppl = LmScore.perplexity(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("perplexity")).toMap
    assert(ppl(1L) < ppl(2L), "fluent must have LOWER perplexity")
  }

  test("pplBuckets: per-group exact terciles, ties closed above, totality") {
    // lang a: scores 1..9 → cutoffs percentile(1/3)=3.67, (2/3)=6.33:
    // 1-3 tail, 4-6 middle, 7-9 head. lang b: all equal → both cutoffs
    // = 5 → EVERYTHING is head (ties go to the better bucket).
    val scored = ((1 to 9).map(i => (i.toLong, "a", i.toLong)) ++
      (10 to 12).map(i => (i.toLong, "b", 5L))).toDF("id", "lang", "mean_p")
    val out = LmScore.pplBuckets(scored, "mean_p", byCol = Some("lang"))
      .select("id", "bucket").as[(Long, String)].collect().toMap
    assert((1 to 3).forall(i => out(i.toLong) == "tail"))
    assert((4 to 6).forall(i => out(i.toLong) == "middle"))
    assert((7 to 9).forall(i => out(i.toLong) == "head"))
    assert((10 to 12).forall(i => out(i.toLong) == "head"))
    assert(out.size == 12, "bucketing must keep every row")
  }

  test("pplBuckets: a null group keeps its row with bucket NULL, never 'tail'") {
    val scored = (Seq((1L, null.asInstanceOf[String], 5L)) ++
      (2 to 10).map(i => (i.toLong, "en", i.toLong))).toDF("id", "lang", "mean_p")
    val out = LmScore.pplBuckets(scored, "mean_p", byCol = Some("lang"))
    assert(out.count() == 10, "null-group rows must not vanish")
    val nullRow = out.where(col("id") === 1L).select("bucket").collect()
    assert(nullRow.length == 1 && nullRow.head.isNullAt(0),
      "no distribution to bucket a null group in — bucket must be NULL, " +
        "not a silent 'tail' mislabel")
    // same stance for a null SCORE value: no score, no bucket — the
    // CASE's null comparisons would otherwise mislabel it 'tail'
    val withNullScore = (Seq((0L, "en", null.asInstanceOf[java.lang.Long])) ++
      (2 to 10).map(i => (i.toLong, "en", java.lang.Long.valueOf(i.toLong))))
      .toDF("id", "lang", "mean_p")
    val ns = LmScore.pplBuckets(withNullScore, "mean_p", byCol = Some("lang"))
      .where(col("id") === 0L).select("bucket").collect()
    assert(ns.length == 1 && ns.head.isNullAt(0))
  }

  test("pplBuckets: global (no byCol) and approx paths run and agree here") {
    val scored = (1 to 90).map(i => (i.toLong, i.toLong)).toDF("id", "mean_p")
    val exact = LmScore.pplBuckets(scored, "mean_p", byCol = None)
      .groupBy("bucket").count().as[(String, Long)].collect().toMap
    assert(exact == Map("tail" -> 30L, "middle" -> 30L, "head" -> 30L))
    // approx_percentile returns a dataset VALUE (no interpolation), so
    // cuts can sit one rank off the exact ones — assert the production
    // path runs and buckets stay balanced within that tolerance
    val approx = LmScore.pplBuckets(scored, "mean_p", byCol = None, exact = false)
      .groupBy("bucket").count().as[(String, Long)].collect().toMap
    assert(approx.keySet == Set("tail", "middle", "head"))
    assert(approx.values.sum == 90L, "approx bucketing must keep every row")
    assert(approx.values.forall(n => math.abs(n - 30L) <= 2), approx.toString)
  }

  test("plan shape: both model joins broadcast, no shuffle join") {
    val docs = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    val plan = LmScore.scoreDocs(docs, "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"),
      "model tables are target-bounded and must broadcast")
  }
}
