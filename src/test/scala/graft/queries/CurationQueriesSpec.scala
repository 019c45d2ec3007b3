package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the curation gates' FIXTURE LIVENESS — the guard against the
  * vacuous-coverage class found in review: `source` is `doc_id % 20`
  * in the testdata, so any synthesized "varies within a source" axis
  * keyed on an even modulus is secretly CONSTANT per source, and the
  * code path it exists to exercise never runs while the oracle (same
  * arithmetic) stays green. These tests fail by name if a testdata
  * regeneration (the r4→r6 drift precedent) or a fixture edit makes a
  * gate vacuous again, even though correctness would still read 100 %. */
class CurationQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("boilerplate gates exercise BOTH paths: strip (header/footer) AND keep (promo)") {
    // n_kept == 2 everywhere: body + promo survive, header + footer
    // stripped. n_kept == 1 would mean the promo went 100%-frequent
    // per source again (keep path dead); 3+ would mean chrome survived.
    val one = CurationQueries.qBoilerplate(spark, sfDir)
      .agg(min("n_kept"), max("n_kept")).head()
    assert((one.getLong(0), one.getLong(1)) == ((2L, 2L)),
      s"q_boilerplate n_kept range ${(one.getLong(0), one.getLong(1))} — " +
        "the mid-frequency keep path or the strip path went vacuous")
    val inc = CurationQueries.qIncrementalBoilerplate(spark, sfDir)
      .agg(min("n_kept"), max("n_kept"), count(lit(1))).head()
    assert((inc.getLong(0), inc.getLong(1)) == ((2L, 2L)),
      "q_incremental_boilerplate keep/strip paths must both be live")
    assert(inc.getLong(2) > 0, "incremental batch slice must be non-empty")
  }

  test("url gate exercises collisions: some canonical keys collapse multiple raw spellings") {
    val r = CurationQueries.qUrlDedup(spark, sfDir)
      .agg(max("n_urls"), max("n_raw"), count(lit(1))).head()
    assert(r.getLong(0) > 1, "no canonical key collapsed >1 crawl variant — " +
      "the normalization rules are not being exercised")
    assert(r.getLong(1) > 1, "no canonical key collapsed >1 DISTINCT raw " +
      "spelling — the variant synthesis went constant")
  }

  test("train-mix composition is live: real upsampling, all shards populated") {
    val r = CurationQueries.qTrainMix(spark, sfDir)
      .agg(sum("n").as("rows_out"), countDistinct("shard").as("shards"))
      .head()
    // 500 input docs; temperature weights > 1 for every non-head source
    // must produce genuine replicas, and the composite (doc#copy) keys
    // must spread over all 8 shards
    assert(r.getLong(0) > 500, s"no upsampling happened (rows_out=${r.getLong(0)})")
    assert(r.getLong(1) == 8L, s"only ${r.getLong(1)}/8 shards populated")
  }

  test("ppl buckets split every language three ways (no degenerate distribution)") {
    val perLang = CurationQueries.qPplBucket(spark, sfDir)
      .groupBy("lang").agg(countDistinct("bucket").as("nb"))
      .where(col("nb") < 3).count()
    assert(perLang == 0,
      "a language with <3 distinct buckets means its score distribution " +
        "degenerated and the tercile logic is untested there")
  }

  test("trigram gate exercises every backoff level (trigram hit, bigram, unigram)") {
    // re-derive the level used per position the same way the engine
    // does, and require each of the three levels to actually fire —
    // a corpus whose every position resolves at the trigram level
    // would leave the 0.4/0.4² chains green-but-untested
    val docs = graft.Tables.documents(spark, sfDir)
    val m = graft.ops.LmScore.trainN(
      docs.where(col("lang") === "en"), "text", 3)
    val c3 = m.orders(3).select(col("ctx").as("k3"), col("w").as("w3"))
      .withColumn("hit3", lit(1))
    val c2 = m.orders(2).select(col("ctx").as("k2"), col("w").as("w2"))
      .withColumn("hit2", lit(1))
    import org.apache.spark.sql.functions.{concat_ws, explode, sequence, size => sz, element_at, when => whenF}
    val toks = graft.ops.TextOps.tokens(lower(col("text")))
    val pos = docs.select(col("doc_id"), toks.as("t"))
      .where(sz(col("t")) >= 3)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(3), sz(col("t")))).as("i"))
      .select(element_at(col("t"), col("i")).as("w"),
        concat_ws(" ", element_at(col("t"), col("i") - 2),
          element_at(col("t"), col("i") - 1)).as("k3"),
        element_at(col("t"), col("i") - 1).as("k2"))
    val lv = pos
      .join(c3, pos("k3") === c3("k3") && pos("w") === c3("w3"), "left")
      .join(c2, pos("k2") === c2("k2") && pos("w") === c2("w2"), "left")
      .select(whenF(col("hit3").isNotNull, "tri")
        .when(col("hit2").isNotNull, "bi").otherwise("uni").as("level"))
      .groupBy("level").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (l <- Seq("tri", "bi", "uni"))
      assert(lv.getOrElse(l, 0L) > 0,
        s"no position resolves at the $l level — that backoff path is " +
          "vacuous on this corpus")
  }
}
