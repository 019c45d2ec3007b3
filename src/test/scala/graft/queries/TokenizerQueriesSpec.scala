package graft.queries

import graft.SparkSpec
import graft.ops.Bpe
import org.apache.spark.sql.functions._

/** Pins the tokenizer gates' fixture liveness AND the precondition
  * that makes their oracle exact: the DuckDB oracle replays the GPT-2
  * apply rule one merge occurrence at a time, which is equivalent to
  * the engine's merge-all-occurrences rule only while no merge's
  * output symbol can participate in a lower-or-equal-rank pair. That
  * is a property of [[TokenizerQueries.FixedMerges]], so it is
  * verified MECHANICALLY here — an edit to the merge table that
  * silently breaks the equivalence argument fails by name, instead of
  * surfacing as an inscrutable oracle hash mismatch. */
class TokenizerQueriesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("FixedMerges satisfies the one-at-a-time oracle equivalence precondition") {
    val merges = TokenizerQueries.FixedMerges
    for (j <- merges.indices; i <- 0 to j) {
      val out = merges(j)._1 + merges(j)._2
      val (a, b) = merges(i)
      assert(out != a && out != b,
        s"merge $j output '$out' is a component of merge $i ('$a','$b') — " +
          "applying merge j could create a pair of rank <= j, where the " +
          "one-at-a-time oracle and the engine's all-occurrences rule " +
          "can diverge; pick a different fixed table")
    }
  }

  test("tokenize gate is live: every fixed merge actually fires on the corpus") {
    val subs = TokenizerQueries.qBpeTokenize(spark, sfDir)
      .select("subword").distinct().as[String](
        org.apache.spark.sql.Encoders.STRING).collect().toSet
    for (m <- TokenizerQueries.FixedMerges) {
      val out = m._1 + m._2
      assert(subs.contains(out) || subs.exists(_.startsWith(out)),
        s"merge output '$out' never appears in the gate's subwords — " +
          "that merge is dead on this corpus and the gate under-tests")
    }
    // and the no-merge fallback path is live too: some single chars
    assert(subs.exists(s => s.length == 1),
      "no character-level subwords — the fallback path went vacuous")
  }

  test("vocab gate prunes for real: floor and cap both live at this SF") {
    val full = Bpe.wordFreqs(
      graft.Tables.documents(spark, sfDir), "text").count()
    val pruned = TokenizerQueries.qBpeVocab(spark, sfDir).count()
    assert(pruned == 20L, s"top-N cap not live (got $pruned rows)")
    assert(full > pruned,
      "the cap did not actually cut anything — raise the fixture's topN liveness")
  }

  test("incremental-tokenize gate: both the table-hit and miss paths are live") {
    // the persisted half holds words < 'n'; the corpus must have words
    // on BOTH sides or one path goes vacuous while the shared oracle
    // stays green
    val words = graft.ops.Bpe.wordFreqs(
        graft.Tables.documents(spark, sfDir), "text")
      .select("word").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect()
    assert(words.exists(_ < "n"), "no table-hit words — hit path vacuous")
    assert(words.exists(w => !(w < "n")), "no miss words — increment path vacuous")
  }

  test("ids gate: vocabulary covers the corpus (no unk), ids dense from 0") {
    val tids = TokenizerQueries.qBpeIds(spark, sfDir)
      .select("tid").distinct()
      .as[Int](org.apache.spark.sql.Encoders.scalaInt).collect().sorted
    assert(!tids.contains(-1),
      "unk id leaked into the gate — the vocab no longer covers the corpus")
    assert(tids.head >= 0 && tids.last > tids.length / 2,
      "token ids look degenerate")
  }

  test("tok_pack packs multiple docs per window and multiple windows") {
    val r = TokenizerQueries.qTokPack(spark, sfDir)
      .agg(countDistinct("window_id").as("nw"), count(lit(1)).as("nd")).head()
    assert(r.getLong(0) > 1, "only one training window — budget fixture too big")
    assert(r.getLong(1) > r.getLong(0),
      "every doc got its own window — budget fixture too small to test packing")
  }
}
