package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Differential test for the heap-selected BPE trainer: on random
  * small-alphabet corpora (heavy pair collisions, ties, runs of
  * identical symbols, counts that fall and rise again — the lazy-heap
  * corners), [[Bpe.train]] must produce EXACTLY the merge sequence of
  * an independent brute-force reference that recounts every pair from
  * scratch each round and picks max-count / lexicographically-smallest.
  * Guards the r9 heap rewrite against every stale-snapshot subtlety.
  * No SparkSession needed — the trainer is driver-side by design. */
class BpePropertySpec extends AnyFunSuite {

  private def refMerge(syms: Vector[String], p: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == p._1 && syms(i + 1) == p._2) {
        out += (syms(i) + syms(i + 1)); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Brute-force trainer: full recount per round (independent of any
    * incremental bookkeeping). */
  private def refTrain(freq: Map[String, Long], numMerges: Int,
      eow: String): Seq[(String, String)] = {
    var words = freq.toVector.map { case (w, n) =>
      val cps = w.codePoints().toArray
        .map(cp => new String(Character.toChars(cp))).toVector
      (if (cps.isEmpty) Vector.empty[String]
       else cps.init :+ (cps.last + eow), n)
    }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      for ((syms, n) <- words; j <- 0 until syms.length - 1)
        counts((syms(j), syms(j + 1))) += n
      val live = counts.filter(_._2 >= 2L)
      if (live.isEmpty) done = true
      else {
        val pair = live.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += pair
        words = words.map { case (syms, n) => (refMerge(syms, pair), n) }
        round += 1
      }
    }
    merges.result()
  }

  test("heap-selected train ≡ brute-force recount reference on random corpora") {
    val rnd = new Random(37)
    for (trial <- 1 to 30) {
      // tiny alphabet → heavy collisions; duplicate letters → runs
      val alpha = "abc"
      val nWords = 5 + rnd.nextInt(30)
      val freq = (1 to nWords).map { _ =>
        val len = 1 + rnd.nextInt(8)
        val w = (1 to len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
        w -> (1L + rnd.nextInt(9))
      }.toMap // duplicate words collapse — fine, both sides see the same map
      val numMerges = rnd.nextInt(25)
      val got = Bpe.train(freq, numMerges)
      val ref = refTrain(freq, numMerges, Bpe.EndOfWord)
      assert(got == ref,
        s"trial $trial diverged (freq=$freq numMerges=$numMerges):\n" +
          s"  got $got\n  ref $ref")
    }
  }

  test("applyMerges under a trained table round-trips every corpus word") {
    val rnd = new Random(91)
    for (_ <- 1 to 10) {
      val freq = (1 to 12).map { _ =>
        val w = (1 to 1 + rnd.nextInt(6)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
        w -> (1L + rnd.nextInt(5))
      }.toMap
      val merges = Bpe.train(freq, 10)
      for (w <- freq.keys)
        assert(Bpe.applyMerges(w, merges).mkString
          .stripSuffix(Bpe.EndOfWord) == w)
    }
  }
}
