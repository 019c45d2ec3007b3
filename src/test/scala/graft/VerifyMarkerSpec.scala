package graft

/** Pins that Verify's failure marker ACTUALLY writes (r7 shipped a
  * zero-column `emptyDataFrame` marker that Spark rejects —
  * EMPTY_SCHEMA_NOT_SUPPORTED — so the swallowed write made failed
  * queries vanish from the compare, the exact bug the marker exists to
  * prevent; this spec makes that dead-code regression impossible). */
class VerifyMarkerSpec extends SparkSpec {

  test("select: shards partition the sorted inventory disjointly and completely; only picks exactly; typos fail loudly") {
    val names = Seq("a", "b", "c", "d", "e", "f", "g")
    // round-robin shards: disjoint, covering, deterministic
    val shards = (0 until 3).map(i => Verify.select(names, None, Some(s"$i/3")))
    assert(shards.flatten.sorted == names, "shards must cover the inventory")
    assert(shards.map(_.toSet).reduce(_ intersect _).isEmpty ||
      shards.combinations(2).forall { case Seq(x, y) => (x.toSet & y.toSet).isEmpty })
    assert(shards(0) == Seq("a", "d", "g"), "round-robin, not contiguous")
    // only: exact picks, order preserved from the sorted list
    assert(Verify.select(names, Some(Set("e", "b")), None) == Seq("b", "e"))
    // only + shard compose (shard applies to the only-filtered list)
    assert(Verify.select(names, Some(Set("a", "b", "c")), Some("1/2")) == Seq("b"))
    // a typo'd only name must fail, never read as a green skip
    intercept[IllegalArgumentException] {
      Verify.select(names, Some(Set("nope")), None)
    }
    // malformed / out-of-range shard specs fail loudly
    intercept[RuntimeException] { Verify.select(names, None, Some("3/3")) }
    intercept[RuntimeException] { Verify.select(names, None, Some("x/y")) }
    // both unset: the full battery
    assert(Verify.select(names, None, None) == names)
  }

  test("writeFailureMarker produces a readable one-column parquet naming the query") {
    val out = java.nio.file.Files.createTempDirectory("graft-marker").toString
    Verify.writeFailureMarker(spark, out, "q_example_failed")
    val back = spark.read.parquet(s"$out/q_example_failed")
    assert(back.schema.fieldNames.toSeq == Seq("__graft_failed"),
      "marker must be exactly the one-column failure schema compare.py detects")
    assert(back.collect().map(_.getString(0)).toSeq == Seq("q_example_failed"))
  }

  test("ErrText is total: empty, null, and multi-line messages never throw") {
    // an empty (non-null) message made `linesIterator.next()` throw
    // from inside the per-query catch handlers — aborting the loop
    // whose whole job is to survive broken queries
    assert(ErrText.firstLine(new RuntimeException("")) == "java.lang.RuntimeException")
    assert(ErrText.firstLine(new RuntimeException(null: String)) ==
      "java.lang.RuntimeException")
    assert(ErrText.firstLine(new RuntimeException("line1\nline2")) == "line1")
    assert(ErrText.firstLine(new RuntimeException("   \n  ")) ==
      "java.lang.RuntimeException")
    assert(ErrText.message(new RuntimeException("a\nb")) == "a\nb")
  }

  test("a zero-column marker would NOT write (the r7 dead-code failure mode)") {
    val out = java.nio.file.Files.createTempDirectory("graft-marker0").toString
    val thrown = intercept[Throwable] {
      spark.emptyDataFrame.coalesce(1).write.mode("overwrite").parquet(s"$out/q")
    }
    // pin the Spark behavior the marker design works around; if a future
    // Spark version starts allowing empty-schema writes this goes red
    // and the comment in Verify can be revisited
    assert(Option(thrown.getMessage).exists(_.contains("EMPTY_SCHEMA")) ||
      thrown.getClass.getName.contains("AnalysisException"),
      s"unexpected failure shape: $thrown")
  }
}
