package graft

/** Whole-inventory analysis gate: EVERY `SparkEntry.queries` entry must
  * at least build and pass Catalyst analysis against the current
  * testdata. This is the canary the r6 post-mortem asked for — when the
  * driver regenerated `/root/testdata` with a different parquet
  * timestamp flavor, `q_asof_join` failed analysis and nothing in CI
  * said so by name for two rounds (Verify dropped it silently and the
  * failure surfaced only as seven confusing PlanAuditSpec reds). Any
  * schema/testdata/API drift now fails HERE, one test, listing the
  * broken queries by name.
  *
  * Analysis only (`queryExecution.analyzed`) — no execution — but note
  * a few gate builders do eager index/fit work during CONSTRUCTION
  * (incremental dedup gates, IVF/PQ fits, CMS sketch); at sf0.001 that
  * is a few seconds total, a price worth the coverage.
  */
class QueryInventorySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every registered query analyzes against current testdata") {
    val broken = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).queryExecution.analyzed; None }
        catch { case e: Throwable => Some(s"$name: ${ErrText.firstLine(e)}") }
    }
    assert(broken.isEmpty,
      s"${broken.size}/${SparkEntry.queries.size} queries failed analysis:\n  " +
        broken.mkString("\n  "))
  }

  test("inventory counts are pinned — a silent shrink fails by name") {
    // oracleSql keys must be a subset of queries (a dangling oracle is a
    // typo); and the inventory COUNTS are pinned to recorded constants —
    // a query vanishing between rounds (exactly how q_asof_join hid in
    // r5/r6: the recorded inventory silently shrank and absence read as
    // fine) now fails here naming the missing entries. Grow the
    // constants when adding queries; never let them shrink silently.
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracleSql entries with no query: $dangling")
    // EQUALITY pins, not >=: a ≥ guard stops protecting the moment the
    // inventory grows past the constant without a bump (grow to 85,
    // silently shrink to 80, 80 ≥ 79 still green — the exact recurrence
    // the pin exists to prevent). Adding a query REQUIRES bumping these.
    val expectedQueries = 133
    val expectedOracles = 133
    assert(SparkEntry.queries.size == expectedQueries,
      s"query inventory is ${SparkEntry.queries.size}, pinned $expectedQueries — " +
        "if you ADDED queries, bump the pin in this test; if you didn't, " +
        "something silently dropped an entry (the r5/r6 failure mode)")
    assert(SparkEntry.oracleSql.size == expectedOracles,
      s"oracle inventory is ${SparkEntry.oracleSql.size}, pinned $expectedOracles — " +
        "bump on add; a silent shrink is the r5/r6 failure mode")
    val missingOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missingOracle.isEmpty,
      s"queries with no oracle (driver downgrades them to rows-only — add " +
        s"the SQL or document a spec-only waiver here): $missingOracle")
  }
}
