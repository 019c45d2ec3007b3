package graft

import graft.queries.{DomainQueries, RelationalQueries}
import org.apache.spark.sql.DataFrame

/** Physical-plan shape assertions (SURVEY.md §4): these pin the
  * *scale* properties — pushdown reaching the parquet scan, dims
  * broadcasting, partial aggregation, fused top-k — so a refactor
  * that silently regresses a plan fails CI, not the 100 TB run.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = df.queryExecution.sparkPlan.toString

  test("projection + predicate reach the parquet scan (pushdown/pruning)") {
    val p = plan(RelationalQueries.qScanProject(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey), LessThan(l_orderkey,100)]"), p)
    // column pruning: the scan reads only the projected columns
    assert(p.contains("ReadSchema") && !p.contains("l_extendedprice"), p)
  }

  test("dim joins broadcast (no shuffle for small sides)") {
    val p = plan(RelationalQueries.qJoinEnrich(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("aggregation is partial→final (map-side combine) under codegen") {
    val df = RelationalQueries.q1Agg(spark, dir)
    val p = plan(df)
    assert(p.contains("partial_"), p) // partial aggregate stage present
    df.collect() // finalize the adaptive plan so codegen spans materialize
    val codegen = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // '*'-prefixed operators are inside WholeStageCodegen spans; the
    // whole scan→filter→project→partial-agg pipeline must be fused
    assert(codegen.contains("* HashAggregate") && codegen.contains("* Filter"), codegen)
  }

  test("top-k fuses sort+limit (TakeOrderedAndProject, no global sort)") {
    val p = plan(RelationalQueries.qTopk(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("rain ingest: grid scanned once, dims broadcast after the checkpoint") {
    // The grid-side segment (cell-map broadcast join + single groupBy
    // shuffle) now runs behind an eager localCheckpoint inside
    // RainIngest.ingest — the cached `mapped` frame feeds both the
    // resolution probe and the aggregation, so the grid lineage
    // executes exactly once. The visible tail plan must therefore be
    // checkpoint-scan → broadcast dim joins → orderBy: no shuffle but
    // the final range exchange.
    val df = DomainQueries.qRainPipeline(spark, dir)
    val p = plan(df)
    val exchanges = "Exchange".r.findAllIn(p).length
    assert(exchanges <= 1, s"$exchanges exchanges:\n$p")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("HashAggregate"), s"aggregation leaked past the checkpoint:\n$p")
  }

  test("anti-join executes as a broadcast/hash anti join, not a cartesian") {
    val p = plan(RelationalQueries.qAntiJoin(spark, dir))
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("contamination containment join keys on the shingle — no cartesian, partial agg") {
    val p = plan(graft.queries.ExtensionQueries.qContamination(spark, dir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_"), p) // per-doc counts combine map-side
  }

  test("bucketed cosine near-dups join on bucket keys, never all-pairs") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id").as("id"),
        org.apache.spark.sql.functions.col("embedding"))
    // materialize=false: the lazy plan (the default eagerly checkpoints
    // the pair set, which truncates the visible plan to an RDD scan)
    val p = plan(graft.ops.Similarity.cosineNearDupsBucketed(e, threshold = 0.4,
      materialize = false))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the exact-verify cosine runs AFTER candidate dedup, not per
    // collision: the vec_cosine projection sits above the (id1,id2)
    // first-agg in the plan text (plans print top-down)
    val cosAt = p.indexOf("vec_cosine")
    val aggAt = p.indexOf("Aggregate(keys=[id1")
    assert(cosAt >= 0 && aggAt >= 0 && cosAt < aggAt, p)
    // candidates are NARROW: the pair-dedup aggregate keys carry ids
    // only — vectors join back after, never ride the candidate shuffle
    val aggLine = p.substring(aggAt, p.indexOf("\n", aggAt) max (aggAt + 1))
    assert(!aggLine.contains("v1") && !aggLine.contains("vec"), aggLine)
  }

  test("substring-dup: both shuffles ride the chunk hash, no pairwise join") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = plan(graft.ops.Dedup.substringDupProfile(docs, width = 30))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // map-side combine on both aggregations (dup-hash find; per-doc score)
    assert(p.contains("partial_"), p)
    // the re-attach joins on the 16-byte chunk hash, never doc×doc
    assert(p.contains("__h"), p)
  }

  test("semdedup: zero-shuffle O(1)-plan assign; prune joins on the cluster key") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id").as("id"),
        org.apache.spark.sql.functions.col("embedding"))
    val cents = e.where(org.apache.spark.sql.functions.col("id") < 8)
      .withColumnRenamed("id", "cid")
    // assignment: ONE best_cosine_cell node regardless of k — no per-
    // centroid expression fan-out — and no join or exchange at all
    val pa = plan(graft.ops.SemDedup.assignByCosine(e, cents))
    assert("best_cosine_cell".r.findAllIn(pa).length == 1, pa)
    assert(!pa.contains("Join") && !pa.contains("Exchange"), pa)
    // prune: the self-join is an equi-join on the cluster key, never
    // an all-pairs product
    val pp = plan(graft.ops.SemDedup.semDedup(e, cents, threshold = 0.4))
    assert(!pp.contains("CartesianProduct") && !pp.contains("BroadcastNestedLoopJoin"), pp)
    assert(pp.contains("__c"), pp)
  }

  test("corpus pipeline: one dedup window, aggregation partial→final") {
    val p = plan(graft.queries.ExtensionQueries.qCorpusPipeline(spark, dir))
    assert("WindowExec|Window".r.findAllIn(p).nonEmpty, p)
    assert(p.contains("partial_"), p)
  }
}
