package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expr.ComputeOnce

/** [[graft.expr.ComputeOnce]] — the evaluate-once barrier: value
  * identity (it is semantically the identity function) plus the plan
  * property it exists for (a filter on a wrapped expensive column no
  * longer inlines the expression into a pushed-down Filter). */
class ComputeOnceSpec extends SparkSpec {
  import spark.implicits._

  test("identity on values, including nulls") {
    val df = Seq("a@b.com x", null, "", "10.1.2.3 call 555-123-4567")
      .toDF("t")
    val out = df.select(
      Pii.redact(col("t")).as("plain"),
      ComputeOnce.once(Pii.redact(col("t"))).as("wrapped"))
    assert(out.where(!(col("plain") <=> col("wrapped"))).isEmpty)
  }

  test("barrier stops filter-pushdown duplication of the wrapped expression") {
    // a real (non-local) source — ConvertToLocalRelation evaluates a
    // LocalRelation-backed plan at optimization time, leaving no Filter
    val df = spark.range(10).select(col("id"),
      concat(lit("doc "), col("id"), lit(" a@b.com")).as("t"))
    def plan(c: org.apache.spark.sql.Column): String =
      df.withColumn("r", c)
        .where(length(col("r")) > 3 && col("r").contains("<EMAIL>"))
        .select("id", "r")
        .queryExecution.executedPlan.toString
    // unwrapped: pushdown substitutes redact into the Filter → the
    // regexp chain appears once per reference
    val dup = plan(Pii.redact(col("t")))
    // wrapped: one Project evaluation, Filter references the attribute
    val once = plan(ComputeOnce.once(Pii.redact(col("t"))))
    val dupCount = "regexp_replace".r.findAllIn(dup).size
    val onceCount = "regexp_replace".r.findAllIn(once).size
    assert(onceCount == 3, s"expected exactly one redact chain, got $onceCount:\n$once")
    assert(dupCount > onceCount,
      s"control: unwrapped plan should duplicate ($dupCount vs $onceCount)")
  }

  test("wrapped column works through window + aggregate operators") {
    val df = Seq.tabulate(20)(i => (i.toLong, s"grp${i % 3} text $i"))
      .toDF("id", "t")
      .withColumn("r", ComputeOnce.once(upper(col("t"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(substring(col("r"), 1, 4)).orderBy("id")
    val out = df.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .groupBy(substring(col("r"), 1, 4).as("g"))
      .agg(count(lit(1)).as("n"), min("id").as("first"))
    assert(out.collect().length == 3)
  }
}
