package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the two shapes of the centroid operator to each other: the
  * gate emits exploded (label, dim, m) scalar rows (the driver's
  * pandas harness cannot sort/hash array cells); the array-valued
  * `embedCentroidVec` is the form a training pipeline consumes. */
class ExtensionQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("embedCentroidVec re-exploded equals qEmbedCentroid") {
    val exploded = ExtensionQueries.qEmbedCentroid(spark, dir)
    val vec = ExtensionQueries.embedCentroidVec(spark, dir)
      .select(col("label"), posexplode(col("centroid")).as(Seq("dim", "m")))
      .select(col("label"), col("dim").cast("long").as("dim"), col("m"))
    assert(exploded.count() > 0)
    assert(exploded.exceptAll(vec).count() == 0)
    assert(vec.exceptAll(exploded).count() == 0)
  }

  test("centroid dimension count matches the embedding width") {
    val width = graft.Tables.embeddings(spark, dir)
      .select(size(col("embedding"))).head().getInt(0)
    val dims = ExtensionQueries.qEmbedCentroid(spark, dir)
      .groupBy("label").count().select("count").distinct().collect()
    assert(dims.map(_.getLong(0)).toSet == Set(width.toLong))
  }
}
