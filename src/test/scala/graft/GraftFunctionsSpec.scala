package graft

class GraftFunctionsSpec extends SparkSpec {

  GraftFunctions.register(spark)

  test("native expressions are callable from spark.sql") {
    val r = spark.sql(
      """SELECT
        | nfc_normalize('é') AS nfc,
        | vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
        | vec_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cos,
        | simhash64(array('a', 'b')) AS sh,
        | minhash64(array(5L, 9L), 4) AS mh,
        | jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
        | hashed_shingles(array('a', 'b', 'c', 'a', 'b', 'c'), 3) AS hs,
        | minhash_bands(array(5L, 9L), 8, 4) AS mb,
        | adc_score_lut(array(1, 0), array(0.5d, 1.5d, 2.5d, 3.5d)) AS adc
      """.stripMargin).head()
    // m=2, k=2: lut[0*2+1] + lut[1*2+0] = 1.5 + 2.5
    assert(r.getAs[Double]("adc") == 4.0)
    assert(r.getAs[String]("nfc") == "é")
    assert(r.getAs[Double]("dot") == 11.0)
    assert(r.getAs[Double]("cos") == 1.0)
    assert(r.getSeq[Long](r.fieldIndex("mh")).length == 4)
    assert(r.getAs[Double]("j") == 2.0 / 4.0)
    assert(r.getLong(r.fieldIndex("sh")) != 0L)
    // 6 tokens → 4 windows, of which "a b c" appears twice → 3 distinct
    val hs = r.getSeq[Long](r.fieldIndex("hs"))
    assert(hs.length == 3 && hs == hs.sorted)
    assert(r.getSeq[Long](r.fieldIndex("mb")).length == 4)
  }

  test("SQL results match the Column-API formulations") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(("the quick brown fox", 1L)).toDF("text", "id")
    val viaApi = df.select(graft.ops.Dedup.simhash(col("text"))).head().getLong(0)
    df.createOrReplaceTempView("t")
    val viaSql = spark.sql(
      "SELECT simhash64(array_distinct(split(trim(lower(text)), '\\\\s+'))) FROM t")
      .head().getLong(0)
    assert(viaApi == viaSql)
  }

  test("registerViews: spark.sql over the warehouse tables + native fns") {
    Tables.registerViews(spark, "/root/testdata/sf0.001")
    val n = spark.sql("SELECT count(*) FROM lineitem WHERE l_orderkey < 100").head().getLong(0)
    assert(n > 0)
    val dup = spark.sql(
      """SELECT count(*) FROM documents a JOIN documents b
        |ON a.doc_id < b.doc_id
        |AND jaccard_sorted(
        |  array_sort(transform(array_distinct(split(lower(trim(a.text)), '\\s+')), x -> xxhash64(x))),
        |  array_sort(transform(array_distinct(split(lower(trim(b.text)), '\\s+')), x -> xxhash64(x)))) > 0.9
      """.stripMargin).head().getLong(0)
    assert(dup >= 0) // plumbing check: native fn inside a SQL join condition
  }

  test("wrong arity yields a clear error") {
    val e = intercept[Exception](spark.sql("SELECT vec_dot(array(1.0d))").head())
    assert(e.getMessage.contains("2 arguments") || e.getMessage.contains("vec_dot"))
  }
}
