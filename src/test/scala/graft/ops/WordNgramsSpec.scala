package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordNgramsSpec extends SparkSpec {
  import spark.implicits._

  private def runEquiv(): Unit = {
    // randomized ≡ the higher-order-function formulation it replaces,
    // across n ∈ {1,2,3,5}, short arrays (< n → empty), empty tokens,
    // and null ELEMENTS (concat_ws skips them — pinned here so a
    // future "fix" can't silently change gram text)
    val rnd = new scala.util.Random(53)
    val words = Vector("a", "bb", "ccc", "", "dddd", null)
    val rows = (0 until 200).map { i =>
      (i, Seq.fill(rnd.nextInt(9))(words(rnd.nextInt(words.size))))
    }
    val df = rows.toDF("i", "toks")
    for (n <- Seq(1, 2, 3, 5)) {
      val hof = when(size(col("toks")) >= n,
        transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(n)))))
        .otherwise(array().cast("array<string>"))
      val bad = df.select(col("i"),
          graft.expr.WordNgrams.wordNgrams(col("toks"), n).as("got"),
          hof.as("want"))
        .where(not(col("got") <=> col("want"))).collect()
      assert(bad.isEmpty,
        s"word_ngrams(n=$n) diverged on ${bad.length} rows: ${bad.take(2).mkString("; ")}")
    }
  }

  test("word_ngrams ≡ the transform/concat_ws formulation, randomized (codegen)") {
    runEquiv()
  }

  test("word_ngrams ≡ HOF formulation, interpreted eval path") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try runEquiv()
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
      case None => spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null array propagates; wrong type rejected; hand case") {
    val df = Seq((1, Some(Seq("x", "y", "z"))), (2, None))
      .toDF("i", "toks")
      .select(col("i"), graft.expr.WordNgrams.wordNgrams(col("toks"), 2).as("g"))
      .orderBy("i").collect()
    assert(df(0).getSeq[String](1) == Seq("x y", "y z"))
    assert(df(1).isNullAt(1))
    intercept[Exception] {
      Seq(1L).toDF("a").select(graft.expr.WordNgrams.wordNgrams(col("a"), 2)).collect()
    }
  }
}
