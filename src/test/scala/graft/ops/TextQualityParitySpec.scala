package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the r18 native one-pass text-quality expressions
  * ([[graft.expr.TextQuality]]) bit-identical to the pre-r18 Column
  * composites they replaced — over the real sf0.001 corpus AND an
  * adversarial edge battery (nulls, empties, exotic whitespace,
  * Unicode case edges, punctuation walls). The oracle gates only see
  * the corpus; the edge battery is what protects the semantics the
  * corpus doesn't exercise (leading tabs → empty first token, trailing
  * separators kept by split(-1), Σ final-sigma lowercasing, …).
  */
class TextQualityParitySpec extends SparkSpec {
  import spark.implicits._

  private val edges: Seq[String] = Seq(
    null,
    "",
    " ",
    "   ",
    "\t",
    "\tleading tab",
    "trailing tab\t",
    "a b\t",
    "\n\nonly\nnewlines\n",
    "the the the the the",
    "the of to and in is it that for on",
    "x",
    "one-token",
    "ALL CAPS THE OF TO",
    "ΑΣ ΒΗΤΑ ΣΙΓΜΑ",                       // Greek final-sigma lowercase edge
    "İstanbul ılık IJssel",                 // dotted/dotless i edges
    "ไทย จังหวัด อำเภอ",                     // Thai (no ASCII tokens)
    "!!!???...;;;:::",                      // punctuation wall
    "a.b,c;d:e!f?g'h\"i(j)k[l]m-n",
    "mixed   multiple    spaces",
    " padded with spaces ",
    "the quick brown fox jumps over the lazy dog. " * 5,
    "word " * 60,                           // crosses the 50-char length band
    "ab " * 30,                             // mean token length boundary ~2.0
    "abcdefghijkl " * 10,                   // mean token length boundary 12.0
    " nbsp is not \\s whitespace ",
    "emoji 🚀 and 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 beyond the BMP",
    "rep rep rep unique1 unique2")

  private def check(name: String,
      native: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      composite: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("text").as("t"))
    val edgeDf = edges.toDF("t")
    Seq("corpus" -> corpus, "edges" -> edgeDf).foreach { case (tag, df) =>
      val diff = df
        .select(native(col("t")).as("n"), composite(col("t")).as("c"), col("t"))
        .where(!(col("n") <=> col("c")))
      val bad = diff.limit(5).collect()
      assert(bad.isEmpty,
        s"$name native≠composite on $tag: " +
          bad.map(r => s"native=${r.get(0)} composite=${r.get(1)} text=${r.get(2)}")
            .mkString("; "))
    }
  }

  test("qualityScore native ≡ composite (corpus + edges, incl. null → 0.25)") {
    check("qualityScore", TextOps.qualityScore, TextOps.qualityScoreComposite)
  }

  test("stopwordRatio native ≡ composite (corpus + edges)") {
    check("stopwordRatio", TextOps.stopwordRatio, TextOps.stopwordRatioComposite)
  }

  test("dupTokenRatio native ≡ composite (corpus + edges)") {
    check("dupTokenRatio", TextOps.dupTokenRatio, TextOps.dupTokenRatioComposite)
  }

  test("native expressions are never-null and codegen-capable") {
    // interpreted (eval) and codegen paths agree — evaluate under a
    // projection wide enough that whole-stage codegen compiles it
    val df = edges.toDF("t").repartition(2)
    val out = df.select(
      TextOps.qualityScore(col("t")).as("q"),
      TextOps.stopwordRatio(col("t")).as("s"),
      TextOps.dupTokenRatio(col("t")).as("d"))
    assert(out.schema.fields.forall(!_.nullable))
    assert(out.where(col("q").isNull || col("s").isNull || col("d").isNull).isEmpty)
  }
}
