package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def flags(text: String, minWords: Int = 5): Map[String, Boolean] = {
    val rules = Quality.gopherRules(col("text"), minWords = minWords)
    Seq(Tuple1(text)).toDF("text")
      .select(rules.map { case (n, c) => c.as(n) }: _*)
      .head().getValuesMap[Boolean](rules.map(_._1))
  }

  test("gopher: a sane English paragraph passes every rule") {
    val good = "the quick brown fox jumps over a lazy dog and it runs on " +
      "with many plain words that keep this sentence going for a while longer"
    val f = flags(good)
    assert(f.values.forall(identity), s"expected all-pass, got $f")
  }

  test("gopher: each rule rejects its own pathology") {
    // too short
    assert(!flags("just four words here")("wc_ok"))
    // mean word length out of band (single-char words)
    assert(!flags("a b c d e f g h i j")("mwl_ok"))
    // symbol-heavy: '#' and ellipses per word
    assert(!flags("# tag # tag # tag ... and … more")("sym_ok"))
    // numeric soup fails the alpha rule
    assert(!flags("1 2 3 4 5 6 7 8 9 10 11 12")("alpha_ok"))
    // no stopwords
    assert(!flags("kernel compiler register pointer stack heap queue")("stop_ok"))
    // keep is the conjunction
    assert(!flags("just four words here")("keep"))
  }

  test("gopher: NULL and empty text are total (rejected, never NULL)") {
    val rules = Quality.gopherRules(col("text"))
    val rows = Seq(Tuple1(null: String), Tuple1(""), Tuple1("   "))
      .toDF("text")
      .select(rules.map { case (n, c) => c.as(n) }: _*)
      .collect()
    rows.foreach { r =>
      assert(!r.anyNull, s"rule produced NULL on degenerate text: $r")
      assert(!r.getBoolean(r.fieldIndex("keep")))
    }
  }

  test("c4KeepLine: punctuation, word-count, javascript, and brace rules") {
    val cases = Seq(
      ("This line ends with a period.", true),
      ("Does it end with a question mark?", true),
      ("no terminal punctuation at all", false),
      ("Too few.", false), // 2 words < 3
      ("Please enable JavaScript to continue.", false),
      ("if (x) { return y; }", false),
      ("She said \"hello there friend.\"", true)) // quote after period
    val got = cases.map(_._1).toDF("line")
      .select(col("line"), Quality.c4KeepLine(col("line")).as("keep"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (l, want) =>
      assert(got(l) == want, s"'$l' → ${got(l)}, want $want")
    }
  }

  test("c4CleanDoc: filters lines, counts, and applies page-level rules") {
    val text = Seq(
      "NAV home login", // dropped: no punctuation
      "A fine first sentence stands here.",
      "Another solid line follows it.",
      "And a third one completes the page.",
      "x {", // dropped: brace
      "End of page.").mkString("\n")
    val c = Quality.c4CleanDoc(col("text"))
    val row = Seq(Tuple1(text)).toDF("text").select(c.as("c"))
      .select("c.n_lines", "c.n_kept", "c.keep", "c.clean_text").head()
    assert(row.getLong(0) == 6L && row.getLong(1) == 4L && row.getBoolean(2))
    assert(row.getString(3).startsWith("A fine first") &&
      !row.getString(3).contains("NAV"))
    // lorem ipsum anywhere on the page kills it even with enough lines
    val lorem = text + "\nSome lorem ipsum filler text here."
    val row2 = Seq(Tuple1(lorem)).toDF("text").select(c.as("c"))
      .select("c.keep").head()
    assert(!row2.getBoolean(0))
    // NULL text: zero kept lines, keep=false, never NULL
    val row3 = Seq(Tuple1(null: String)).toDF("text")
      .select(Quality.c4CleanDoc(col("text")).as("c"))
      .select("c.n_lines", "c.n_kept", "c.keep").head()
    assert(!row3.anyNull && row3.getLong(1) == 0L && !row3.getBoolean(2))
  }
}
