package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](text: String, c: Column => Column): T =
    Seq(text).toDF("t").select(c(col("t"))).head().getAs[T](0)

  test("counts: emails, phones, IPs") {
    val t = "mail a.b+c@x.co or d@sub.example.org, call 555-123-4567 " +
      "or +1-800-555-0100, host 192.168.0.1 and 10.0.0.255"
    assert(one[Int](t, Pii.emailCount) == 2)
    assert(one[Int](t, Pii.phoneCount) == 2)
    assert(one[Int](t, Pii.ipCount) == 2)
  }

  test("redact replaces each class with its placeholder") {
    val t = "from bob@corp.example.com at 10.1.2.3 call 555-867-5309 now"
    val r = one[String](t, Pii.redact)
    assert(r == "from <EMAIL> at <IP> call <PHONE> now")
  }

  test("redaction order: email domains are not half-eaten by the IP pass") {
    val r = one[String]("x 1.2.3.4@9.8.7.6.co y", Pii.redact)
    // the whole thing is a valid email per the pragmatic pattern
    assert(r == "x <EMAIL> y")
  }

  test("phone requires full 3-3-4 shape; bare 3-4 is left alone") {
    assert(one[Int]("call 555-0100", Pii.phoneCount) == 0)
    assert(one[Int]("call 555.123.4567", Pii.phoneCount) == 1)
  }

  test("domains + blocklist predicate") {
    val t = "see https://www.bad.example.com/x and http://ok.example.org/y"
    val ds = Seq(t).toDF("t").select(Pii.domains(col("t"))).head().getSeq[String](0)
    assert(ds == Seq("www.bad.example.com", "ok.example.org"))
    assert(one[Boolean](t, c => Pii.mentionsBlockedDomain(c, Seq("www.bad.example.com"))))
    assert(!one[Boolean](t, c => Pii.mentionsBlockedDomain(c, Seq("other.example.com"))))
  }

  test("no PII → text unchanged, zero counts") {
    val t = "plain text with numbers 12 34 and words only"
    assert(one[String](t, Pii.redact) == t)
    assert(one[Int](t, Pii.emailCount) == 0)
    assert(one[Int](t, Pii.phoneCount) == 0)
    assert(one[Int](t, Pii.ipCount) == 0)
  }
}
