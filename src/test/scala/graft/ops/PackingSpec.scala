package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (1 to n).map(i => (i.toLong, (i % 37 + 1).toLong)).toDF("id", "n_tok")

  test("distributed prefix sum ≡ naive global window, many partitions") {
    val d = docs(500).repartition(7) // scrambled input layout
    val fast = Packing.assignWindows(d, "id", "n_tok", budget = 100, numPartitions = 8)
      .select("id", "tokens_before", "window_id")
    val naive = Packing.assignWindowsNaive(docs(500), "id", "n_tok", budget = 100)
      .select("id", "tokens_before", "window_id")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("window boundaries: doc goes to the window where its FIRST token lands") {
    // tokens: 60, 60 → doc 2 starts at 60, still window 0 (budget 100)
    val d = Seq((1L, 60L), (2L, 60L), (3L, 60L)).toDF("id", "n_tok")
    val rows = Packing.assignWindows(d, "id", "n_tok", budget = 100, numPartitions = 2)
      .orderBy("id").select("window_id").as[Long].collect()
    assert(rows.toSeq == Seq(0L, 0L, 1L)) // doc3 starts at 120 → window 1
  }

  test("summary conserves docs and tokens") {
    val d = docs(300)
    val sum0 = Packing.packSummary(d, "id", "n_tok", budget = 128, numPartitions = 4)
    val (nd, nt) = sum0.agg(sum("n_docs"), sum("window_tokens"))
      .as[(Long, Long)].head()
    val (ed, et) = d.agg(count(lit(1)), sum("n_tok")).as[(Long, Long)].head()
    assert(nd == ed && nt == et)
    // windows are contiguous id ranges
    val rows = sum0.orderBy("window_id")
      .select("first_doc", "last_doc").as[(Long, Long)].collect()
    rows.sliding(2).foreach {
      case Array((_, l1), (f2, _)) => assert(f2 == l1 + 1)
      case _ =>
    }
  }

  test("empty partitions and single-doc-larger-than-budget behave") {
    val d = Seq((1L, 5000L), (2L, 10L)).toDF("id", "n_tok")
    val rows = Packing.assignWindows(d, "id", "n_tok", budget = 100, numPartitions = 8)
      .orderBy("id").select("window_id").as[Long].collect()
    assert(rows(0) == 0L && rows(1) == 50L) // doc2 starts at token 5000
  }

  test("null token counts: distributed ≡ naive (null sums coalesce to 0)") {
    // enough partitions that some hold ONLY null-token rows — the case
    // that used to NPE on the per-partition sum
    val d = (1 to 40).map(i =>
      (i.toLong, if (i <= 20) null.asInstanceOf[java.lang.Long] else java.lang.Long.valueOf(30L)))
      .toDF("id", "n_tok")
    val fast = Packing.assignWindows(d, "id", "n_tok", budget = 100, numPartitions = 8)
      .select("id", "tokens_before", "window_id")
    val naive = Packing.assignWindowsNaive(d, "id", "n_tok", budget = 100)
      .select("id", "tokens_before", "window_id")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("reserved internal names collide loudly, not silently") {
    val d = Seq((1L, 5L, 0)).toDF("id", "n_tok", "__pid")
    val e = intercept[IllegalArgumentException] {
      Packing.assignWindows(d, "id", "n_tok", budget = 100)
    }
    assert(e.getMessage.contains("__pid"))
  }
}
