package graft.streaming

import graft.{SparkSpec, Warehouse}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._
  import EventStreams._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(s: String, uid: Long, typ: String, v: Double) =
    Event(ts(s), uid, typ, v)

  test("windowedCounts: tumbling windows with watermark (complete batch run)") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      ev("2024-01-01 00:05:00", 1, "click", 1.0),
      ev("2024-01-01 00:55:00", 1, "click", 2.0),
      ev("2024-01-01 01:05:00", 2, "view", 3.0))
    val q = windowedCounts(in.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("wc")
      .select(date_format(col("window_start"), "HH:mm").as("w"), col("event_type"), col("n"))
      .orderBy("w", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq(("00:00", "click", 2L), ("01:00", "view", 1L)))
  }

  test("slidingCounts: each event lands in windowLen/slide overlapping windows") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(ev("2024-01-01 00:20:00", 1, "click", 1.0))
    val q = slidingCounts(in.toDF(), "1 hour", "15 minutes", "2 hours")
      .writeStream.format("memory").queryName("slc").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("slc")
      .orderBy("window_start")
      .select(date_format(col("window_start"), "HH:mm").as("w"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // 00:20 is inside the four 1h windows starting 23:30..00:15
    assert(rows == Seq(("23:30", 1L), ("23:45", 1L), ("00:00", 1L), ("00:15", 1L)))
  }

  test("withinJoin: stream-stream time-bounded pairs ≡ batch rangeJoin on replay") {
    implicit val sc = spark.sqlContext
    val purchases = Seq(
      ev("2024-01-01 10:00:00", 1, "purchase", 50.0),
      ev("2024-01-01 12:00:00", 1, "purchase", 70.0),
      ev("2024-01-01 10:30:00", 2, "purchase", 10.0))
    val clicks = Seq(
      ev("2024-01-01 09:10:00", 1, "click", 1.0), // within 1h of 10:00
      ev("2024-01-01 10:00:00", 1, "click", 2.0), // boundary: within (≤)
      ev("2024-01-01 10:30:00", 1, "click", 3.0), // matches neither window
      ev("2024-01-01 09:20:00", 2, "click", 4.0)) // too early for user 2
    val lIn = MemoryStream[Event]; val rIn = MemoryStream[Event]
    val q = withinJoin(lIn.toDF(), rIn.toDF(), "user_id", "1 hour", "4 hours")
      .writeStream.format("memory").queryName("wj").outputMode("append").start()
    lIn.addData(purchases); rIn.addData(clicks)
    q.processAllAvailable(); q.stop()
    val got = spark.table("wj")
      .select(col("user_id"), col("value"), col("r_value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    // batch twin: purchases are points, clicks open [ts, ts+1h] windows
    val replay = graft.ops.RangeJoin.rangeJoin(
        purchases.toDF(), clicks.toDF()
          .select(col("user_id"), col("value"),
            unix_micros(col("ts")).as("s"),
            (unix_micros(col("ts")) + 3600000000L).as("e")),
        Seq("user_id"), "ts", "s", "e", Seq("value"))
      .select(col("user_id"), col("value"), col("rj_value"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got == replay, "stream-stream pairs diverged from the batch range join")
    assert(got == Set((1L, 50.0, 1.0), (1L, 50.0, 2.0)))
    // a left column that collides with the prefixed right output fails loudly
    val e = intercept[IllegalArgumentException] {
      withinJoin(lIn.toDF().withColumn("r_value", col("value")),
        rIn.toDF(), "user_id")
    }
    assert(e.getMessage.contains("r_value"))
  }

  test("sessionized: native session windows close after the gap") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      ev("2024-01-01 00:00:00", 1, "click", 1.0),
      ev("2024-01-01 00:10:00", 1, "click", 1.0), // same session (gap 30m)
      ev("2024-01-01 01:00:00", 1, "click", 1.0), // new session
      ev("2024-01-01 00:00:00", 2, "view", 5.0))
    val q = sessionized(in.toDF(), "30 minutes", "4 hours")
      .writeStream.format("memory").queryName("sess").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sess")
      .select(col("user_id"), col("n_events"))
      .orderBy(col("user_id"), col("n_events").desc)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows == Seq((1L, 2L), (1L, 1L), (2L, 1L)))
  }

  test("runningUserTotals: state carries across micro-batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = runningUserTotals(in.toDS())
      .writeStream.format("memory").queryName("tot").outputMode("update").start()
    in.addData(ev("2024-01-01 00:00:00", 1, "click", 1.5))
    q.processAllAvailable()
    in.addData(ev("2024-01-01 00:01:00", 1, "click", 2.5))
    q.processAllAvailable(); q.stop()
    // update mode: last emitted row for user 1 has the running totals
    val last = spark.table("tot").where(col("user_id") === 1)
      .orderBy(col("n_events").desc).head()
    assert(last.getAs[Long]("n_events") == 2L)
    assert(last.getAs[Double]("total_value") == 4.0)
  }

  test("stream-static enrich: micro-batches join the batch dim") {
    implicit val sc = spark.sqlContext
    val dims = Seq((1L, "alice"), (2L, "bob")).toDF("user_id", "name")
    val in = MemoryStream[Event]
    in.addData(ev("2024-01-01 00:00:00", 1, "click", 1.0),
      ev("2024-01-01 00:01:00", 3, "view", 2.0)) // no dim row → null name
    val q = enriched(in.toDF(), dims, "user_id")
      .writeStream.format("memory").queryName("enr").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("enr").orderBy("user_id")
      .select("user_id", "name").collect()
    assert(rows.map(r => (r.getLong(0), Option(r.getString(1)))).toSeq ==
      Seq((1L, Some("alice")), (3L, None)))
  }

  test("dedupedWithinWatermark drops in-horizon duplicate keys") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    in.addData(
      ev("2024-01-01 00:00:00", 1, "click", 1.0),
      ev("2024-01-01 00:00:00", 1, "click", 2.0), // dup key (ts,user)
      ev("2024-01-01 00:05:00", 1, "click", 3.0),
      ev("2024-01-01 00:05:00", 2, "view", 4.0))
    val q = dedupedWithinWatermark(in.toDF(), Seq("ts", "user_id"))
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val n = spark.table("dd").count()
    assert(n == 3)
  }

  test("urlDedupStream: canonical-key dedup on ingest ≡ batch keep-first on replay") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val rows = Seq(
      (ts("2024-01-01 00:00:00"), 1L, "http://www.A.com/p/?b=2&a=1"),
      (ts("2024-01-01 00:01:00"), 2L, "https://a.com/p?a=1&b=2#frag"), // same canon
      (ts("2024-01-01 00:02:00"), 3L, "https://a.com/p?a=1&b=2&utm_source=x"), // same canon
      (ts("2024-01-01 00:03:00"), 4L, "https://b.com/q"))
    in.addData(rows.take(2))
    in.addData(rows.drop(2)) // dup arrives in a LATER micro-batch — state must hold
    val stream = urlDedupStream(in.toDF().toDF("ts", "id", "url"), "url")
    // schema parity with the batch twin: the working canon_url column
    // must not leak into the output
    assert(stream.columns.toSeq == Seq("ts", "id", "url"))
    val q = stream
      .writeStream.format("memory").queryName("ud").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ud").select("id").as[Long].collect().toSet
    assert(got == Set(1L, 4L), "only the first arrival per canonical key survives")
    // replay equivalence: batch keep-first (min id = arrival order here)
    // keeps the same survivors
    val batch = graft.ops.Url.keepFirstByUrl(
      rows.toDF("ts", "id", "url"), "url", "id")
      .select("id").as[Long].collect().toSet
    assert(batch == got)
  }

  test("boilerplateStripStream: persisted-stats strip per micro-batch ≡ batch twin on replay") {
    implicit val sc = spark.sqlContext
    // index corpus: header chrome in all 6 docs, bodies unique
    val index = (1L to 6L).flatMap(i => Seq(
      (i, "g", 0, "HDR"), (i, "g", 1, s"body $i")))
      .toDF("doc_id", "grp", "idx", "line")
    val batch1 = Seq((7L, "g", 0, "HDR"), (7L, "g", 1, "body 7"))
    val batch2 = Seq((8L, "g", 0, "HDR"), (8L, "g", 1, "body 8"))
    val dir = java.nio.file.Files.createTempDirectory("graft-blstream").toString
    try {
      graft.ops.Boilerplate.buildLineStats(index, "doc_id", "grp", "line",
        s"$dir/stats")
      val in = MemoryStream[(Long, String, Int, String)]
      in.addData(batch1)
      in.addData(batch2) // separate micro-batch: set reuse across triggers
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
      val q = EventStreams.boilerplateStripStream(
        in.toDF().toDF("doc_id", "grp", "idx", "line"),
        "doc_id", "grp", "idx", "line", s"$dir/stats",
        maxDocFrac = 0.6, checkpoint = s"$dir/ckpt") { out =>
        got ++= out.as[(Long, Long, Long, String)].collect()
      }
      q.processAllAvailable(); q.stop()
      // replay equivalence: the batch operator over the union of the
      // replayed batches produces the same rows
      val replay = graft.ops.Boilerplate.stripLinesIncrement(
        (batch1 ++ batch2).toDF("doc_id", "grp", "idx", "line"),
        "doc_id", "grp", "idx", "line", s"$dir/stats", maxDocFrac = 0.6)
        .as[(Long, Long, Long, String)].collect().toSeq
      assert(got.sortBy(_._1).toSeq == replay.sortBy(_._1))
      // the strip actually fired: HDR gone, bodies kept
      assert(got.forall { case (_, nl, nk, txt) =>
        nl == 2L && nk == 1L && txt.startsWith("body") })
    } finally deleteRecursively(dir)
  }

  test("tokenizeStream: per-batch incremental tokenize ≡ batch tokenize; table grows") {
    implicit val sc = spark.sqlContext
    val merges = graft.ops.Bpe.train(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 4)
    val batch1 = Seq((1L, "low lowest"), (2L, "newest low"))
    val batch2 = Seq((3L, "widest newest zq")) // zq: never-seen word
    val dir = java.nio.file.Files.createTempDirectory("graft-tokstream").toString
    try {
      // bootstrap: an empty table built from no docs (fresh Append path)
      graft.ops.Bpe.buildSubwordTable(
        Seq.empty[Tuple1[String]].toDF("text"), "text", merges, s"$dir/t",
        org.apache.spark.sql.SaveMode.Append)
      val in = MemoryStream[(Long, String)]
      in.addData(batch1)
      in.addData(batch2)
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int, String)]
      val q = EventStreams.tokenizeStream(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", merges,
        s"$dir/t", s"$dir/ckpt") { out =>
        got ++= out.as[(Long, Int, Int, String)].collect()
      }
      q.processAllAvailable(); q.stop()
      val replay = graft.ops.Bpe.tokenize(
        (batch1 ++ batch2).toDF("doc_id", "text"), "doc_id", "text", merges)
        .as[(Long, Int, Int, String)].collect().toSeq
      assert(got.sortBy(t => (t._1, t._2, t._3)).toSeq ==
        replay.sortBy(t => (t._1, t._2, t._3)))
      // fold-in across batches: the table now knows the whole stream's
      // vocabulary, including batch-2's never-seen word
      val tbl = spark.read.parquet(s"$dir/t/table")
        .select("word").distinct().as[String].collect().toSet
      assert(tbl == Set("low", "lowest", "newest", "widest", "zq"))
    } finally deleteRecursively(dir)
  }

  test("bm25IndexStream compactOverFiles: measured-file-count trigger bounds the index, answers unchanged") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25frag").toString
    try {
      def drive(tag: String, overFiles: Int): Long = {
        val in = MemoryStream[(Long, String)]
        val q = EventStreams.bm25IndexStream(
          in.toDF().toDF("doc_id", "text"), "doc_id", "text",
          s"$dir/$tag", s"$dir/ckpt_$tag", nBuckets = 8,
          trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
          compactOverFiles = overFiles)
        for (b <- 0 until 6) {
          in.addData((0 until 20).map(j =>
            (b * 20L + j, s"spark join data token${j % 5} batch$b")))
          q.processAllAvailable()
        }
        q.stop()
        graft.ops.IndexMaintenance.parquetFileCount(spark, s"$dir/$tag")
      }
      val unbounded = drive("plain", 0)
      val bounded = drive("adaptive", 10)
      // the adaptive trigger compacts when the MEASURED count exceeds
      // the knob, so the end state is at most one batch's spread past
      // it; the unbounded twin keeps every append's files
      assert(bounded < unbounded,
        s"adaptive compaction did not shrink the index: $bounded vs $unbounded")
      assert(bounded <= 10 + 12, // knob + one batch across 8 buckets + meta/doclen
        s"adaptive end state too fragmented: $bounded files")
      // and the compacted index answers exactly like the uncompacted one
      val terms = Seq("spark", "join", "token1")
      val a = graft.ops.Bm25.topKIndexed(spark, s"$dir/plain", terms, k = 10)
        .as[(Long, Long, Double)].collect().toSet
      val b = graft.ops.Bm25.topKIndexed(spark, s"$dir/adaptive", terms, k = 10)
        .as[(Long, Long, Double)].collect().toSet
      assert(a == b, "compaction changed probe results")
    } finally deleteRecursively(dir)
  }

  test("bm25IndexStream: per-trigger fold-in ≡ one batch index over the replayed stream") {
    implicit val sc = spark.sqlContext
    val batch1 = Seq((1L, "spark joins data with spark"),
      (2L, "hash join beats sort join"))
    val batch2 = Seq((3L, "the vector scan is fast"), (4L, "spark hash join"))
    val dir = java.nio.file.Files.createTempDirectory("graft-bm25stream").toString
    try {
      val in = MemoryStream[(Long, String)]
      val q = EventStreams.bm25IndexStream(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text",
        s"$dir/idx", s"$dir/ckpt", nBuckets = 8,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      // two SEPARATE triggers (drain between adds) — batch boundaries
      // must not change the index, and each fold-in leaves a meta delta
      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
      q.stop()
      val got = graft.ops.Bm25.topKIndexed(spark, s"$dir/idx",
          Seq("spark", "join", "scan"), k = 10)
        .as[(Long, Long, Double)].collect().toSet
      val st = graft.ops.Bm25.buildStats((batch1 ++ batch2).toDF("doc_id", "text"))
      val replay = graft.ops.Bm25.topK(st, Seq("spark", "join", "scan"), k = 10)
        .as[(Long, Long, Double)].collect().toSet
      st.postings.unpersist(blocking = false)
      assert(got == replay)
      // one meta delta per non-empty trigger — the fold-in audit trail
      assert(spark.read.parquet(s"$dir/idx/meta").count() == 2L)

      // compacting variant: same two triggers, compactEvery = 2 →
      // identical answers, meta collapsed, one file per bucket dir
      val in2 = MemoryStream[(Long, String)]
      val q2 = EventStreams.bm25IndexStream(
        in2.toDF().toDF("doc_id", "text"), "doc_id", "text",
        s"$dir/idx2", s"$dir/ckpt2", nBuckets = 8,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
        compactEvery = 2)
      in2.addData(batch1); q2.processAllAvailable()
      in2.addData(batch2); q2.processAllAvailable()
      q2.stop()
      val got2 = graft.ops.Bm25.topKIndexed(spark, s"$dir/idx2",
          Seq("spark", "join", "scan"), k = 10)
        .as[(Long, Long, Double)].collect().toSet
      assert(got2 == replay)
      // stamped meta keeps one row PER batch_id through compaction
      // (the replay-detection stamp must survive) — but ONE file
      assert(spark.read.parquet(s"$dir/idx2/meta").count() == 2L)
      assert(new java.io.File(s"$dir/idx2/meta").listFiles()
        .count(_.getName.endsWith(".parquet")) == 1,
        "meta not collapsed to one file")
      val multiFile = new java.io.File(s"$dir/idx2/postings").listFiles()
        .filter(d => d.isDirectory && d.getName.startsWith("bucket="))
        .filter(_.listFiles().count(_.getName.endsWith(".parquet")) > 1)
      assert(multiFile.isEmpty,
        s"buckets with >1 file after in-stream compaction: ${multiFile.map(_.getName).mkString(",")}")
    } finally deleteRecursively(dir)
  }

  test("annIndexStream: per-trigger fold-in ≡ one-shot index; in-stream compaction neutral") {
    implicit val sc = spark.sqlContext
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = e.where(col("id") < 5).select(col("id").as("qid"), col("embedding"))
    val rows = e.select(col("id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq
    val (b1, b2) = rows.partition(_._1 % 2 == 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-annstream").toString
    try {
      // frozen quantizer trained up front (the production shape: build
      // once, stream appends forever)
      val model = graft.ops.Ivf.fit(e, nlist = 8, iters = 3)
      def seed(p: String): Unit = {
        // an EMPTY saved index the stream folds into: centroids only +
        // an empty cells dir seeded from zero rows
        graft.ops.Ivf.save(spark, model, e.limit(0), p)
      }
      def key(p: String) = graft.ops.Ivf
        .topKIndexed(graft.ops.Ivf.load(spark, p), q, k = 5, nprobe = 3)
        .select("qid", "id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      seed(s"$dir/one"); graft.ops.Ivf.appendIndex(spark, e, s"$dir/one")
      val oneShot = key(s"$dir/one")

      seed(s"$dir/idx")
      val in = MemoryStream[(Long, Seq[Double])]
      val sq = EventStreams.annIndexStream(
        in.toDF().toDF("id", "embedding"), s"$dir/idx", s"$dir/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      in.addData(b1); sq.processAllAvailable()
      in.addData(b2); sq.processAllAvailable()
      sq.stop()
      assert(key(s"$dir/idx") == oneShot,
        "streamed fold-in diverged from the one-shot index")

      // compactEvery = 1: same probes, one file per cell dir
      seed(s"$dir/idx2")
      val in2 = MemoryStream[(Long, Seq[Double])]
      val sq2 = EventStreams.annIndexStream(
        in2.toDF().toDF("id", "embedding"), s"$dir/idx2", s"$dir/ckpt2",
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
        compactEvery = 1)
      in2.addData(b1); sq2.processAllAvailable()
      in2.addData(b2); sq2.processAllAvailable()
      sq2.stop()
      assert(key(s"$dir/idx2") == oneShot, "in-stream compaction changed probes")
      new java.io.File(s"$dir/idx2/cells").listFiles()
        .filter(_.getName.startsWith("cell=")).foreach { d =>
          assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1,
            s"${d.getName} holds >1 file after in-stream compaction")
        }
    } finally deleteRecursively(dir)
  }

  test("semDedupStream: per-trigger frozen-centroid prune ≡ batch semDedup on replay; crash replay re-emits") {
    implicit val sc = spark.sqlContext
    // two tight clusters; ids ascend with arrival (the equivalence
    // precondition). 1≈2≈5 (cluster 0) and 3≈6 (cluster 1) are τ-close;
    // 4 is cluster-1 but below τ to everything
    val centroids = Seq((0L, Seq(10.0, 0.0)), (1L, Seq(0.0, 10.0)))
      .toDF("cid", "embedding")
    val batch1 = Seq((1L, Seq(10.0, 0.1)), (2L, Seq(10.0, 0.11)), (3L, Seq(0.1, 10.0)))
    val batch2 = Seq((4L, Seq(3.0, 10.0)), (5L, Seq(10.0, 0.09)), (6L, Seq(0.1, 10.0)))
    val dir = java.nio.file.Files.createTempDirectory("graft-semstream").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    try {
      val in = MemoryStream[(Long, Seq[Double])]
      val q = EventStreams.semDedupStream(
        in.toDF().toDF("id", "embedding"), centroids, threshold = 0.99,
        s"$dir/idx", s"$dir/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)) { out =>
        got ++= out.select("id").as[Long].collect()
      }
      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
      q.stop()
      val batchOp = graft.ops.SemDedup.semDedup(
          (batch1 ++ batch2).toDF("id", "embedding"), centroids, threshold = 0.99)
        .select("id").as[Long].collect().toSet
      assert(got.toSet == batchOp,
        "streamed semantic dedup diverged from the batch operator on replay")
      assert(got.toSet == Set(1L, 3L, 4L), "fixture: keep-first within clusters")

      // crash replay: re-running batch 2's increment with its own
      // batchId must re-emit the identical survivors (not strip them
      // against its own just-appended vectors) — batchIds from the
      // stream above were 0 and 1
      val replayOut = graft.ops.SemDedup.semDedupIncrement(
          batch2.toDF("id", "embedding"), centroids, 0.99, s"$dir/idx", Some(1L))
        .select("id").as[Long].collect().toSet
      assert(replayOut == Set(4L), "stamped replay must re-emit batch 2's survivors")

      // compacting variant: same emissions, vector index collapses to
      // one file with the union of all (non-replayed) rows
      val got2 = scala.collection.mutable.ArrayBuffer.empty[Long]
      val in2 = MemoryStream[(Long, Seq[Double])]
      val q2 = EventStreams.semDedupStream(
        in2.toDF().toDF("id", "embedding"), centroids, threshold = 0.99,
        s"$dir/idx2", s"$dir/ckpt2",
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
        compactEvery = 1) { out =>
        got2 ++= out.select("id").as[Long].collect()
      }
      in2.addData(batch1); q2.processAllAvailable()
      in2.addData(batch2); q2.processAllAvailable()
      q2.stop()
      assert(got2.toSet == batchOp, "in-stream compaction changed results")
      val nFiles = new java.io.File(s"$dir/idx2/vectors").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(nFiles == 1, s"vector index holds $nFiles files after compaction")
      assert(spark.read.parquet(s"$dir/idx2/vectors").count() == 6L,
        "index must hold EVERY seen vector (the batch rule's witness set)")
    } finally deleteRecursively(dir)
  }

  test("paraDedupStream: per-trigger keep-first vs the index ≡ batch paragraphDedup on replay") {
    implicit val sc = spark.sqlContext
    // (id, pos, para): batch 2 repeats batch-1 paragraphs (A, B) and
    // brings new ones (C, D incl. a within-batch dup)
    val batch1 = Seq((1L, 0, "A"), (1L, 1, "B"), (2L, 0, "A"), (2L, 1, "C"))
    val batch2 = Seq((3L, 0, "A"), (3L, 1, "B"), (4L, 0, "B"), (4L, 1, "D"), (4L, 2, "D"))
    val dir = java.nio.file.Files.createTempDirectory("graft-parastream").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
    try {
      val in = MemoryStream[(Long, Int, String)]
      val q = EventStreams.paraDedupStream(
        in.toDF().toDF("id", "pos", "para"), "id", "pos", "para",
        s"$dir/idx", s"$dir/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)) { out =>
        got ++= out.as[(Long, Long, Long, String)].collect()
      }
      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
      q.stop()
      val replay = graft.ops.Dedup.paragraphDedup(
          (batch1 ++ batch2).toDF("id", "pos", "para"), "id", "pos", "para")
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got.toSet == replay,
        "streamed keep-first diverged from the batch operator on replay")
      assert(got.size == 4, "one output row per input doc")

      // compacting variant: compactEvery=1 → same answers, one file
      val got2 = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String)]
      val in2 = MemoryStream[(Long, Int, String)]
      val q2 = EventStreams.paraDedupStream(
        in2.toDF().toDF("id", "pos", "para"), "id", "pos", "para",
        s"$dir/idx2", s"$dir/ckpt2",
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L),
        compactEvery = 1) { out =>
        got2 ++= out.as[(Long, Long, Long, String)].collect()
      }
      in2.addData(batch1); q2.processAllAvailable()
      in2.addData(batch2); q2.processAllAvailable()
      q2.stop()
      assert(got2.toSet == replay, "in-stream compaction changed results")
      val nFiles = new java.io.File(s"$dir/idx2/pmd5").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(nFiles == 1, s"fingerprint dir holds $nFiles files after compaction")
    } finally deleteRecursively(dir)
  }

  test("profileStream: per-trigger stat fold-in ≡ one-shot profile of the replayed stream") {
    implicit val sc = spark.sqlContext
    val batch1 = Seq((Option(1L), Option("x")), (Option(7L), Option.empty[String]))
    val batch2 = Seq((Option(3L), Option("x")), (Option.empty[Long], Option("y")))
    val dir = java.nio.file.Files.createTempDirectory("graft-profstream").toString
    try {
      val in = MemoryStream[(Option[Long], Option[String])]
      val q = EventStreams.profileStream(
        in.toDF().toDF("id", "tag"), Seq("id", "tag"),
        s"$dir/stats", s"$dir/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
      q.stop()
      def rows(p: String) = graft.ops.Profile.readProfile(spark, p)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4), r.getString(5))).toSeq
      graft.ops.Profile.appendStats((batch1 ++ batch2).toDF("id", "tag"),
        s"$dir/one", Seq("id", "tag"))
      assert(rows(s"$dir/stats") == rows(s"$dir/one"),
        "streamed profile diverged from the one-shot build on replay")
    } finally deleteRecursively(dir)
  }

  test("rangeAttachStream: per-batch interval attach ≡ batch rangeJoin on replay") {
    implicit val sc = spark.sqlContext
    // static intervals per key; two point batches, one straddling a
    // bucket boundary and one matching nothing
    val intervals = Seq((1L, 0L, 100L, "w1"), (1L, 90L, 200L, "w2"),
      (2L, 50L, 60L, "w3")).toDF("k", "s", "e", "w")
    val batch1 = Seq((1L, 95L), (1L, 150L), (2L, 55L))
    val batch2 = Seq((1L, 300L), (2L, 49L), (1L, 0L))
    val dir = java.nio.file.Files.createTempDirectory("graft-rangestream").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String)]
    try {
      val in = MemoryStream[(Long, Long)]
      val q = EventStreams.rangeAttachStream(
        in.toDF().toDF("k", "pt"), intervals, Seq("k"), "pt", "s", "e",
        Seq("w"), s"$dir/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)) { out =>
        got ++= out.as[(Long, Long, String)].collect()
      }
      in.addData(batch1); q.processAllAvailable()
      in.addData(batch2); q.processAllAvailable()
      q.stop()
      val replay = graft.ops.RangeJoin.rangeJoin(
          (batch1 ++ batch2).toDF("k", "pt"), intervals,
          Seq("k"), "pt", "s", "e", Seq("w"))
        .as[(Long, Long, String)].collect().toSet
      assert(got.toSet == replay,
        "streamed interval attach diverged from the batch operator on replay")
      assert(got.exists(r => r._2 == 95L && r._3 == "w2"),
        "boundary point lost its second window")
    } finally deleteRecursively(dir)
  }

  test("chunkStream: stateless per-row chunking ≡ batch chunkTokenWindows on replay") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val batch1 = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens: 3 windows at (4, 3)
      (2L, "one two three"))       // fits one window
    val batch2 = Seq(
      (3L, ""),                    // empty text: one empty chunk (totality)
      (4L, (1 to 11).map(i => s"t$i").mkString(" "))) // tail chunk shorter
    in.addData(batch1)
    in.addData(batch2) // split across micro-batches — boundaries must not matter
    val q = EventStreams.chunkStream(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", window = 4, stride = 3)
      .writeStream.format("memory").queryName("cs").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("cs").as[(Long, Int, String)].collect().toSeq
      .sortBy(t => (t._1, t._2))
    val replay = (batch1 ++ batch2).toDF("doc_id", "text")
      .select(col("doc_id"),
        posexplode(graft.ops.TextOps.chunkTokenWindows(col("text"), 4, 3))
          .as(Seq("chunk_id", "chunk")))
      .as[(Long, Int, String)].collect().toSeq.sortBy(t => (t._1, t._2))
    assert(got == replay)
    // spot-pin the stride arithmetic: doc 1's windows step by 3
    assert(got.filter(_._1 == 1L).map(_._3) ==
      Seq("a b c d", "d e f g", "g h i j"))
    // totality: the empty doc emits exactly one empty chunk
    assert(got.filter(_._1 == 3L).map(_._3) == Seq(""))
  }

  test("contaminationScoreStream: stateless ingest-time scoring ≡ batch containment join on replay") {
    implicit val sc = spark.sqlContext
    // benchmark: two short docs; arriving corpus: overlapping, disjoint,
    // and too-short docs, split across micro-batches (boundaries must
    // not matter — the op is a stateless projection)
    val bench = Seq("the quick brown fox jumps", "pack my box with jugs")
      .toDF("text")
    val hashes = EventStreams.benchShingleHashes(bench, "text")
    assert(hashes.sorted.sameElements(hashes), "bench hashes must come sorted")
    val in = MemoryStream[(Long, String)]
    val batch1 = Seq(
      (1L, "the quick brown fox jumps over it"), // heavy overlap
      (2L, "completely unrelated words entirely here"))
    val batch2 = Seq(
      (3L, "pack my box"),  // exactly one benchmark shingle
      (4L, "two words"))    // < 3 tokens: no shingle — must drop
    in.addData(batch1); in.addData(batch2)
    val q = EventStreams.contaminationScoreStream(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text", hashes)
      .writeStream.format("memory").queryName("ctm").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("ctm").as[(Long, Long, Long, Double)]
      .collect().toSeq.sortBy(_._1)
    // the batch gate's containment join over the replayed corpus, with
    // the benchmark in the train role (exact string join — the 64-bit
    // hash form must agree on this corpus)
    val test = (batch1 ++ batch2).toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(graft.ops.Dedup.shingles(col("text"), 3)).as("shingle"))
    val trainSh = bench
      .select(explode(graft.ops.Dedup.shingles(col("text"), 3)).as("shingle"))
    val want = graft.queries.ExtensionQueries
      .contaminationJoin(test, trainSh, useBloom = false)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got == want, s"stream $got != batch $want")
    assert(!got.exists(_._1 == 4L), "a shingle-less doc must drop, like the batch gate")
    assert(got.find(_._1 == 3L).exists(_._3 == 1L), "doc 3 shares exactly one shingle")
    assert(got.find(_._1 == 2L).exists(_._3 == 0L))
  }

  test("contaminationScoreStream: benchHashes sorted defensively — unsorted input scores identically") {
    // the merge-walk inside IntersectCount undercounts on an unsorted
    // literal; the op must sort the caller's array itself rather than
    // trust the benchShingleHashes docstring
    val bench = Seq("the quick brown fox jumps").toDF("text")
    val hashes = EventStreams.benchShingleHashes(bench, "text")
    val scrambled = hashes.reverse
    val docs = Seq((1L, "the quick brown fox jumps over it"),
      (2L, "completely unrelated words entirely here")).toDF("doc_id", "text")
    def score(hs: Array[Long]) =
      EventStreams.contaminationScoreStream(docs, "doc_id", "text", hs)
        .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    val want = score(hashes)
    assert(want.find(_._1 == 1L).exists(_._3 > 0L), "sanity: doc 1 overlaps")
    assert(score(scrambled) == want, "unsorted bench hashes must not undercount")
  }

  test("nearDupHits: streaming LSH flags near-dups against earlier state, across batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val base = "the quick brown fox jumps over the lazy dog again and again every day"
    val q = nearDupHits(in.toDF().toDF("id", "text"), threshold = 0.8)
      .writeStream.format("memory").queryName("ndh").outputMode("append").start()
    // batch 1: an original and an unrelated doc — no hits
    in.addData((1L, base), (2L, "completely different words about spark catalyst and tungsten engines"))
    q.processAllAvailable()
    assert(spark.table("ndh").count() == 0)
    // batch 2: a near-copy of doc 1 arrives later — flagged against state
    in.addData((3L, base + " tonight"))
    q.processAllAvailable(); q.stop()
    val hits = spark.table("ndh").select("id", "dup_of", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(hits.nonEmpty && hits.forall { case (id, dup, j) => id == 3L && dup == 1L && j >= 0.8 })
  }

  test("idempotentAppend: re-delivered keys insert nothing") {
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val wh = new Warehouse(spark, root)
    val in = MemoryStream[Event]
    val keys = Seq("ts", "user_id")

    in.addData(ev("2024-01-01 00:00:00", 1, "click", 1.0),
      ev("2024-01-01 00:00:00", 1, "click", 9.0), // in-batch dup key
      ev("2024-01-01 00:01:00", 2, "view", 2.0))
    val q1 = idempotentAppend(in.toDF(), wh, "events_ledger", keys, s"$root/cp1")
    q1.awaitTermination(60000); // AvailableNow terminates when drained
    assert(wh.read("events_ledger").count() == 2)

    // re-deliver one old key + one new key in a fresh query
    val in2 = MemoryStream[Event]
    in2.addData(ev("2024-01-01 00:00:00", 1, "click", 1.0), // dup of ledger
      ev("2024-01-01 00:02:00", 3, "error", 7.0))
    val q2 = idempotentAppend(in2.toDF(), wh, "events_ledger", keys, s"$root/cp2")
    q2.awaitTermination(60000)
    val rows = wh.read("events_ledger").orderBy("ts", "user_id").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[Long]("user_id")).toSeq == Seq(1L, 2L, 3L))
  }

  test("packStream: per-shard offsets carry across micro-batches ≡ batch packing") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[ShardedDoc]
    val q = packStream(in.toDS(), budget = 100)
      .writeStream.format("memory").queryName("packed").outputMode("append").start()
    // micro-batch 1: shard 0 fills 90 tokens; shard 1 fills 30
    in.addData(ShardedDoc(0, 1, 60), ShardedDoc(0, 2, 30), ShardedDoc(1, 10, 30))
    q.processAllAvailable()
    // micro-batch 2: shard 0 continues at offset 90 → doc 3 still
    // window 0 (first token at 90), doc 4 starts at 140 → window 1
    in.addData(ShardedDoc(0, 3, 50), ShardedDoc(0, 4, 20), ShardedDoc(1, 11, 80))
    q.processAllAvailable(); q.stop()
    val got = spark.table("packed")
      .select("shard", "doc_id", "tokens_before", "window_id")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (0, 1L, 0L, 0L), (0, 2L, 60L, 0L), (0, 3L, 90L, 0L), (0, 4L, 140L, 1L),
      (1, 10L, 0L, 0L), (1, 11L, 30L, 0L)))
    // ≡ the batch packer run per shard over the full input
    val batch = Seq((1L, 60L), (2L, 30L), (3L, 50L), (4L, 20L)).toDF("doc_id", "n_tok")
    val b = graft.ops.Packing.assignWindows(batch, "doc_id", "n_tok", budget = 100)
      .select("doc_id", "tokens_before", "window_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(b == got.filter(_._1 == 0).map(t => (t._2, t._3, t._4)))
  }

  test("funnelStream: replayed batches ≡ batch funnel; watermark evicts dead chains") {
    implicit val sc = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    val winUs = 30L * 60L * 1000000L // 30 minutes
    val in = MemoryStream[Event]
    val q = funnelStream(in.toDS(), steps, winUs, watermark = "10 minutes")
      .writeStream.format("memory").queryName("fnl").outputMode("update").start()
    // batch 1 deliberately out of order WITHIN the batch (intra-batch
    // sort repairs it); batches in event-time order ACROSS batches —
    // the documented replay contract
    val batch1 = Seq(
      ev("2024-01-01 00:05:00", 1, "click", 0), // arrives before its view
      ev("2024-01-01 00:00:00", 1, "view", 0),
      ev("2024-01-01 00:02:00", 2, "view", 0),
      ev("2024-01-01 00:01:00", 3, "click", 0)) // click before any view: no chain
    val batch2 = Seq(
      ev("2024-01-01 00:10:00", 1, "purchase", 0), // completes user 1
      ev("2024-01-01 00:40:00", 2, "click", 0),    // outside user 2's window (t1+30m = 00:32)
      ev("2024-01-01 00:20:00", 3, "view", 0))     // user 3 finally anchors
    in.addData(batch1: _*); q.processAllAvailable()
    in.addData(batch2: _*); q.processAllAvailable()

    def latest() = spark.table("fnl").as[FunnelRow].collect()
      .groupBy(_.user_id).map { case (u, rows) =>
        val r = rows.maxBy(_.depth)
        (u, r.depth, r.times.toList)
      }.toSet
    val batchTruth = graft.ops.Funnel.funnel(
        (batch1 ++ batch2).toDF(), "user_id", "ts", "event_type", steps, winUs)
      .collect().map { r =>
        (r.getLong(0), r.getLong(1),
          (2 to 4).map(i => Option(r.get(i)).map(_.asInstanceOf[Long]))
            .flatten.toList)
      }.toSet
    assert(latest() == batchTruth)
    // the planted depth classes all materialized
    assert(latest().map(t => t._1 -> t._2).toMap == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))

    // ---- watermark eviction: the state bound, pinned observably ----
    // advance the watermark far past every chain's t1 + window…
    in.addData(ev("2024-01-01 02:00:00", 99, "view", 0))
    q.processAllAvailable()
    // …then a data-less-for-user-1 batch lets the timeout fire and drop
    // the finished chain's state
    in.addData(ev("2024-01-01 02:10:00", 99, "click", 0))
    q.processAllAvailable()
    // a NEW view from user 1 now starts a FRESH chain (depth 1, new
    // t1) — observable proof the old state was evicted; the batch
    // funnel over ALL events would still anchor on the original t1
    // (the documented bounded-state divergence)
    in.addData(ev("2024-01-01 02:30:00", 1, "view", 0))
    q.processAllAvailable(); q.stop()
    val u1rows = spark.table("fnl").as[FunnelRow].collect().filter(_.user_id == 1L)
    assert(u1rows.exists(r => r.depth == 1L &&
      r.times == Seq(ts("2024-01-01 02:30:00").getTime * 1000L)),
      s"evicted user must restart a fresh chain; got ${u1rows.toSeq}")
  }

  test("asofStream: carry across micro-batches ≡ batch AsofJoin on replayed batches") {
    implicit val sc = spark.sqlContext
    def se(key: Long, s: String, right: Boolean, v: Double) =
      SidedEvent(key, ts(s), right, v)
    // two keys; batch 1 deliberately out of order WITHIN the batch
    // (intra-batch sort repairs it), batches in event-time order
    // ACROSS batches (the documented replay contract)
    val batch1 = Seq(
      se(1, "2024-01-01 00:30:00", right = false, 10.0), // after the right → matches 1.5
      se(1, "2024-01-01 00:10:00", right = true, 1.5),   // out of order: arrives "late" in the batch
      se(1, "2024-01-01 00:05:00", right = false, 9.0),  // BEFORE any right → no match
      se(1, "2024-01-01 00:10:00", right = false, 11.0), // tie with the right → matches (≥)
      se(2, "2024-01-01 00:20:00", right = false, 20.0)) // key 2 has no right at all in batch 1
    val batch2 = Seq(
      se(1, "2024-01-01 01:00:00", right = false, 12.0), // no batch-2 right yet → batch-1 carry 1.5
      se(1, "2024-01-01 01:30:00", right = true, 2.5),
      se(1, "2024-01-01 02:00:00", right = false, 13.0), // new carry 2.5
      se(2, "2024-01-01 01:45:00", right = true, 9.0),
      se(2, "2024-01-01 02:00:00", right = false, 21.0),
      // sub-millisecond ordering: the right at .000600 is AFTER the
      // left at .000400, so that left must NOT see it (millisecond
      // truncation would tie them and wrongly match — the getTime bug)
      se(3, "2024-01-01 03:00:00.000400", right = false, 30.0),
      se(3, "2024-01-01 03:00:00.000600", right = true, 7.0),
      se(3, "2024-01-01 03:00:00.000700", right = false, 31.0))
    val in = MemoryStream[SidedEvent]
    val q = asofStream(in.toDS())
      .writeStream.format("memory").queryName("asof").outputMode("append").start()
    in.addData(batch1: _*); q.processAllAvailable()
    in.addData(batch2: _*); q.processAllAvailable(); q.stop()
    def norm(rs: Seq[(Long, java.sql.Timestamp, Double, Option[Double])]) = rs.toSet
    val got = norm(spark.table("asof").as[AsofHit].collect()
      .map(h => (h.key, h.ts, h.value, h.asof_value)).toSeq)
    // batch-operator truth over the SAME rows, sides split back out
    val all = batch1 ++ batch2
    val left = all.filter(!_.isRight).map(e => (e.key, e.ts, e.value)).toDF("key", "ts", "value")
    val right = all.filter(_.isRight).map(e => (e.key, e.ts, e.value)).toDF("key", "ts", "value")
    val batchTruth = norm(graft.ops.AsofJoin.asofJoin(left, right,
        keys = Seq("key"), tsCol = "ts", rightPayload = Seq("value"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toSeq)
    assert(got == batchTruth)
    // the carry really crossed the batch boundary
    assert(got.contains((1L, ts("2024-01-01 01:00:00"), 12.0, Some(1.5))))
    // intra-batch disorder repaired: the 00:30 left saw the 00:10 right
    assert(got.contains((1L, ts("2024-01-01 00:30:00"), 10.0, Some(1.5))))
    // and the pre-right left row stayed unmatched
    assert(got.contains((1L, ts("2024-01-01 00:05:00"), 9.0, None)))
    // microsecond precision: the .000400 left precedes the .000600
    // right; only the .000700 left matches it
    assert(got.contains((3L, ts("2024-01-01 03:00:00.000400"), 30.0, None)))
    assert(got.contains((3L, ts("2024-01-01 03:00:00.000700"), 31.0, Some(7.0))))
  }
}
