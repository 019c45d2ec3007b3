package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import java.sql.Date

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("facts partition by year; appends accumulate; date predicates prune partitions") {
    val root = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val wh = new Warehouse(spark, root)
    val r23 = Seq((1L, 1L, Date.valueOf("2023-06-01"), 2023, 1, 11, 1.0, 2.0))
      .toDF("pk_id", "upload_id", "date", "year", "province_id", "district_id", "rain_mm_wmean", "rainfall_mm")
    val r24 = Seq((2L, 1L, Date.valueOf("2024-06-01"), 2024, 1, 11, 3.0, 4.0))
      .toDF("pk_id", "upload_id", "date", "year", "province_id", "district_id", "rain_mm_wmean", "rainfall_mm")
    wh.write("rain_points", r23)
    wh.write("rain_points", r24)

    assert(new java.io.File(s"$root/rain_points/year=2023").exists())
    assert(new java.io.File(s"$root/rain_points/year=2024").exists())
    assert(wh.read("rain_points").count() == 2)

    // partition pruning visible in the physical plan
    val plan = wh.read("rain_points").where(col("year") === 2024)
      .queryExecution.executedPlan.toString
    assert(plan.contains("year=2024") || plan.toLowerCase.contains("partitionfilters"))

    // overwrite mode replaces
    wh.write("province", Seq((1, "a", "b")).toDF("province_id", "province_name", "province_name_en"),
      SaveMode.Overwrite)
    assert(wh.read("province").count() == 1)
  }

  test("compact merges many small append files, preserves rows and partitioning") {
    val root = java.nio.file.Files.createTempDirectory("graft-wh3").toString
    val wh = new Warehouse(spark, root)
    def row(pk: Long, y: Int) = Seq((pk, 1L, Date.valueOf(s"$y-06-01"), y, 1, 11, 1.0, 2.0))
      .toDF("pk_id", "upload_id", "date", "year", "province_id", "district_id", "rain_mm_wmean", "rainfall_mm")
    // 6 appends → ≥6 parquet files across two year dirs
    (1 to 3).foreach(i => wh.write("rain_points", row(i, 2023)))
    (4 to 6).foreach(i => wh.write("rain_points", row(i, 2024)))
    def parquetFiles(dir: String): Int = {
      val d = new java.io.File(dir)
      if (!d.exists()) 0
      else d.listFiles().map { f =>
        if (f.isDirectory) parquetFiles(f.getPath)
        else if (f.getName.endsWith(".parquet")) 1 else 0
      }.sum
    }
    assert(parquetFiles(s"$root/rain_points") >= 6)
    val before = wh.read("rain_points").orderBy("pk_id").collect().toSeq

    wh.compact("rain_points")
    // tiny table → one file per year dir
    assert(parquetFiles(s"$root/rain_points") == 2, s"got ${parquetFiles(s"$root/rain_points")}")
    assert(new java.io.File(s"$root/rain_points/year=2023").exists())
    assert(wh.read("rain_points").orderBy("pk_id").collect().toSeq == before)
    // appends still work after the swap
    wh.write("rain_points", row(7, 2024))
    assert(wh.read("rain_points").count() == 7)
    // the staged/backup dirs from the crash-safe swap are gone
    assert(!new java.io.File(s"$root/rain_points__compacting").exists())
    assert(!new java.io.File(s"$root/rain_points__old").exists())
  }

  test("compact(zorderBy): unpartitioned rewrite yields tight per-file bboxes") {
    val root = java.nio.file.Files.createTempDirectory("graft-whz").toString
    val wh = new Warehouse(spark, root)
    val df = spark.range(20000).select(
      col("id").as("pk_id"),
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(col("id")),
        org.apache.spark.sql.functions.lit(1000L)).as("x"),
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(col("id"),
          org.apache.spark.sql.functions.lit(5)),
        org.apache.spark.sql.functions.lit(1000L)).as("y"))
    wh.write("grid", df)
    val before = wh.read("grid").agg(org.apache.spark.sql.functions.sum("pk_id"))
      .head().getLong(0)

    wh.compact("grid", targetBytes = 16L * 1024, zorderBy = Seq("x", "y"))
    val files = new java.io.File(s"$root/grid").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length > 4, s"want several z-range files, got ${files.length}")
    // each file covers a small rectangle of the 1000×1000 space
    val areas = files.map { f =>
      val r = spark.read.parquet(f).agg(
        org.apache.spark.sql.functions.min("x"), org.apache.spark.sql.functions.max("x"),
        org.apache.spark.sql.functions.min("y"), org.apache.spark.sql.functions.max("y")).head()
      (r.getLong(1) - r.getLong(0) + 1).toDouble * (r.getLong(3) - r.getLong(2) + 1)
    }
    // unclustered: every file spans ~the whole space (sum ≈ files × 10⁶);
    // z-ranges tile it with overlap only at curve boundaries — allow 2×
    // one coverage, still 3× better than unclustered at 6 files
    assert(areas.sum < files.length * 1000.0 * 1000 / 2,
      s"z-order compaction left wide bboxes: ${areas.toSeq}")
    assert(wh.read("grid").agg(org.apache.spark.sql.functions.sum("pk_id"))
      .head().getLong(0) == before)
  }

  test("compact(zorderBy) on a partitioned table keeps dirs, preserves rows") {
    val root = java.nio.file.Files.createTempDirectory("graft-whz2").toString
    val wh = new Warehouse(spark, root)
    def rows(y: Int) = (1 to 500).map(i =>
      ((y * 1000 + i).toLong, 1L, Date.valueOf(s"$y-06-01"), y, i % 50, i % 77, i.toDouble, 2.0))
      .toDF("pk_id", "upload_id", "date", "year", "province_id", "district_id", "rain_mm_wmean", "rainfall_mm")
    wh.write("rain_points", rows(2023)); wh.write("rain_points", rows(2024))
    val before = wh.read("rain_points").agg(org.apache.spark.sql.functions.sum("pk_id"))
      .head().getLong(0)
    wh.compact("rain_points", zorderBy = Seq("province_id", "district_id"))
    assert(new java.io.File(s"$root/rain_points/year=2023").exists())
    assert(wh.read("rain_points").agg(org.apache.spark.sql.functions.sum("pk_id"))
      .head().getLong(0) == before)
  }

  test("optimizeWarehouse: the served (district, date-range) filter decodes a fraction of the facts") {
    // the q_list_page/q_graph_day push: district equality + date range
    // (ListQueries.FactFilters → main.py:252-263). Before the z-order
    // pass the year partitions are append-ordered (date-clustered,
    // district spanning every file) so a district filter skips nothing;
    // after optimizeWarehouse the (district_id, date) z-layout lets
    // parquet min/max stats skip whole row groups for the SAME query.
    val root = java.nio.file.Files.createTempDirectory("graft-whopt").toString
    val wh = new Warehouse(spark, root)
    val eng = new graft.domain.Engine(spark, wh)
    val nD = 64; val nDays = 256
    // append in DATE order (the upload cadence): every file holds all districts
    val facts = spark.range(nD.toLong * nDays).select(
      col("id").as("pk_id"), lit(1L).as("upload_id"),
      date_add(lit(java.sql.Date.valueOf("2023-01-01")),
        (col("id") / nD).cast("int")).as("date"),
      lit(2023).as("year"),
      (col("id") % 8).cast("int").as("province_id"),
      (col("id") % nD).cast("int").as("district_id"),
      (col("id") % 100).cast("double").as("rain_mm_wmean"),
      lit(2.0).as("rainfall_mm"))
    wh.write("rain_points", facts.repartitionByRange(16, col("date"))
      .sortWithinPartitions("date"))

    def decodedRows(q: org.apache.spark.sql.DataFrame): Long = {
      q.collect()
      q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value
      }.sum
    }
    // the district-equality serving filter: the date-ordered append
    // layout spreads every district over every file, so before the
    // optimize it can skip NOTHING — the exact gap models.py's
    // (district) index fills for the reference
    val pred = col("district_id") === 7
    val predRange = pred &&
      col("date").between(lit("2023-02-01").cast("date"), lit("2023-03-01").cast("date"))
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val beforeRows = wh.read("rain_points").where(predRange)
        .select("pk_id", "date", "district_id").collect().map(_.getLong(0)).toSet
      val n = nD.toLong * nDays
      val beforeDecoded = decodedRows(
        wh.read("rain_points").where(pred).select("pk_id", "date", "district_id"))
      assert(beforeDecoded >= n * 9 / 10,
        s"premise broken: append layout should decode ~everything, got $beforeDecoded of $n")
      val beforeServed = decodedRows(
        wh.read("rain_points").where(predRange).select("pk_id", "date", "district_id"))

      // clustered splits fix ~log2(F) leading interleave bits, and the
      // weighted serving layout gives district 1 of every 3 — give it
      // enough files that ≥2 district bits are fixed
      eng.optimizeWarehouse(targetBytes = 512L)
      val files = new java.io.File(s"$root/rain_points/year=2023").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files >= 64, s"premise broken: want ≥64 clustered files for skip granularity, got $files")

      val afterQ = wh.read("rain_points").where(pred)
        .select("pk_id", "date", "district_id")
      val afterDecoded = decodedRows(afterQ)
      // the date-weighted serving layout trades some district-only
      // skip (symmetric z managed ~7×) for range-shape skip; what it
      // must still deliver: a real district cut (≥2.5× — the exact 3×
      // boundary sits on range-partitioner sampling jitter at this
      // file count) AND an improved COMBINED served predicate, which
      // is the endpoint the layout is chosen for
      assert(afterDecoded * 5 <= beforeDecoded * 2,
        s"weighted serving read decoded $afterDecoded rows vs $beforeDecoded " +
          "before optimize — district file skipping not proven")
      val afterServed = decodedRows(
        wh.read("rain_points").where(predRange).select("pk_id", "date", "district_id"))
      assert(afterServed * 2 <= beforeServed,
        s"served (district, date-range) decode did not improve: " +
          s"$afterServed vs $beforeServed pre-optimize")
      // and the full serving answer is unchanged, range filter included
      assert(wh.read("rain_points").where(predRange)
        .select("pk_id").collect().map(_.getLong(0)).toSet == beforeRows,
        "optimize changed the served answer")
      val page = eng.listRain(
        graft.domain.ListQueries.FactFilters(districtId = Some(7),
          dateStart = Some("2023-02-01"), dateEnd = Some("2023-03-01")),
        graft.domain.ListQueries.PageRequest(page = 1, pageSize = 50))
      assert(page.total == beforeRows.size)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("layout knob: weighted z beats date-sort on district slices AND symmetric z on date ranges") {
    // the r15 serving-soak trade, closed: a date sort skips best on
    // date RANGES but nothing on district equality; symmetric
    // (district, date) z splits the difference evenly; the
    // date-weighted Morton layout must beat EACH single layout on the
    // shape it is weak at — measured in decoded rows, answers pinned
    // identical across all three layouts.
    val root = java.nio.file.Files.createTempDirectory("graft-whlay").toString
    val wh = new Warehouse(spark, root)
    val nD = 64; val nDays = 512
    val facts = spark.range(nD.toLong * nDays).select(
      col("id").as("pk_id"), lit(1L).as("upload_id"),
      date_add(lit(java.sql.Date.valueOf("2023-01-01")),
        (col("id") / nD).cast("int")).as("date"),
      lit(2023).as("year"),
      (col("id") % 8).cast("int").as("province_id"),
      (col("id") % nD).cast("int").as("district_id"),
      (col("id") % 100).cast("double").as("rain_mm_wmean"),
      lit(2.0).as("rainfall_mm"))
    val layouts: Seq[(String, Warehouse.Layout)] = Seq(
      "lay_sort" -> Warehouse.Sort(Seq("date")),
      "lay_z" -> Warehouse.Z(Seq("district_id", "date")),
      "lay_wz" -> Warehouse.WeightedZ("date", "district_id"))
    for ((t, lay) <- layouts) {
      wh.write(t, facts)
      wh.optimize(t, targetBytes = 512L, lay)
    }
    def decodedRows(q: org.apache.spark.sql.DataFrame): Long = {
      q.collect()
      q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value
      }.sum
    }
    val predDistrict = col("district_id") === 7
    val predRange = col("date").between(
      lit("2023-03-01").cast("date"), lit("2023-03-29").cast("date"))
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def measure(t: String, pred: org.apache.spark.sql.Column): (Long, Set[Long]) = {
        val q = wh.read(t).where(pred).select("pk_id")
        val ids = q.collect().map(_.getLong(0)).toSet
        (decodedRows(wh.read(t).where(pred).select("pk_id")), ids)
      }
      val byLayout = layouts.map { case (t, _) =>
        t -> (measure(t, predDistrict), measure(t, predRange))
      }.toMap
      // answers identical across layouts, both shapes
      val wantD = byLayout("lay_sort")._1._2
      val wantR = byLayout("lay_sort")._2._2
      for ((t, ((_, d), (_, r))) <- byLayout) {
        assert(d == wantD, s"$t changed the district-slice answer")
        assert(r == wantR, s"$t changed the date-range answer")
      }
      val sortD = byLayout("lay_sort")._1._1
      val zD = byLayout("lay_z")._1._1
      val wzD = byLayout("lay_wz")._1._1
      val sortR = byLayout("lay_sort")._2._1
      val zR = byLayout("lay_z")._2._1
      val wzR = byLayout("lay_wz")._2._1
      val total = nD.toLong * nDays
      // premise: the date sort cannot skip on district equality
      assert(sortD >= total * 8 / 10,
        s"premise broken: date sort should decode ~all on district, got $sortD/$total")
      // weighted z beats the date sort where the sort is weak ...
      assert(wzD * 2 <= sortD,
        s"weighted z lost district skipping: $wzD vs sort's $sortD")
      // ... and beats symmetric z where z is weak
      assert(wzR < zR,
        s"weighted z did not out-skip symmetric z on the date range: $wzR vs $zR")
      // context rows for the record (not asserted): sort range / z district
      info(s"district decode: sort=$sortD z=$zD wz=$wzD; " +
        s"range decode: sort=$sortR z=$zR wz=$wzR; total=$total")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("layout knob: WeightedZAuto derives widths from measured stats; answers pinned, converges, keeps district skipping") {
    val root = java.nio.file.Files.createTempDirectory("graft-whwza").toString
    val wh = new Warehouse(spark, root)
    val nD = 32; val nDays = 256
    val facts = spark.range(nD.toLong * nDays).select(
      col("id").as("pk_id"), lit(1L).as("upload_id"),
      date_add(lit(java.sql.Date.valueOf("2023-01-01")),
        (col("id") / nD).cast("int")).as("date"),
      lit(2023).as("year"),
      (col("id") % 8).cast("int").as("province_id"),
      (col("id") % nD).cast("int").as("district_id"),
      (col("id") % 100).cast("double").as("rain_mm_wmean"),
      lit(2.0).as("rainfall_mm"))
    wh.write("t_wza", facts)
    wh.write("t_sort", facts)
    val lay = Warehouse.WeightedZAuto("date", "district_id", primaryShare = 0.9)
    wh.optimize("t_wza", targetBytes = 512L, lay)
    wh.optimize("t_sort", targetBytes = 512L, Warehouse.Sort(Seq("date")))
    def decodedRows(q: org.apache.spark.sql.DataFrame): Long = {
      q.collect()
      q.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value
      }.sum
    }
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val pred = col("district_id") === 7
      // answers identical to the raw table, both shapes
      assert(wh.read("t_wza").where(pred).select("pk_id")
        .collect().map(_.getLong(0)).toSet ==
        facts.where(pred).select("pk_id").collect().map(_.getLong(0)).toSet)
      // derived interleave keeps real secondary skipping where the
      // date sort decodes everything — the property the auto sizing
      // must preserve at whatever widths it picks. At this table's
      // F ≈ 64 the 0.9 mix derives g = 3 (one secondary fixed bit —
      // fixedBitsAt's floor model), so the PREDICTED skip is 2×;
      // assert 1.5× to absorb range-partitioner boundary slack
      // (measured 1.92× on the deterministic grid).
      val wzaD = decodedRows(wh.read("t_wza").where(pred).select("pk_id"))
      val sortD = decodedRows(wh.read("t_sort").where(pred).select("pk_id"))
      assert(wzaD * 3 <= sortD * 2,
        s"auto-weighted z lost district skipping: $wzaD vs sort's $sortD")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    // convergence: on a REALISTIC byte target (the 512 B target above
    // sits under the parquet file floor, where no layout's byte band
    // can settle — it exists only to force a high file count for the
    // skip measurement), a second optimize under the same static tag
    // is a byte-stable no-op
    wh.write("t_conv", facts)
    val fs = new org.apache.hadoop.fs.Path(wh.path("t_conv"))
      .getFileSystem(spark.sessionState.newHadoopConf())
    def treeState(): Seq[(String, Long, Long)] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(wh.path("t_conv")), true)
      val b = Seq.newBuilder[(String, Long, Long)]
      while (it.hasNext) { val f = it.next()
        b += ((f.getPath.toString, f.getLen, f.getModificationTime)) }
      b.result().sortBy(_._1)
    }
    wh.optimize("t_conv", targetBytes = 64L * 1024, lay)
    val before = treeState()
    wh.optimize("t_conv", targetBytes = 64L * 1024, lay)
    assert(treeState() == before, "settled WeightedZAuto table must no-op")
    // invalid mixes fail at construction, not deep in a rewrite
    intercept[IllegalArgumentException] {
      Warehouse.WeightedZAuto("date", "district_id", primaryShare = 0.3)
    }
  }

  test("compact(zorderBy, quantile=true): zipf-skewed dim keeps the partner dim tight") {
    // linear bucketing maps a zipf column almost entirely to bucket 0,
    // so the z-key degenerates to a 1-d sort on the OTHER dim's buckets
    // interleaved with zeros — per-file bboxes stay wide in the uniform
    // dim only if the curve ignores it. Quantile bucketing restores the
    // 2-d tiling; this pins compact's layout ≈ clusterWrite(quantile).
    val root = java.nio.file.Files.createTempDirectory("graft-whzq").toString
    val wh = new Warehouse(spark, root)
    val n = 20000
    val df = spark.range(n.toLong).select(
      col("id").as("pk_id"),
      (lit(1000000.0) / (org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(col("id")),
        org.apache.spark.sql.functions.lit(1000L)) + 1)).as("x"), // zipf-ish
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(col("id"),
          org.apache.spark.sql.functions.lit(3)),
        org.apache.spark.sql.functions.lit(1000L)).as("y"))
    wh.write("zq", df)
    val before = wh.read("zq").agg(org.apache.spark.sql.functions.sum("pk_id"))
      .head().getLong(0)
    wh.compact("zq", targetBytes = 24L * 1024, zorderBy = Seq("x", "y"), quantile = true)
    assert(wh.read("zq").agg(org.apache.spark.sql.functions.sum("pk_id"))
      .head().getLong(0) == before)

    def ySpans(path: String): Seq[Long] =
      new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
        .map { f =>
          val r = spark.read.parquet(f)
            .agg(org.apache.spark.sql.functions.min("y"),
              org.apache.spark.sql.functions.max("y")).head()
          r.getLong(1) - r.getLong(0)
        }
    val compacted = ySpans(s"$root/zq")
    assert(compacted.size > 4, s"want several files, got ${compacted.size}")
    // bbox parity with the clusterWrite quantile layout at the same file count
    val dir = java.nio.file.Files.createTempDirectory("graft-whzq2").toString
    graft.ops.ZOrder.clusterWrite(df, s"$dir/cw", Seq("x", "y"),
      numFiles = compacted.size, bits = 12, quantile = true)
    val cw = ySpans(s"$dir/cw")
    def mean(s: Seq[Long]) = s.sum.toDouble / s.size
    assert(mean(compacted) < 700, s"y-locality lost: $compacted")
    assert(mean(compacted) <= mean(cw) * 1.5 + 50,
      s"compact quantile layout far looser than clusterWrite: ${mean(compacted)} vs ${mean(cw)}")
  }

  test("compact(zorderBy) falls back to plain compaction on an all-null dim") {
    val root = java.nio.file.Files.createTempDirectory("graft-whznull").toString
    val wh = new Warehouse(spark, root)
    val df = spark.range(100).select(
      col("id").as("pk_id"),
      org.apache.spark.sql.functions.lit(null).cast("double").as("x"),
      col("id").as("y"))
    wh.write("znull", df)
    wh.compact("znull", zorderBy = Seq("x", "y")) // must not NPE
    assert(wh.read("znull").count() == 100)
    wh.compact("znull", zorderBy = Seq("x", "y"), quantile = true)
    assert(wh.read("znull").count() == 100)
  }

  test("month grain: year=/month= layout, month predicates prune, compact preserves it") {
    val root = java.nio.file.Files.createTempDirectory("graft-whm").toString
    val wh = new Warehouse(spark, root, monthGrain = true)
    def row(pk: Long, d: String) = {
      val y = d.take(4).toInt
      Seq((pk, 1L, Date.valueOf(d), y, 1, 11, 1.0, 2.0))
        .toDF("pk_id", "upload_id", "date", "year", "province_id", "district_id", "rain_mm_wmean", "rainfall_mm")
    }
    wh.write("rain_points", row(1, "2023-06-01"))
    wh.write("rain_points", row(2, "2023-07-01"))
    wh.write("rain_points", row(3, "2024-06-01"))
    assert(new java.io.File(s"$root/rain_points/year=2023/month=6").exists())
    assert(new java.io.File(s"$root/rain_points/year=2023/month=7").exists())
    val q = wh.read("rain_points")
      .where(col("year") === 2023 && col("month") === 6)
    assert(q.count() == 1)
    assert(q.queryExecution.executedPlan.toString.contains("month=6") ||
      q.queryExecution.executedPlan.toString.toLowerCase.contains("partitionfilters"))
    wh.compact("rain_points")
    assert(new java.io.File(s"$root/rain_points/year=2023/month=7").exists())
    assert(wh.read("rain_points").count() == 3)
  }

  test("readOrEmpty yields a typed empty frame for missing tables") {
    val root = java.nio.file.Files.createTempDirectory("graft-wh2").toString
    val wh = new Warehouse(spark, root)
    val empty = wh.readOrEmpty("incident_statistics_points", graft.domain.Schemas.incidentStatisticsPoints)
    assert(empty.count() == 0)
    assert(empty.columns.contains("disaster_date"))
  }
  test("maintenance lease: a racing optimize refuses fast and mutates nothing; release allows; stale lease is taken over; reads never torn") {
    val root = java.nio.file.Files.createTempDirectory("graft-whlease").toString
    val wh = new Warehouse(spark, root)
    val facts = spark.range(3000L).select(
      col("id").as("pk_id"), lit(1L).as("upload_id"),
      org.apache.spark.sql.functions.date_add(
        lit(java.sql.Date.valueOf("2022-01-01")), (col("id") % 300).cast("int")).as("date"),
      lit(2022).as("year"),
      (col("id") % 8).cast("int").as("province_id"),
      (col("id") % 64).cast("int").as("district_id"),
      (col("id") % 100).cast("double").as("rain_mm_wmean"),
      lit(2.0).as("rainfall_mm"))
    wh.write("rain_points", facts.repartition(16))
    val n0 = wh.read("rain_points").count()
    def gone(suffix: String) =
      !new java.io.File(s"$root/rain_points$suffix").exists()

    // writer A's critical section is open (the deterministic form of
    // two racing optimizes: A holds, B arrives)
    wh.acquireLease("rain_points")
    val err = intercept[IllegalStateException] {
      wh.optimize("rain_points", targetBytes = 64L * 1024,
        zorderBy = Seq("district_id", "date"))
    }
    assert(err.getMessage.contains("lease"))
    // the refusal happened BEFORE any mutation: no staging, no trash,
    // no marker — and reads are clean mid-hold
    assert(gone("__optimize_staged") && gone("__optimize_old") &&
      gone("__optimizing"))
    assert(wh.read("rain_points").count() == n0)
    // the lease is a FILE, not JVM state: a second Warehouse instance
    // (another driver on the same warehouse root) refuses identically
    val whB = new Warehouse(spark, root)
    intercept[IllegalStateException] {
      whB.optimize("rain_points", targetBytes = 64L * 1024,
        zorderBy = Seq("district_id", "date"))
    }

    // A releases → B's retry wins, completes, and releases in turn
    wh.releaseLease("rain_points")
    whB.optimize("rain_points", targetBytes = 64L * 1024,
      zorderBy = Seq("district_id", "date"))
    assert(wh.read("rain_points").count() == n0)
    assert(gone("__optimize_lease"), "winner must release on completion")

    // genuinely-threaded race on a re-fragmented table: at least one
    // optimize wins; any loser failed on the LEASE (fail-fast), and
    // the final state is settled and correct
    wh.write("rain_points", facts.repartition(16))
    val n1 = wh.read("rain_points").count()
    val outcomes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 2).map(_ => new Thread(() =>
      try {
        wh.optimize("rain_points", targetBytes = 64L * 1024,
          zorderBy = Seq("district_id", "date"))
        outcomes.add("ok")
      } catch {
        case e: IllegalStateException if e.getMessage.contains("lease") =>
          outcomes.add("refused")
      }))
    threads.foreach(_.start()); threads.foreach(_.join())
    val res = scala.jdk.CollectionConverters.IterableHasAsScala(outcomes).asScala.toSeq
    assert(res.count(_ == "ok") >= 1, s"no optimize won the race: $res")
    assert(res.size == 2, s"an optimize died outside the lease contract: $res")
    assert(wh.read("rain_points").count() == n1)
    assert(gone("__optimize_lease") && gone("__optimizing"))

    // CRASHED holder: the lease FILE outlives its writer (the crashed
    // JVM's in-process claim died with it — so the file is written
    // directly here, not via acquireLease); a tiny-TTL instance takes
    // it over with a loud warning and completes
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/rain_points__optimize_lease"),
      "dead-jvm|thread=1|0")
    val whT = new Warehouse(spark, root, leaseTtlMs = 50L)
    Thread.sleep(120)
    whT.optimize("rain_points", targetBytes = 64L * 1024,
      zorderBy = Seq("district_id", "date"))
    assert(wh.read("rain_points").count() == n1)
    assert(gone("__optimize_lease"), "takeover must release like any holder")
    deleteRecursively(root)
  }

  test("optimize: selective per-dir rewrite, no-op steady state, and interrupted-swap repair") {
    val root = java.nio.file.Files.createTempDirectory("graft-whopt").toString
    val wh = new Warehouse(spark, root)
    def facts(yr: Int, n: Int, idOff: Long) = spark.range(n.toLong).select(
      (col("id") + idOff).as("pk_id"), lit(1L).as("upload_id"),
      org.apache.spark.sql.functions.date_add(
        lit(java.sql.Date.valueOf(s"$yr-01-01")), (col("id") % 300).cast("int")).as("date"),
      lit(yr).as("year"),
      (col("id") % 8).cast("int").as("province_id"),
      (col("id") % 64).cast("int").as("district_id"),
      (col("id") % 100).cast("double").as("rain_mm_wmean"),
      lit(2.0).as("rainfall_mm"))
    // two years, written fragmented (many files per dir)
    wh.write("rain_points", facts(2022, 4000, 0L).repartition(24))
    wh.write("rain_points", facts(2023, 4000, 100000L).repartition(24))
    def total() = wh.read("rain_points").count()
    def files(yr: Int): Set[(String, Long)] =
      new java.io.File(s"$root/rain_points/year=$yr").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    val n0 = total()

    // first optimize: both dirs diverge -> whole-table path; settles the layout
    wh.optimize("rain_points", targetBytes = 64L * 1024,
      zorderBy = Seq("district_id", "date"))
    assert(total() == n0)
    val settled2022 = files(2022)
    val settled2023 = files(2023)

    // steady state: a second optimize is a NO-OP (no file churn at all)
    wh.optimize("rain_points", targetBytes = 64L * 1024,
      zorderBy = Seq("district_id", "date"))
    assert(files(2022) == settled2022 && files(2023) == settled2023,
      "steady-state optimize must not rewrite settled partitions")

    // fragment ONLY 2023 with fresh appends -> selective path: 2022
    // untouched (same files), 2023 rewritten, answers intact
    wh.write("rain_points", facts(2023, 4000, 200000L).repartition(24))
    val n1 = total()
    wh.optimize("rain_points", targetBytes = 64L * 1024,
      zorderBy = Seq("district_id", "date"))
    assert(total() == n1, "selective optimize changed the answer")
    assert(files(2022) == settled2022,
      "selective optimize rewrote a partition that was not fragmented")
    assert(files(2023) != settled2023, "fragmented partition was not rewritten")

    // interrupted swap: marker standing, one dir staged out to the
    // trash sibling and missing from the live tree. read() must FAIL
    // LOUD (never scan a silently partial table, never mutate - a
    // repair from the read path would race a live optimizer);
    // repairOptimize (the writer's entry, also run at the head of
    // every optimize) restores the old dir and clears the state.
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def hp(x: String) = new org.apache.hadoop.fs.Path(x)
    fs.mkdirs(hp(s"$root/rain_points__optimize_old"))
    assert(fs.rename(hp(s"$root/rain_points/year=2022"),
      hp(s"$root/rain_points__optimize_old/year=2022")))
    fs.create(hp(s"$root/rain_points__optimizing"), true).close()
    intercept[IllegalStateException] { total() }
    wh.repairOptimize("rain_points")
    assert(total() == n1, "repairOptimize did not restore the staged-out partition")
    assert(!fs.exists(hp(s"$root/rain_points__optimizing")),
      "repair should clear the marker")
    assert(fs.exists(hp(s"$root/rain_points/year=2022")),
      "repair should restore the staged-out partition")
    // marker WITHOUT a missing dir (optimizer between writes, or crash
    // before any swap): reads proceed - the table is complete
    fs.create(hp(s"$root/rain_points__optimizing"), true).close()
    assert(total() == n1, "marker alone must not block reads")
    wh.repairOptimize("rain_points")
  }
  test("optimize: nested (year=/month=) grain swaps the fragmented month leaf alone; crash mid-swap heals") {
    val root = java.nio.file.Files.createTempDirectory("graft-whoptm").toString
    val wh = new Warehouse(spark, root, monthGrain = true)
    def facts(yr: Int, mo: Int, n: Int, idOff: Long) = spark.range(n.toLong).select(
      (col("id") + idOff).as("pk_id"), lit(1L).as("upload_id"),
      org.apache.spark.sql.functions.date_add(
        lit(java.sql.Date.valueOf(f"$yr-$mo%02d-01")), (col("id") % 28).cast("int")).as("date"),
      lit(yr).as("year"),
      (col("id") % 8).cast("int").as("province_id"),
      (col("id") % 64).cast("int").as("district_id"),
      (col("id") % 100).cast("double").as("rain_mm_wmean"),
      lit(2.0).as("rainfall_mm"))
    wh.write("rain_points", facts(2022, 5, 2000, 0L).repartition(12))
    wh.write("rain_points", facts(2023, 6, 2000, 100000L).repartition(12))
    wh.write("rain_points", facts(2023, 7, 2000, 200000L).repartition(12))
    def total() = wh.read("rain_points").count()
    def files(rel: String): Set[(String, Long)] =
      new java.io.File(s"$root/rain_points/$rel").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet
    val n0 = total()

    // settle all three month leaves, then verify steady-state no-op
    wh.optimize("rain_points", targetBytes = 64L * 1024,
      zorderBy = Seq("district_id", "date"))
    assert(total() == n0)
    val s225 = files("year=2022/month=5")
    val s236 = files("year=2023/month=6")
    val s237 = files("year=2023/month=7")
    wh.optimize("rain_points", targetBytes = 64L * 1024,
      zorderBy = Seq("district_id", "date"))
    assert(files("year=2022/month=5") == s225 && files("year=2023/month=6") == s236
      && files("year=2023/month=7") == s237,
      "steady-state nested optimize must not rewrite settled leaves")

    // fragment ONLY 2023/month=7 → selective leaf swap: the sibling
    // month and the other year byte-untouched, answers intact
    wh.write("rain_points", facts(2023, 7, 2000, 300000L).repartition(12))
    val n1 = total()
    wh.optimize("rain_points", targetBytes = 64L * 1024,
      zorderBy = Seq("district_id", "date"))
    assert(total() == n1, "nested selective optimize changed the answer")
    assert(files("year=2022/month=5") == s225,
      "nested selective optimize rewrote a settled year")
    assert(files("year=2023/month=6") == s236,
      "nested selective optimize rewrote the settled sibling month")
    assert(files("year=2023/month=7") != s237, "fragmented month leaf was not rewritten")

    // crash mid-swap at leaf level: month dir staged out to the trash,
    // marker standing, live sibling months present. read() fails loud;
    // repairOptimize restores the LEAF (a top-level live-twin check
    // would see year=2023 present and lose the month).
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def hp(x: String) = new org.apache.hadoop.fs.Path(x)
    fs.mkdirs(hp(s"$root/rain_points__optimize_old/year=2023"))
    assert(fs.rename(hp(s"$root/rain_points/year=2023/month=7"),
      hp(s"$root/rain_points__optimize_old/year=2023/month=7")))
    fs.create(hp(s"$root/rain_points__optimizing"), true).close()
    intercept[IllegalStateException] { total() }
    wh.repairOptimize("rain_points")
    assert(total() == n1, "leaf-level repair did not restore the staged-out month")
    assert(fs.exists(hp(s"$root/rain_points/year=2023/month=7")))
    assert(!fs.exists(hp(s"$root/rain_points__optimizing")))
  }
  test("write: append into a torn-optimize table repairs first (no silent partition loss)") {
    val root = java.nio.file.Files.createTempDirectory("graft-whwg").toString
    val wh = new Warehouse(spark, root)
    def row(pk: Long, y: Int) = Seq((pk, 1L, Date.valueOf(s"$y-06-01"), y, 1, 11, 1.0, 2.0))
      .toDF("pk_id", "upload_id", "date", "year", "province_id", "district_id", "rain_mm_wmean", "rainfall_mm")
    wh.write("rain_points", row(1, 2022))
    wh.write("rain_points", row(2, 2023))
    // simulate an optimize that died between its two renames: year=2022
    // staged out to the trash, marker standing
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def hp(x: String) = new org.apache.hadoop.fs.Path(x)
    fs.mkdirs(hp(s"$root/rain_points__optimize_old"))
    assert(fs.rename(hp(s"$root/rain_points/year=2022"),
      hp(s"$root/rain_points__optimize_old/year=2022")))
    fs.create(hp(s"$root/rain_points__optimizing"), true).close()
    // an unguarded append would re-create year=2022 with ONLY the new
    // row; the later repair would then see a live twin, skip the
    // restore, and delete the trash — losing pk 1 forever
    wh.write("rain_points", row(3, 2022))
    assert(wh.read("rain_points").select("pk_id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 3L),
      "append into a torn table lost the staged-out partition's history")
    assert(!fs.exists(hp(s"$root/rain_points__optimizing")))
    assert(!fs.exists(hp(s"$root/rain_points__optimize_old")))
  }
  test("optimize crash matrix: every intermediate swap state heals; read fails loud only when torn") {
    // the selective swap's filesystem states, constructed directly (the
    // IvfSpec crash-replay device): for each, (1) read() throws iff a
    // staged-out leaf is missing from the live tree, (2) the writer
    // path heals, (3) a follow-up optimize converges with the answer
    // intact. Nested grain so the leaf-level machinery is what heals.
    val root = java.nio.file.Files.createTempDirectory("graft-whcm").toString
    val wh = new Warehouse(spark, root, monthGrain = true)
    def facts(mo: Int, n: Int, idOff: Long) = spark.range(n.toLong).select(
      (col("id") + idOff).as("pk_id"), lit(1L).as("upload_id"),
      org.apache.spark.sql.functions.date_add(
        lit(java.sql.Date.valueOf(f"2023-$mo%02d-01")), (col("id") % 28).cast("int")).as("date"),
      lit(2023).as("year"),
      (col("id") % 8).cast("int").as("province_id"),
      (col("id") % 64).cast("int").as("district_id"),
      (col("id") % 100).cast("double").as("rain_mm_wmean"),
      lit(2.0).as("rainfall_mm"))
    wh.write("rain_points", facts(6, 1500, 0L).repartition(8))
    wh.write("rain_points", facts(7, 1500, 100000L).repartition(8))
    wh.optimize("rain_points", targetBytes = 64L * 1024,
      zorderBy = Seq("district_id", "date"))
    // fragment month=7 so a selective swap would target exactly it
    wh.write("rain_points", facts(7, 1500, 200000L).repartition(8))
    val expect = wh.read("rain_points").select("pk_id").collect().map(_.getLong(0)).toSet
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def hp(x: String) = new org.apache.hadoop.fs.Path(x)
    def ids(): Set[Long] =
      wh.read("rain_points").select("pk_id").collect().map(_.getLong(0)).toSet
    def settle(): Unit = wh.optimize("rain_points", targetBytes = 64L * 1024,
      zorderBy = Seq("district_id", "date"))

    // state A: staging written, crash BEFORE the marker/renames —
    // reads unaffected, next optimize discards staging and proceeds
    fs.mkdirs(hp(s"$root/rain_points__optimize_staged/year=2023/month=7"))
    assert(ids() == expect, "stale staging must not affect reads")
    settle()
    assert(ids() == expect)
    assert(!fs.exists(hp(s"$root/rain_points__optimize_staged")),
      "optimize left stale staging behind")

    // state B: marker raised, crash before ANY rename (empty trash) —
    // reads proceed (nothing torn), repair clears the state
    fs.mkdirs(hp(s"$root/rain_points__optimize_old"))
    fs.create(hp(s"$root/rain_points__optimizing"), true).close()
    assert(ids() == expect, "marker with empty trash must not block reads")
    wh.repairOptimize("rain_points")
    assert(!fs.exists(hp(s"$root/rain_points__optimizing")))
    assert(ids() == expect)

    // state C: crash BETWEEN leaves — month=6 fully swapped (live has
    // a new copy, old copy still in trash), month=7 staged out and
    // missing from live. read must throw; repair must keep the new
    // month=6 (live twin present) and restore the old month=7.
    val live6 = hp(s"$root/rain_points/year=2023/month=6")
    val live7 = hp(s"$root/rain_points/year=2023/month=7")
    fs.mkdirs(hp(s"$root/rain_points__optimize_old/year=2023"))
    // month=6's "old" copy in trash alongside its live (new) twin:
    // copy by reading+writing a sibling dir is overkill — renaming the
    // real dir out and back preserves bytes; what matters is the
    // twin-present shape, so stage a COPY via a temp rename dance
    fs.rename(live6, hp(s"$root/rain_points__optimize_old/year=2023/month=6"))
    // recreate live month=6 from the trash copy's bytes (rename back
    // would empty the trash — write a fresh dir instead)
    spark.read.parquet(s"$root/rain_points__optimize_old/year=2023/month=6")
      .write.option("compression", "zstd")
      .parquet(live6.toString)
    fs.rename(live7, hp(s"$root/rain_points__optimize_old/year=2023/month=7"))
    fs.create(hp(s"$root/rain_points__optimizing"), true).close()
    intercept[IllegalStateException] { ids() }
    wh.repairOptimize("rain_points")
    assert(ids() == expect, "between-leaves repair lost rows")
    assert(!fs.exists(hp(s"$root/rain_points__optimize_old")))

    // state D: crash during final cleanup — marker alone, staging and
    // trash already gone. reads proceed; repair is a no-op clear.
    fs.create(hp(s"$root/rain_points__optimizing"), true).close()
    assert(ids() == expect)
    wh.repairOptimize("rain_points")
    assert(!fs.exists(hp(s"$root/rain_points__optimizing")))

    // convergence: a settle after the whole matrix is clean and keeps
    // the answer
    settle()
    assert(ids() == expect)
  }

  test("markerProbeTtlMs: negative probe caches within the TTL; writer paths invalidate; default stays strict") {
    val root = java.nio.file.Files.createTempDirectory("graft-whttl").toString
    def row(pk: Long, y: Int) = Seq((pk, 1L, Date.valueOf(s"$y-06-01"), y, 1, 11, 1.0, 2.0))
      .toDF("pk_id", "upload_id", "date", "year", "province_id", "district_id", "rain_mm_wmean", "rainfall_mm")
    val whStrict = new Warehouse(spark, root)
    whStrict.write("rain_points", row(1, 2022))
    whStrict.write("rain_points", row(2, 2023))
    val whTtl = new Warehouse(spark, root, markerProbeTtlMs = 60000L)
    assert(whTtl.read("rain_points").count() == 2) // caches the negative probe
    // tear AFTER the cached probe: marker + one partition staged out
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def hp(x: String) = new org.apache.hadoop.fs.Path(x)
    fs.mkdirs(hp(s"$root/rain_points__optimize_old"))
    assert(fs.rename(hp(s"$root/rain_points/year=2022"),
      hp(s"$root/rain_points__optimize_old/year=2022")))
    fs.create(hp(s"$root/rain_points__optimizing"), true).close()
    // the strict (ttl=0) instance probes every read → fails loud now
    intercept[IllegalStateException] { whStrict.read("rain_points").count() }
    // the TTL instance rides its cached negative — the DOCUMENTED
    // widened window: a partial read inside one TTL of the last probe
    // is the price of skipping the per-query metadata round-trip
    assert(whTtl.read("rain_points").count() == 1)
    // writer-path invalidation: repair drops the cache entry with the
    // state, so the next read sees the healed, complete table
    whTtl.repairOptimize("rain_points")
    assert(whTtl.read("rain_points").count() == 2)
  }

  test("optimize: randomized nested-grain sequences across LAYOUTS preserve answers and converge") {
    // the r16 surface under random composition: monthGrain (nested
    // year=/month= leaves), appends, and optimize under a layout drawn
    // from the full ADT — answers must survive every step, and a
    // settling optimize with a FIXED layout must reach a byte-stable
    // no-op even after the table was previously laid out differently
    // (the _graft_layout stamp is what forces the one re-layout).
    val rnd = new scala.util.Random(41)
    val root = java.nio.file.Files.createTempDirectory("graft-whopt-rndm").toString
    val wh = new Warehouse(spark, root, monthGrain = true)
    def facts(yr: Int, mo: Int, n: Int, idOff: Long) = spark.range(n.toLong).select(
      (col("id") + idOff).as("pk_id"), lit(1L).as("upload_id"),
      org.apache.spark.sql.functions.date_add(
        lit(java.sql.Date.valueOf(f"$yr-$mo%02d-01")), (col("id") % 28).cast("int")).as("date"),
      lit(yr).as("year"),
      (col("id") % 8).cast("int").as("province_id"),
      (col("id") % 64).cast("int").as("district_id"),
      (col("id") % 100).cast("double").as("rain_mm_wmean"),
      lit(2.0).as("rainfall_mm"))
    var nextId = 0L
    var expect = Set.empty[Long]
    def append(): Unit = {
      val yr = 2022 + rnd.nextInt(2); val mo = 5 + rnd.nextInt(3)
      val n = 200 + rnd.nextInt(1200)
      wh.write("rain_points", facts(yr, mo, n, nextId).repartition(1 + rnd.nextInt(6)))
      expect ++= (nextId until nextId + n)
      nextId += 1000000L
    }
    def ids(): Set[Long] = wh.read("rain_points")
      .select("pk_id").collect().map(_.getLong(0)).toSet
    val layouts: Seq[Warehouse.Layout] = Seq(
      Warehouse.Plain,
      Warehouse.Sort(Seq("date")),
      Warehouse.Z(Seq("district_id", "date")),
      Warehouse.WeightedZ("date", "district_id"))
    append()
    for (step <- 1 to 8) {
      if (rnd.nextBoolean()) append()
      else wh.optimize("rain_points", 64L * 1024, layouts(rnd.nextInt(layouts.size)))
      assert(ids() == expect, s"step $step changed the answer")
    }
    def files(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$root/rain_points"))
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSet
    }
    val fixed = Warehouse.WeightedZ("date", "district_id")
    wh.optimize("rain_points", 64L * 1024, fixed)
    val settled = files()
    wh.optimize("rain_points", 64L * 1024, fixed)
    assert(files() == settled, "nested-grain layout optimize did not converge to a no-op")
    assert(ids() == expect)
  }

  test("optimize: randomized append/optimize sequences preserve answers and converge to a no-op") {
    val rnd = new scala.util.Random(19)
    val root = java.nio.file.Files.createTempDirectory("graft-whopt-rnd").toString
    val wh = new Warehouse(spark, root)
    def facts(yr: Int, n: Int, idOff: Long) = spark.range(n.toLong).select(
      (col("id") + idOff).as("pk_id"), lit(1L).as("upload_id"),
      org.apache.spark.sql.functions.date_add(
        lit(java.sql.Date.valueOf(s"$yr-01-01")), (col("id") % 300).cast("int")).as("date"),
      lit(yr).as("year"),
      (col("id") % 8).cast("int").as("province_id"),
      (col("id") % 64).cast("int").as("district_id"),
      (col("id") % 100).cast("double").as("rain_mm_wmean"),
      lit(2.0).as("rainfall_mm"))
    var nextId = 0L
    var expect = Set.empty[Long]
    def append(yr: Int, n: Int): Unit = {
      wh.write("rain_points", facts(yr, n, nextId).repartition(1 + rnd.nextInt(8)))
      expect ++= (nextId until nextId + n)
      nextId += 1000000L
    }
    def ids(): Set[Long] = wh.read("rain_points")
      .select("pk_id").collect().map(_.getLong(0)).toSet
    def files(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$root/rain_points"))
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSet
    }
    append(2021, 500)
    for (step <- 1 to 8) {
      rnd.nextInt(3) match {
        case 0 => append(2021 + rnd.nextInt(3), 200 + rnd.nextInt(1500))
        case 1 => wh.optimize("rain_points", targetBytes = 64L * 1024,
          zorderBy = Seq("district_id", "date"))
        case _ => wh.optimize("rain_points", targetBytes = 64L * 1024)
      }
      assert(ids() == expect, s"step $step changed the answer")
    }
    // convergence: after one settling optimize, an immediate re-run
    // with the same config must not touch a single file
    wh.optimize("rain_points", targetBytes = 64L * 1024,
      zorderBy = Seq("district_id", "date"))
    val settled = files()
    wh.optimize("rain_points", targetBytes = 64L * 1024,
      zorderBy = Seq("district_id", "date"))
    assert(files() == settled, "optimize did not converge to a no-op")
    assert(ids() == expect)
  }
}
