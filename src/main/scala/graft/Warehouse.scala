package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Parquet warehouse for the engine's tables (SURVEY.md §4).
  *
  * Facts are partitioned by `year` — the Spark replacement for the
  * reference's b-tree indexes on date/year: date-range predicates
  * partition-prune, and parquet row-group min/max stats cover the
  * within-year `date` bounds. Dims and metadata tables are single
  * unpartitioned files (they are tiny).
  *
  * `monthGrain = true` adds a derived `month` column under each year
  * dir (year=…/month=…): at 100 TB a year of daily grid facts is
  * hundreds of GB per partition, and month-scoped queries (the
  * dashboard's common window) should open 1/12th of it. Readers see
  * the extra `month` column; date predicates written as
  * `month(col("date"))` comparisons prune the dirs.
  *
  * At 100 TB the same layout holds: year/month partitions keep any
  * one scan bounded, appends are new files inside existing partitions
  * (no rewrite), and writers never touch readers (parquet committer
  * atomicity per job).
  */
final class Warehouse(spark: SparkSession, root: String, monthGrain: Boolean = false) {

  private val partitionedBy: Map[String, Seq[String]] = Map(
    "rain_points" -> Seq("year"),
    "incident_statistics_points" -> Seq("year"))

  private def partCols(table: String, cols: Seq[String]): Option[Seq[String]] =
    partitionedBy.get(table)
      .map(base => if (monthGrain) base :+ "month" else base)
      .filter(_.forall(c => cols.contains(c) || c == "month"))

  def path(table: String): String = s"$root/$table"

  def write(table: String, df: DataFrame, mode: SaveMode = SaveMode.Append): Unit = {
    // zstd: ~30% smaller than snappy at comparable scan cost — at
    // 100 TB the scan is IO-bound, so smaller files win twice
    val parts = partCols(table, df.columns.toSeq)
    val withGrain =
      if (monthGrain && parts.isDefined && !df.columns.contains("month")
          && df.columns.contains("date"))
        df.withColumn("month", org.apache.spark.sql.functions.month(
          org.apache.spark.sql.functions.col("date")))
      else df
    val w = withGrain.write.mode(mode).option("compression", "zstd")
    parts.filter(_.forall(withGrain.columns.contains))
      .fold(w)(cols => w.partitionBy(cols: _*))
      .parquet(path(table))
  }

  def read(table: String): DataFrame = spark.read.parquet(path(table))

  // Resolved through Hadoop's FileSystem, not java.io.File: with an
  // hdfs:// or s3a:// warehouse root a local-File check would always
  // say "missing", making readOrEmpty silently empty and breaking the
  // anti-join idempotency (every key would re-insert).
  def exists(table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(table))
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  def readOrEmpty(table: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (exists(table)) read(table)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Compact a table's small files: every append writes new files into
    * the year partitions, and at upload-per-request cadence a year of
    * traffic is thousands of KB-scale files — the classic small-file
    * problem (scan tasks, namenode pressure, footer overhead all scale
    * with file count). Rewrites each partition dir to
    * ⌈dirBytes/target⌉ files (a deterministic row-hash salt spreads a
    * big partition over several writers; `partitionBy` alone would
    * otherwise emit one file per shuffle task per dir). Staged write +
    * swap: readers in flight keep their already-opened files. Run from
    * the single-writer control plane, like all mutations here. */
  /** @param zorderBy 2–3 numeric columns: rewrite in Morton order (the
    *   OPTIMIZE-ZORDER analog) so parquet min/max stats skip files for
    *   predicates on ANY of them. Unpartitioned tables range-lay the
    *   whole table on the z-key; partitioned tables keep their dirs and
    *   z-sort WITHIN each (cross-dir ordering is already the partition
    *   column's job).
    * @param quantile bucketize the z-order dims by quantile boundaries
    *   instead of linear min/max scaling. Linear bucketing collapses on
    *   skewed dims (a zipf column maps almost every row to bucket 0 —
    *   ZOrderSpec measures it), so compacting on doc length / user-id
    *   frequency / any long-tailed column wants this flag; the cost is
    *   one approx-percentile scan instead of a min/max agg. */
  def compact(table: String, targetBytes: Long = 128L * 1024 * 1024,
      zorderBy: Seq[String] = Nil, quantile: Boolean = false): Unit = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val conf = spark.sessionState.newHadoopConf()
    val live = new org.apache.hadoop.fs.Path(path(table))
    val fs = live.getFileSystem(conf)
    require(fs.exists(live), s"no such table: $table")
    val bytes = fs.getContentSummary(live).getLength
    val staged = new org.apache.hadoop.fs.Path(s"${path(table)}__compacting")
    fs.delete(staged, true)
    val df0 = read(table)
    // z-dims must be numeric for bucketizing; DATE/TIMESTAMP serving
    // filters (the (district_id, date) layout q_list_page/q_graph_day
    // want) z-order through a derived numeric view — days / micros
    // since epoch, monotone in the original so file min/max stats on
    // the REAL column skip exactly as if it were numeric
    val zvNames = zorderBy.indices.map(i => s"__zv$i")
    val df =
      if (zorderBy.isEmpty) df0
      else {
        require(zorderBy.size == 2 || zorderBy.size == 3, "z-order takes 2 or 3 columns")
        require(zorderBy.forall(df0.columns.contains), s"z-order columns missing from $table")
        graft.ops.Reserved.requireAbsent("compact", Seq("__salt", "__z") ++ zvNames, df0)
        import org.apache.spark.sql.functions.{datediff, to_date, unix_micros}
        import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
        zorderBy.zip(zvNames).foldLeft(df0) { case (d, (c, n)) =>
          d.withColumn(n, df0.schema(c).dataType match {
            case DateType => datediff(col(c), to_date(lit("1970-01-01")))
            case TimestampType => unix_micros(col(c))
            case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
            case _ => col(c)
          })
        }
      }
    val zkey: Option[org.apache.spark.sql.Column] =
      if (zorderBy.isEmpty) None
      else {
        val zc = zvNames
        val bk: Option[Seq[org.apache.spark.sql.Column]] =
          if (quantile)
            // all-null dim / empty table → same plain-compaction fallback
            // as the linear path below
            try Some(graft.ops.ZOrder.bucketizeByQuantilesMulti(df, zc, 12))
            catch { case _: IllegalArgumentException => None }
          else {
            val bits = if (zorderBy.size == 3) 21 else 20
            val bounds = df.agg(
              org.apache.spark.sql.functions.min(col(zc.head)).cast("double"),
              org.apache.spark.sql.functions.max(col(zc.head)).cast("double"),
              org.apache.spark.sql.functions.min(col(zc(1))).cast("double"),
              org.apache.spark.sql.functions.max(col(zc(1))).cast("double"),
              org.apache.spark.sql.functions.min(col(zc.lift(2).getOrElse(zc.head))).cast("double"),
              org.apache.spark.sql.functions.max(col(zc.lift(2).getOrElse(zc.head))).cast("double"))
              .head()
            // empty table / all-null dim: no meaningful z-layout exists;
            // fall back to a plain compaction instead of an NPE
            if (zc.indices.exists(i =>
                bounds.isNullAt(2 * i) || bounds.isNullAt(2 * i + 1))) None
            else Some(zc.zipWithIndex.map { case (c, i) =>
              graft.ops.ZOrder.bucketize(col(c), bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1), bits)
            })
          }
        bk.map(b =>
          if (zorderBy.size == 2) graft.ops.ZOrder.zkey2(b(0), b(1))
          else graft.ops.ZOrder.zkey3(b(0), b(1), b(2)))
      }
    val parts = partCols(table, df.columns.toSeq).filter(_.forall(df.columns.contains))
    val writer = parts match {
      case Some(cols) =>
        val dirs = math.max(1, fs.listStatus(live)
          .count(s => s.isDirectory && s.getPath.getName.contains("=")))
        val perDir = math.max(1, math.ceil(bytes.toDouble / dirs / targetBytes).toInt)
        zkey match {
          case None =>
            val salted = df.withColumn("__salt",
                pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(perDir.toLong)))
              .repartition((cols.map(col) :+ col("__salt")): _*)
            salted.drop(("__salt" +: zvNames): _*).write.partitionBy(cols: _*)
          case Some(z) =>
            // RANGE-partition on (dir cols, z), not hash-salt: each
            // writer task then owns one contiguous z-slice of one dir,
            // so every output FILE covers a tight z-range — that's
            // what lets a parquet footer min/max check skip whole
            // files. (A hash salt would spread each dir's rows
            // uniformly over its files: z-sorted inside, but every
            // file spanning the full z-domain — zero cross-file
            // skipping, the layout this rewrite exists to produce.)
            df.withColumn("__z", z)
              .repartitionByRange(math.max(1, dirs * perDir),
                (cols.map(col) :+ col("__z")): _*)
              .sortWithinPartitions((cols.map(col) :+ col("__z")): _*)
              .drop((Seq("__z") ++ zvNames): _*)
              .write.partitionBy(cols: _*)
        }
      case None =>
        val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
        zkey.fold(df.drop(zvNames: _*).repartition(nFiles).write) { z =>
          df.withColumn("__z", z)
            .repartitionByRange(nFiles, col("__z"))
            .sortWithinPartitions("__z")
            .drop(("__z" +: zvNames): _*)
            .write
        }
    }
    writer.mode(SaveMode.Overwrite).option("compression", "zstd")
      .parquet(staged.toString)
    // Swap in the crash-safe order: live→__old, staged→live, drop __old.
    // delete-then-rename would leave NO live table if the rename fails
    // or the process dies between the two (and on object stores rename
    // is a slow copy, widening that window). Here every intermediate
    // state still has the data adjacent: if staged→live fails, __old is
    // restored; __old delete is last and failure there leaves a stale
    // copy, not a missing table.
    val old = new org.apache.hadoop.fs.Path(s"${path(table)}__old")
    fs.delete(old, true)
    require(fs.rename(live, old), s"compaction: cannot stage out live $table")
    if (!fs.rename(staged, live)) {
      require(fs.rename(old, live), s"compaction: $table lost — data in ${old}")
      throw new IllegalStateException(s"compaction swap failed for $table; live restored")
    }
    fs.delete(old, true)
  }
}
