package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IndexMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def deleteRec(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try walk.iterator().asScala.toSeq.reverse
      .foreach(f => java.nio.file.Files.deleteIfExists(f))
    finally walk.close()
  }

  test("compactDir: one file, row set preserved, dedupe collapses retry duplicates") {
    val root = java.nio.file.Files.createTempDirectory("idxmaint").toString
    val dir = s"$root/pmd5"
    try {
      // three appends, one a retry-style duplicate of the first
      Seq("a", "b").toDF("h").write.mode("append").parquet(dir)
      Seq("a", "b").toDF("h").write.mode("append").parquet(dir) // retry dup
      Seq("c").toDF("h").write.mode("append").parquet(dir)
      val filesBefore = new java.io.File(dir).listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(filesBefore >= 3)

      IndexMaintenance.compactDir(spark, dir, dedupeRows = true)

      val files = new java.io.File(dir).listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"expected 1 file after compaction, found $files")
      assert(spark.read.parquet(dir).as[String].collect().sorted.toSeq ==
        Seq("a", "b", "c"))
      val debris = new java.io.File(root).listFiles().map(_.getName)
        .filter(n => n.contains("__compacting") || n.contains("__old"))
      assert(debris.isEmpty, s"staging debris: ${debris.mkString(",")}")
      // still appendable after the swap
      Seq("d").toDF("h").write.mode("append").parquet(dir)
      assert(spark.read.parquet(dir).count() == 4L)
    } finally deleteRec(root)
  }

  test("compactDir without dedupe preserves row multiplicity (additive stats)") {
    val root = java.nio.file.Files.createTempDirectory("idxmaint2").toString
    val dir = s"$root/stats"
    try {
      Seq(("x", 1L), ("y", 2L)).toDF("k", "n").write.mode("append").parquet(dir)
      Seq(("x", 3L)).toDF("k", "n").write.mode("append").parquet(dir)
      IndexMaintenance.compactDir(spark, dir)
      val rows = spark.read.parquet(dir).as[(String, Long)].collect().sorted.toSeq
      assert(rows == Seq(("x", 1L), ("x", 3L), ("y", 2L)),
        "multiplicity must survive a non-dedupe compaction")
    } finally deleteRec(root)
  }

  test("paragraph index: increment → compact → increment answers like one batch run") {
    val lines = Seq(
      (1L, 0, "A"), (1L, 1, "B"),
      (2L, 0, "A"), (2L, 1, "C"),
      (3L, 0, "B"), (3L, 1, "D"),
    ).toDF("id", "pos", "para")
    val expect = Dedup.paragraphDedup(lines, "id", "pos", "para")
      .as[(Long, Long, Long, String)].collect().toSet
    val idx = java.nio.file.Files.createTempDirectory("paracompact").toString
    try {
      val o1 = Dedup.paragraphDedupIncrement(lines.where($"id" === 1), idx,
        "id", "pos", "para").as[(Long, Long, Long, String)].collect().toSet
      val o2 = Dedup.paragraphDedupIncrement(lines.where($"id" === 2), idx,
        "id", "pos", "para").as[(Long, Long, Long, String)].collect().toSet
      IndexMaintenance.compactDir(spark, s"$idx/pmd5", dedupeRows = true)
      val o3 = Dedup.paragraphDedupIncrement(lines.where($"id" === 3), idx,
        "id", "pos", "para").as[(Long, Long, Long, String)].collect().toSet
      assert(o1 ++ o2 ++ o3 == expect,
        "mid-stream compaction changed incremental results")
    } finally deleteRec(idx)
  }
  test("paragraph index: torn compaction swap restores on the next increment, never degrades to empty") {
    val lines = Seq(
      (1L, 0, "A"), (1L, 1, "B"),
      (2L, 0, "A"), (2L, 1, "C"),
    ).toDF("id", "pos", "para")
    val idx = java.nio.file.Files.createTempDirectory("paratorn").toString
    try {
      Dedup.paragraphDedupIncrement(lines.where($"id" === 1), idx,
        "id", "pos", "para").count()
      val fs = new org.apache.hadoop.fs.Path(idx)
        .getFileSystem(spark.sessionState.newHadoopConf())
      def p(x: String) = new org.apache.hadoop.fs.Path(x)
      // crash between compactDir's renames: pmd5/ gone, __old complete.
      // The exists-probe would read "no index yet": doc 2's seen
      // paragraph "A" would wrongly re-emit and the fingerprint set
      // would be re-created from doc 2 alone.
      assert(fs.rename(p(s"$idx/pmd5"), p(s"$idx/pmd5__old")))
      val o2 = Dedup.paragraphDedupIncrement(lines.where($"id" === 2), idx,
        "id", "pos", "para").as[(Long, Long, Long, String)].collect().toSet
      assert(!o2.exists(_._4.contains("A")),
        "seen paragraph re-emitted after a torn swap - index not restored")
      // un-restorable state (only staged survives) fails loudly
      assert(fs.rename(p(s"$idx/pmd5"), p(s"$idx/pmd5__compacting")))
      intercept[IllegalStateException] {
        Dedup.paragraphDedupIncrement(lines.where($"id" === 2), idx,
          "id", "pos", "para").count()
      }
    } finally deleteRec(idx)
  }
}
