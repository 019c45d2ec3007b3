package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 for ESRI shapefiles — the `gpd.read_file` analog
  * (reference: `backend/app/utils.py:80,186-197`): attributes from the
  * sibling `.dbf` paired by record number with polygon geometry from
  * the `.shp`, as WKT.
  *
  * {{{
  *   spark.read.format("shapefile")
  *     .option("encoding", "TIS-620")            // unless .cpg declares it
  *     .option("bbox", "97.3,5.6,105.7,20.5")    // optional minx,miny,maxx,maxy
  *     .load("/path/to/adm2.shp")                // or a comma list
  * }}}
  *
  * Schema = dbf attribute columns + `_recno` (long) + `wkt` (string).
  * Each file is one input partition parsed on the EXECUTOR. Column
  * pruning is real work saved: if `wkt` isn't required the `.shp` is
  * never opened (geometry dominates the bytes), and if only `wkt` is
  * required the `.dbf` isn't. The `bbox` option drops records whose
  * ring envelope doesn't intersect it during the parse — the polygon
  * analog of the NetCDF source's coordinate pushdown.
  */
class ShapefileDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "shapefile"

  private def paths(options: CaseInsensitiveStringMap): Seq[String] =
    Option(options.get("path")).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val ps = paths(options)
    require(ps.nonEmpty, "shapefile source requires a path")
    ShapefileSchema.of(ps.head, Option(options.get("encoding")))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ShapefileTable(schema, new CaseInsensitiveStringMap(properties))
}

private object ShapefileSchema {
  def dbfPathOf(shpPath: String): String = shpPath.replaceAll("\\.shp$", ".dbf")

  def of(shpPath: String, encoding: Option[String]): StructType = {
    val attrs = DbfSchema.of(dbfPathOf(shpPath), encoding)
    StructType(attrs.fields.toSeq :+
      StructField("_recno", LongType, nullable = false) :+
      StructField("wkt", StringType, nullable = true))
  }

  def parseBbox(s: String): Array[Double] = {
    val parts = s.split(",").map(_.trim.toDouble)
    require(parts.length == 4, s"bbox must be minx,miny,maxx,maxy — got '$s'")
    parts
  }
}

private class ShapefileTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "shapefile"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    def opt(k: String) = Option(opts.get(k)).orElse(Option(options.get(k)))
    new ShapefileScanBuilder(schema, opt("path").getOrElse(""),
      opt("encoding"), opt("bbox").map(ShapefileSchema.parseBbox))
  }
}

private class ShapefileScanBuilder(schema: StructType, path: String,
    encoding: Option[String], bbox: Option[Array[Double]])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new ShapefileScan(schema, required, path, encoding, bbox)
}

private case class ShapefileInputPartition(path: String) extends InputPartition

private class ShapefileScan(full: StructType, required: StructType, path: String,
    encoding: Option[String], bbox: Option[Array[Double]]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    path.split(",").map(_.trim).filter(_.nonEmpty)
      .map(ShapefileInputPartition.apply).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new ShapefileReaderFactory(full, required, encoding, bbox)
}

private class ShapefileReaderFactory(full: StructType, required: StructType,
    encoding: Option[String], bbox: Option[Array[Double]]) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val shpPath = partition.asInstanceOf[ShapefileInputPartition].path
    val needWkt = required.fieldNames.contains("wkt")
    val attrNames = required.fieldNames.filter(n => n != "wkt" && n != "_recno")
    val needAttrs = attrNames.nonEmpty

    new PartitionReader[InternalRow] {
      // executor-side: open only the member files the projection needs
      private val rings: Map[Long, Seq[ShpReader.RawRing]] =
        if (needWkt || bbox.isDefined) ShpReader.readRings(shpPath).toMap else Map.empty
      private val parsedAttrs: Option[(StructType, Seq[org.apache.spark.sql.Row])] =
        if (needAttrs) Some(DbfReader.parseWithSchema(
          ShapefileSchema.dbfPathOf(shpPath), encoding.getOrElse("TIS-620"),
          withRecno = true))
        else None
      private val attrs: Map[Long, org.apache.spark.sql.Row] =
        parsedAttrs.map { case (schema, rows) =>
          val recnoIdx = schema.fieldIndex("_recno")
          rows.map(r => r.getLong(recnoIdx) -> r).toMap
        }.getOrElse(Map.empty)
      private val attrIdx: Map[String, Int] =
        parsedAttrs.map { case (schema, _) =>
          attrNames.map(n => n -> schema.fieldIndex(n)).toMap
        }.getOrElse(Map.empty)

      private def intersects(rs: Seq[ShpReader.RawRing]): Boolean = bbox match {
        case None => true
        case Some(Array(minx, miny, maxx, maxy)) =>
          rs.exists { r =>
            var i = 0
            var rMinX = Double.MaxValue; var rMaxX = Double.MinValue
            var rMinY = Double.MaxValue; var rMaxY = Double.MinValue
            while (i < r.xs.length) {
              if (r.xs(i) < rMinX) rMinX = r.xs(i)
              if (r.xs(i) > rMaxX) rMaxX = r.xs(i)
              if (r.ys(i) < rMinY) rMinY = r.ys(i)
              if (r.ys(i) > rMaxY) rMaxY = r.ys(i)
              i += 1
            }
            rMinX <= maxx && rMaxX >= minx && rMinY <= maxy && rMaxY >= miny
          }
        case _ => true
      }

      private val recnos: Iterator[Long] = {
        val all: Seq[Long] =
          if (needWkt || bbox.isDefined) rings.keys.toSeq.sorted
          else if (needAttrs) attrs.keys.toSeq.sorted
          // empty projection (count(*)) or _recno alone: the dbf header
          // carries the record count in 4 bytes — no full parse needed
          else {
            val ch = java.nio.channels.FileChannel.open(
              java.nio.file.Paths.get(ShapefileSchema.dbfPathOf(shpPath)),
              java.nio.file.StandardOpenOption.READ)
            try {
              val bb = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
              ch.read(bb, 0)
              (0L until bb.getInt(4).toLong).toSeq
            } finally ch.close()
          }
        (if (bbox.isDefined) all.filter(r => intersects(rings.getOrElse(r, Seq.empty)))
         else all).iterator
      }
      private var current: InternalRow = _

      override def next(): Boolean = {
        if (!recnos.hasNext) return false
        val recno = recnos.next()
        val values = required.fields.map { f =>
          f.name match {
            case "_recno" => recno
            case "wkt" =>
              ShpReader.ringsToWkt(rings.getOrElse(recno, Seq.empty))
                .map(UTF8String.fromString).orNull
            case n =>
              attrs.get(recno).map(_.get(attrIdx(n))).map {
                case s: String => UTF8String.fromString(s)
                case other => other
              }.orNull
          }
        }
        current = InternalRow.fromSeq(values.toSeq)
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
