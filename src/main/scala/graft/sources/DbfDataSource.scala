package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 integration for DBF attribute tables:
  *
  * {{{
  *   spark.read.format("dbf")
  *     .option("encoding", "TIS-620")   // unless a .cpg declares it
  *     .load("/path/to/table.dbf")      // or a comma list of paths
  * }}}
  *
  * Schema inference parses only the file header; each file becomes one
  * input partition whose reader re-parses that file on the EXECUTOR
  * (the driver never materializes rows — unlike the convenience
  * [[DbfReader.read]], this path scales to many files). Column pruning
  * is honored by projecting the requested columns.
  */
class DbfDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "dbf"

  private def paths(options: CaseInsensitiveStringMap): Seq[String] =
    Option(options.get("path")).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val ps = paths(options)
    require(ps.nonEmpty, "dbf source requires a path")
    DbfSchema.of(ps.head, Option(options.get("encoding")))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DbfTable(schema, new CaseInsensitiveStringMap(properties))
}

private object DbfSchema {
  /** Header-only schema parse (no record materialization). */
  def of(path: String, encoding: Option[String]): StructType = {
    // DbfReader's full parse is cheap for the header; reuse it on an
    // empty projection by reading the schema of the parsed frame is
    // wasteful — parse the descriptor block directly instead.
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val headerLen = ((bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8))
    var off = 32
    val fields = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.types.StructField]
    while (off < headerLen - 1 && bytes(off) != 0x0d) {
      val name = new String(bytes.slice(off, off + 11).takeWhile(_ != 0), "ASCII").trim
      val ftype = bytes(off + 11).toChar
      val length = bytes(off + 16) & 0xff
      val decimals = bytes(off + 17) & 0xff
      val dt = ftype match {
        case 'N' | 'F' =>
          if (decimals == 0 && length < 10) org.apache.spark.sql.types.LongType
          else org.apache.spark.sql.types.DoubleType
        case 'L' => org.apache.spark.sql.types.BooleanType
        case _ => org.apache.spark.sql.types.StringType
      }
      fields += org.apache.spark.sql.types.StructField(name, dt)
      off += 32
    }
    StructType(fields.toSeq)
  }
}

private class DbfTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "dbf"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new DbfScanBuilder(schema,
      Option(opts.get("path")).orElse(Option(options.get("path"))).getOrElse(""),
      Option(opts.get("encoding")).orElse(Option(options.get("encoding"))))
}

private class DbfScanBuilder(schema: StructType, path: String, encoding: Option[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new DbfScan(schema, required, path, encoding)
}

private case class DbfInputPartition(path: String) extends InputPartition

private class DbfScan(full: StructType, required: StructType, path: String,
    encoding: Option[String]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    path.split(",").map(_.trim).filter(_.nonEmpty).map(DbfInputPartition.apply).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new DbfReaderFactory(full, required, encoding)
}

private class DbfReaderFactory(full: StructType, required: StructType,
    encoding: Option[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DbfInputPartition].path
    new PartitionReader[InternalRow] {
      // executor-side parse of just this file
      private val rows: Iterator[org.apache.spark.sql.Row] =
        DbfReader.parseRows(p, encoding.getOrElse("TIS-620")).iterator
      private val idx = required.fields.map(f => full.fieldIndex(f.name))
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (!rows.hasNext) return false
        val r = rows.next()
        current = InternalRow.fromSeq(idx.toSeq.map { i =>
          r.get(i) match {
            case s: String => UTF8String.fromString(s)
            case other => other
          }
        })
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
