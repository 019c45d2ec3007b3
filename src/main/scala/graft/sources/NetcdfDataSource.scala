package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DataSource V2 for classic NetCDF grids — the distributed flatten:
  *
  * {{{
  *   spark.read.format("netcdf")
  *     .option("var", "precip")          // data variable (default precip)
  *     .load("/path/a.nc,/path/b.nc")    // comma list of year files
  *     .where($"latitude".between(5.6, 20.5) && ...)
  * }}}
  *
  * Scale design (this is the 100 TB path for S1):
  *   - **one input partition per (file, record)** — a year of CHIRPS
  *     parallelizes into 365 tasks per file, each mapping only its own
  *     record slab's pages (the reader is offset-addressed);
  *   - **coordinate pushdown**: =/</>/between predicates on
  *     latitude/longitude prune the cell index sets, and on `time`
  *     prune whole records at PLANNING time — a bbox clip reads ~0.2%
  *     of a global grid and never materializes the rest;
  *   - pushed filters are also re-evaluated by Spark above the scan
  *     (returned as residuals), so pruning can only over-read, never
  *     drop a row it shouldn't.
  *
  * The driver-side convenience twin is [[NetcdfReader.readGrid]].
  */
class NetcdfDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "netcdf"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NetcdfTable.schemaFor(Option(options.get("var")).getOrElse("precip"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new NetcdfTable(new CaseInsensitiveStringMap(properties))
}

private object NetcdfTable {
  def schemaFor(dataVar: String): StructType = StructType(Seq(
    StructField("time", TimestampType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField(dataVar, DoubleType)))
}

private class NetcdfTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val dataVar = Option(options.get("var")).getOrElse("precip")
  override def name(): String = "netcdf"
  override def schema(): StructType = NetcdfTable.schemaFor(dataVar)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new NetcdfScanBuilder(schema(),
      Option(opts.get("path")).orElse(Option(options.get("path"))).getOrElse(""),
      dataVar)
}

private class NetcdfScanBuilder(full: StructType, path: String, dataVar: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  private def prunable(f: Filter): Boolean = f match {
    case EqualTo(a, _) => Seq("latitude", "longitude", "time").contains(a)
    case GreaterThan(a, _) => Seq("latitude", "longitude", "time").contains(a)
    case GreaterThanOrEqual(a, _) => Seq("latitude", "longitude", "time").contains(a)
    case LessThan(a, _) => Seq("latitude", "longitude", "time").contains(a)
    case LessThanOrEqual(a, _) => Seq("latitude", "longitude", "time").contains(a)
    case And(l, r) => prunable(l) && prunable(r)
    case _ => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(prunable)
    filters // all residual: pruning may only over-read, Spark re-checks
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new NetcdfScan(full, required, path.split(",").map(_.trim).filter(_.nonEmpty), dataVar, pushed)
}

/** One (file, record) slab plus the surviving cell indices. */
private case class NetcdfPartition(path: String, record: Int, timeMicros: Long,
    latIdx: Array[Int], lonIdx: Array[Int]) extends InputPartition

private class NetcdfScan(full: StructType, required: StructType, paths: Seq[String],
    dataVar: String, pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  private def bounds(att: String): (Double, Double) = {
    var lo = Double.NegativeInfinity
    var hi = Double.PositiveInfinity
    def num(v: Any): Double = v match {
      case n: java.lang.Number => n.doubleValue()
      case t: java.sql.Timestamp => t.getTime * 1000.0 // micros, like the row
      case i: java.time.Instant => i.toEpochMilli * 1000.0
      case d: java.sql.Date => d.getTime * 1000.0
      case other => other.toString.toDouble
    }
    def walk(f: Filter): Unit = f match {
      case EqualTo(a, v) if a == att => lo = math.max(lo, num(v)); hi = math.min(hi, num(v))
      case GreaterThan(a, v) if a == att => lo = math.max(lo, num(v))
      case GreaterThanOrEqual(a, v) if a == att => lo = math.max(lo, num(v))
      case LessThan(a, v) if a == att => hi = math.min(hi, num(v))
      case LessThanOrEqual(a, v) if a == att => hi = math.min(hi, num(v))
      case And(l, r) => walk(l); walk(r)
      case _ => ()
    }
    pushed.foreach(walk)
    (lo, hi)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (latLo, latHi) = bounds("latitude")
    val (lonLo, lonHi) = bounds("longitude")
    val (tLo, tHi) = bounds("time")
    paths.flatMap { p =>
      val nc = NetcdfReader.open(p)
      val v = nc.variable(dataVar)
      val dimNames = v.dimIds.map(nc.dims(_).name)
      require(dimNames.size == 3 && nc.dims(v.dimIds.head).isRecord,
        s"$dataVar must be [record-time, lat, lon]; got [${dimNames.mkString(",")}] in $p")
      val tv = nc.variable(dimNames(0))
      val times = NetcdfReader.decodeTime(NetcdfReader.readValues(nc, tv),
        tv.att("units").collect { case s: String => s }
          .getOrElse(throw new IllegalArgumentException(s"${dimNames(0)} has no units attribute")))
      val lats = NetcdfReader.readValues(nc, nc.variable(dimNames(1)))
      val lons = NetcdfReader.readValues(nc, nc.variable(dimNames(2)))
      // index pruning (any coordinate ordering): keep cells in bounds
      val latIdx = lats.indices.filter(i => lats(i) >= latLo && lats(i) <= latHi).toArray
      val lonIdx = lons.indices.filter(i => lons(i) >= lonLo && lons(i) <= lonHi).toArray
      if (latIdx.isEmpty || lonIdx.isEmpty) Seq.empty
      else times.indices.collect {
        case r if times(r).getTime * 1000.0 >= tLo && times(r).getTime * 1000.0 <= tHi =>
          NetcdfPartition(p, r, times(r).getTime * 1000L, latIdx, lonIdx)
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NetcdfReaderFactory(full, required, dataVar)
}

private class NetcdfReaderFactory(full: StructType, required: StructType, dataVar: String)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[NetcdfPartition]
    new PartitionReader[InternalRow] {
      // executor-side: map the file, read ONLY this record's slab
      private val nc = NetcdfReader.open(part.path)
      private val v = nc.variable(dataVar)
      private val lats = NetcdfReader.readValues(nc, nc.variable(nc.dims(v.dimIds(1)).name))
      private val lons = NetcdfReader.readValues(nc, nc.variable(nc.dims(v.dimIds(2)).name))
      private val slab = NetcdfReader.readSlab(nc, v, part.record)
      private val nLon = lons.length
      private val colIdx = required.fields.map(f => full.fieldIndex(f.name))
      private var li = 0
      private var lj = -1
      private var current: InternalRow = _
      override def next(): Boolean = {
        lj += 1
        if (lj >= part.lonIdx.length) { lj = 0; li += 1 }
        if (li >= part.latIdx.length) return false
        val la = part.latIdx(li)
        val lo = part.lonIdx(lj)
        val d = slab(la * nLon + lo)
        val all: Array[Any] = Array(
          part.timeMicros,
          lats(la),
          lons(lo),
          if (d.isNaN) null else java.lang.Double.valueOf(d))
        current = InternalRow.fromSeq(colIdx.toSeq.map(all))
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
