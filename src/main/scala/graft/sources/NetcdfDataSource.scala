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
  *     .load("/path/a.nc", "/path/b.nc") // or one comma-separated path
  *     .where($"latitude".between(5.6, 20.5) && ...)
  * }}}
  *
  * Scale design (this is the 100 TB path for S1):
  *   - **one input partition per (file, record)** — a year of CHIRPS
  *     parallelizes into 365 tasks per file;
  *   - **all header work happens once at planning**: each partition
  *     ships its slab's byte range plus the (pruned) coordinate
  *     values, so an executor maps exactly its record's bytes — no
  *     header re-parse, no coordinate re-read per task;
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

  /** Spark passes load(p1, p2, …) as a JSON-array "paths" option and a
    * single load(p) as "path" — accept both. A comma-separated "path"
    * is split ONLY when the raw string is not itself an existing file,
    * so a legitimate path containing a comma still resolves; multi-file
    * loads should prefer load(p1, p2, …) / "paths". */
  def pathsOf(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).toSeq.flatMap { json =>
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      m.readValue(json, classOf[Array[String]]).toSeq
    }
    val single = Option(options.get("path")).toSeq.flatMap { raw =>
      if (!raw.contains(",") || java.nio.file.Files.exists(java.nio.file.Paths.get(raw)))
        Seq(raw)
      else raw.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    }
    (multi ++ single).distinct
  }
}

private class NetcdfTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  private val dataVar = Option(options.get("var")).getOrElse("precip")
  override def name(): String = "netcdf"
  override def schema(): StructType = NetcdfTable.schemaFor(dataVar)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new java.util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(opts.asCaseSensitiveMap())
    new NetcdfScanBuilder(schema(),
      NetcdfTable.pathsOf(new CaseInsensitiveStringMap(merged)), dataVar)
  }
}

private class NetcdfScanBuilder(full: StructType, paths: Seq[String], dataVar: String)
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

  override def build(): Scan = new NetcdfScan(full, required, paths, dataVar, pushed)
}

/** One (file, record) slab: byte range + read params + the surviving
  * (pruned) coordinate values — everything the executor needs without
  * touching the header. */
private case class NetcdfPartition(path: String, timeMicros: Long,
    slabBase: Long, ncType: Int, fill: Double, scale: Double, addOffset: Double,
    nLonTotal: Int, latIdx: Array[Int], latVals: Array[Double],
    lonIdx: Array[Int], lonVals: Array[Double]) extends InputPartition

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
      else {
        val stride = NetcdfReader.recordStride(nc, v)
        times.indices.collect {
          case r if times(r).getTime * 1000.0 >= tLo && times(r).getTime * 1000.0 <= tHi =>
            NetcdfPartition(p, times(r).getTime * 1000L,
              v.begin + r * stride, v.ncType,
              v.numAtt("_FillValue").getOrElse(Double.NaN),
              v.numAtt("scale_factor").getOrElse(1.0),
              v.numAtt("add_offset").getOrElse(0.0),
              lons.length,
              latIdx, latIdx.map(lats), lonIdx, lonIdx.map(lons))
        }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NetcdfReaderFactory(full, required)
}

private class NetcdfReaderFactory(full: StructType, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[NetcdfPartition]
    new PartitionReader[InternalRow] {
      // executor-side: map ONLY this record's slab bytes
      private val ts = NetcdfReader.typeSize(part.ncType)
      private val slabLen = part.nLonTotal.toLong *
        (part.latIdx.lastOption.getOrElse(0) + 1) * ts
      private val bb = new NetcdfReader.NcSource(part.path).buffer(part.slabBase, slabLen)
      private val colIdx = required.fields.map(f => full.fieldIndex(f.name))
      private var li = 0
      private var lj = -1
      private var current: InternalRow = _
      private def rawAt(cell: Int): Double = part.ncType match {
        case 1 => bb.get(cell * ts).toDouble
        case 3 => bb.getShort(cell * ts).toDouble
        case 4 => bb.getInt(cell * ts).toDouble
        case 5 => bb.getFloat(cell * ts).toDouble
        case 6 => bb.getDouble(cell * ts)
        case t => throw new IllegalArgumentException(s"unsupported data nc_type $t")
      }
      override def next(): Boolean = {
        lj += 1
        if (lj >= part.lonIdx.length) { lj = 0; li += 1 }
        if (li >= part.latIdx.length) return false
        val raw = rawAt(part.latIdx(li) * part.nLonTotal + part.lonIdx(lj))
        val d =
          if (!part.fill.isNaN && (raw == part.fill || raw.isNaN)) Double.NaN
          else if (raw.isNaN) Double.NaN
          else raw * part.scale + part.addOffset
        val all: Array[Any] = Array(
          part.timeMicros,
          part.latVals(li),
          part.lonVals(lj),
          if (d.isNaN) null else java.lang.Double.valueOf(d))
        current = InternalRow.fromSeq(colIdx.toSeq.map(all))
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
