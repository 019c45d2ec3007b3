package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Minimal NetCDF *classic* format (CDF-1/CDF-2) reader — the repo's
  * own flatten tool for the rainfall grid (SURVEY.md §2.1 S1; the
  * reference opens these with `xr.open_dataset` at
  * `backend/app/utils.py:63-77` and flattens to long-form rows).
  *
  * Format per the public NetCDF classic specification: a header of
  * [magic 'CDF' + version byte, numrecs, dim_list, gatt_list,
  * var_list]; names are length-prefixed and 4-byte padded; all values
  * big-endian. Each variable carries its dim ids, attributes, external
  * type, per-slab vsize, and a begin offset (4 bytes in CDF-1, 8 in
  * CDF-2). Variables over the record (unlimited) dimension store one
  * slab per record, interleaved with stride = Σ record-var vsizes
  * (single record var: its own slab size, unpadded when it is the only
  * one and byte/char/short-typed).
  *
  * Scope: the grid-ingest subset — numeric types, `_FillValue` →
  * null, `scale_factor`/`add_offset` applied, CF "days/hours/seconds
  * since <epoch>" time units decoded. Like the DBF/XLSX/SHP readers
  * this is driver-side staged-ingest I/O: the flattened frame then
  * parallelizes and every downstream operator is a plain DataFrame
  * over it. (At real 100 TB scale one would flatten each year-file in
  * parallel tasks; the per-file parse is identical.)
  */
object NetcdfReader {

  final case class NcDim(name: String, length: Int) { def isRecord: Boolean = length == 0 }
  final case class NcAtt(name: String, values: Any)
  final case class NcVar(name: String, dimIds: Seq[Int], atts: Seq[NcAtt],
      ncType: Int, vsize: Int, begin: Long) {
    def att(n: String): Option[Any] = atts.find(_.name == n).map(_.values)
    /** First numeric value of an attribute, if present. */
    def numAtt(n: String): Option[Double] = att(n).flatMap {
      case a: Array[Double] => a.headOption
      case _ => None
    }
  }
  /** Region access to the file: each read loads only [off, off+len)
    * via positioned FileChannel reads into a heap buffer — so a 2 GB+
    * year file never needs a whole-file map, and (unlike mmap) nothing
    * outlives the call: a long-lived executor scanning thousands of
    * (file, record) partitions accumulates no mapped regions awaiting
    * GC and holds no file handles between reads. */
  final class NcSource(val path: String) {
    def buffer(off: Long, len: Long): ByteBuffer = {
      val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
      try {
        val n = math.min(len, ch.size() - off)
        require(n <= Int.MaxValue, s"slab read of $n bytes exceeds 2 GB: $path")
        val bb = ByteBuffer.allocate(math.max(n, 0L).toInt)
        var pos = off
        while (bb.hasRemaining) {
          val r = ch.read(bb, pos)
          if (r < 0) throw new java.io.EOFException(s"unexpected EOF at $pos in $path")
          pos += r
        }
        bb.flip()
        bb.order(ByteOrder.BIG_ENDIAN)
      } finally ch.close()
    }
    def size: Long = {
      val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
      try ch.size() finally ch.close()
    }
  }

  final case class NcFile(numRecs: Int, dims: Seq[NcDim], gatts: Seq[NcAtt],
      vars: Seq[NcVar], source: NcSource, version: Int) {
    def variable(name: String): NcVar = vars.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"variable '$name' not in file (have: ${vars.map(_.name).mkString(", ")})"))
  }

  private val NcByte = 1; private val NcChar = 2; private val NcShort = 3
  private val NcInt = 4; private val NcFloat = 5; private val NcDouble = 6

  private[sources] def typeSize(t: Int): Int = t match {
    case NcByte | NcChar => 1
    case NcShort => 2
    case NcInt | NcFloat => 4
    case NcDouble => 8
    case _ => throw new IllegalArgumentException(s"unsupported nc_type $t")
  }

  private def pad4(n: Int): Int = (n + 3) & ~3

  private val HeaderCap = 16L * 1024 * 1024

  /** Header parse: reads only the header region (≤16 MB — classic
    * headers are KB-scale), so opening a multi-GB year file to plan
    * partitions costs header-sized I/O. A header larger than the cap
    * fails with a diagnosable message, not a raw buffer overrun. */
  def open(path: String): NcFile =
    try openImpl(path)
    catch {
      case _: IndexOutOfBoundsException =>
        throw new IllegalArgumentException(
          s"NetCDF header exceeds the ${HeaderCap / (1024 * 1024)} MB parse cap: $path")
    }

  private def openImpl(path: String): NcFile = {
    val source = new NcSource(path)
    val bb = source.buffer(0, math.min(source.size, HeaderCap))
    // NetCDF-4 is an HDF5 container (signature \x89HDF\r\n\x1a\n) — out
    // of scope by decision (see README: no independent HDF5 fixture or
    // reference decoder exists in this build environment, so a reader
    // could only be validated against itself). Detect it specifically
    // and point at the one-time lossless conversion.
    val isHdf5 = bb.limit() >= 8 && (bb.get(0) & 0xff) == 0x89 &&
      bb.get(1) == 'H' && bb.get(2) == 'D' && bb.get(3) == 'F' &&
      bb.get(4) == 0x0d && bb.get(5) == 0x0a && (bb.get(6) & 0xff) == 0x1a && bb.get(7) == 0x0a
    require(!isHdf5,
      s"NetCDF-4/HDF5-backed file not supported: $path — convert once with " +
        "`nccopy -k classic in.nc out.nc` (or `ncks -3`, or xarray " +
        "to_netcdf(format=\"NETCDF3_64BIT\")); downstream processing is identical")
    require(bb.limit() > 4 && bb.get(0) == 'C' && bb.get(1) == 'D' && bb.get(2) == 'F',
      s"not a classic NetCDF file: $path")
    val version = bb.get(3).toInt // 1 = 32-bit offsets, 2 = 64-bit
    require(version == 1 || version == 2, s"unsupported CDF version $version (HDF5-based NetCDF-4 not in scope)")
    var off = 4
    val numRecs = bb.getInt(off); off += 4 // 0xFFFFFFFF (streaming) reads as -1

    def bytesAt(o: Int, len: Int): Array[Byte] = {
      val a = new Array[Byte](len)
      var i = 0
      while (i < len) { a(i) = bb.get(o + i); i += 1 }
      a
    }
    def readName(): String = {
      val len = bb.getInt(off); off += 4
      val s = new String(bytesAt(off, len), "UTF-8")
      off += pad4(len)
      s
    }
    def readAttValues(t: Int, n: Int): Any = {
      val v: Any = t match {
        case NcChar => new String(bytesAt(off, n), "UTF-8")
        case NcByte => Array.tabulate(n)(i => bb.get(off + i).toDouble)
        case NcShort => Array.tabulate(n)(i => bb.getShort(off + 2 * i).toDouble)
        case NcInt => Array.tabulate(n)(i => bb.getInt(off + 4 * i).toDouble)
        case NcFloat => Array.tabulate(n)(i => bb.getFloat(off + 4 * i).toDouble)
        case NcDouble => Array.tabulate(n)(i => bb.getDouble(off + 8 * i))
      }
      off += pad4(n * typeSize(t))
      v
    }
    def readAttList(): Seq[NcAtt] = {
      val tag = bb.getInt(off); val count = bb.getInt(off + 4); off += 8
      require(tag == 0x0C || (tag == 0 && count == 0), s"bad att_list tag $tag")
      (0 until count).map { _ =>
        val name = readName()
        val t = bb.getInt(off); off += 4
        val n = bb.getInt(off); off += 4
        NcAtt(name, readAttValues(t, n))
      }
    }

    // dim_list
    val dimTag = bb.getInt(off); val dimCount = bb.getInt(off + 4); off += 8
    require(dimTag == 0x0A || (dimTag == 0 && dimCount == 0), s"bad dim_list tag $dimTag")
    val dims = (0 until dimCount).map { _ =>
      val name = readName()
      val len = bb.getInt(off); off += 4
      NcDim(name, len)
    }
    val gatts = readAttList()
    // var_list
    val varTag = bb.getInt(off); val varCount = bb.getInt(off + 4); off += 8
    require(varTag == 0x0B || (varTag == 0 && varCount == 0), s"bad var_list tag $varTag")
    val vars = (0 until varCount).map { _ =>
      val name = readName()
      val ndims = bb.getInt(off); off += 4
      val dimIds = (0 until ndims).map { i => bb.getInt(off + 4 * i) }
      off += 4 * ndims
      val atts = readAttList()
      val t = bb.getInt(off); off += 4
      val vsize = bb.getInt(off); off += 4
      val begin = if (version == 1) { val b = bb.getInt(off).toLong; off += 4; b }
        else { val b = bb.getLong(off); off += 8; b }
      NcVar(name, dimIds, atts, t, vsize, begin)
    }
    // streaming sentinel (0xFFFFFFFF → -1): the spec says derive the
    // record count from the file size — without this a streaming-
    // written file would silently read as zero records
    val resolvedRecs =
      if (numRecs >= 0) numRecs
      else {
        val pre = NcFile(0, dims, gatts, vars, source, version)
        val recVars = vars.filter(_.dimIds.headOption.exists(dims(_).isRecord))
        require(recVars.nonEmpty, s"streaming numrecs but no record variables in $path")
        val first = recVars.map(_.begin).min
        val stride = recordStride(pre, recVars.head)
        ((source.size - first) / stride).toInt
      }
    NcFile(resolvedRecs, dims, gatts, vars, source, version)
  }

  /** Stride between record slabs (the interleaved record section). */
  def recordStride(nc: NcFile, v: NcVar): Long = {
    val recVars = nc.vars.filter(_.dimIds.headOption.exists(nc.dims(_).isRecord))
    if (recVars.size == 1) { // sole record var: unpadded stride
      val perSlab = v.dimIds.map(nc.dims(_)).filterNot(_.isRecord).map(_.length).product
      perSlab.toLong * typeSize(v.ncType)
    } else recVars.map(_.vsize.toLong).sum
  }

  /** Read one record slab (or the whole fixed-size variable when it has
    * no record dimension) as doubles, `_FillValue`→NaN, scale/offset
    * applied. Reads exactly the slab's byte range — long offsets, so
    * slabs anywhere in a multi-GB file are addressable. */
  def readSlab(nc: NcFile, v: NcVar, record: Int): Array[Double] = {
    val isRec = v.dimIds.headOption.exists(nc.dims(_).isRecord)
    val perSlab = v.dimIds.map(nc.dims(_)).filterNot(_.isRecord).map(_.length).product
    val ts = typeSize(v.ncType)
    val base = if (isRec) v.begin + record * recordStride(nc, v) else v.begin
    val bb = nc.source.buffer(base, perSlab.toLong * ts)
    val fill = v.numAtt("_FillValue")
    val scale = v.numAtt("scale_factor").getOrElse(1.0)
    val offset = v.numAtt("add_offset").getOrElse(0.0)
    val out = new Array[Double](perSlab)
    var i = 0
    while (i < perSlab) {
      val p = i * ts
      val raw = v.ncType match {
        case NcByte => bb.get(p).toDouble
        case NcShort => bb.getShort(p).toDouble
        case NcInt => bb.getInt(p).toDouble
        case NcFloat => bb.getFloat(p).toDouble
        case NcDouble => bb.getDouble(p)
        case t => throw new IllegalArgumentException(s"unsupported data nc_type $t")
      }
      out(i) =
        if (fill.exists(f => raw == f || raw.isNaN)) Double.NaN
        else raw * scale + offset
      i += 1
    }
    out
  }

  /** Read a variable's full data as doubles in row-major dim order. */
  def readValues(nc: NcFile, v: NcVar): Array[Double] = {
    val isRec = v.dimIds.headOption.exists(nc.dims(_).isRecord)
    val nRecs = if (isRec) nc.numRecs else 1
    (0 until nRecs).flatMap(r => readSlab(nc, v, r)).toArray
  }

  /** CF time decoding: "<days|hours|...|milliseconds> since <epoch>".
    * The unit word is matched on a word boundary — without it,
    * "milliseconds since ..." would silently match the "seconds"
    * alternative and decode every timestamp 1000× off. */
  private[sources] def decodeTime(values: Array[Double], units: String): Array[Timestamp] = {
    val m = "(?i)\\b(milliseconds|seconds|minutes|hours|days)\\s+since\\s+(\\d{4}-\\d{2}-\\d{2})([T ](\\d{2}:\\d{2}(:\\d{2})?))?".r
      .findFirstMatchIn(units)
      .getOrElse(throw new IllegalArgumentException(s"unsupported time units: '$units'"))
    val unitMs = m.group(1).toLowerCase match {
      case "days" => 86400000L
      case "hours" => 3600000L
      case "minutes" => 60000L
      case "seconds" => 1000L
      case "milliseconds" => 1L
    }
    val epoch = java.time.LocalDate.parse(m.group(2)).atStartOfDay
    val withTime = Option(m.group(4)).fold(epoch) { t =>
      val p = t.split(":"); epoch.plusSeconds(p(0).toLong * 3600 + p(1).toLong * 60 +
        (if (p.length > 2) p(2).toLong else 0L))
    }
    val epochMs = withTime.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    values.map(v => new Timestamp(epochMs + (v * unitMs).toLong))
  }

  /** Flatten a gridded `dataVar[time, lat, lon]` to the long-form rows
    * RainIngest consumes (Schemas.rainGrid) — the Spark-side equal of
    * the reference's `to_dataframe().reset_index()` (utils.py:77).
    * Fill values become nulls (dropped downstream by P4). Coordinate
    * variables are matched to the data variable's dims by name. */
  def readGrid(spark: SparkSession, path: String, dataVar: String = "precip",
      timeDim: String = "time", latDim: String = "latitude", lonDim: String = "longitude"): DataFrame = {
    val nc = open(path)
    val v = nc.variable(dataVar)
    val dimNames = v.dimIds.map(nc.dims(_).name)
    require(dimNames == Seq(timeDim, latDim, lonDim),
      s"expected $dataVar[$timeDim,$latDim,$lonDim], file has $dataVar[${dimNames.mkString(",")}]")
    val tv = nc.variable(timeDim)
    val times = decodeTime(readValues(nc, tv),
      tv.att("units").collect { case s: String => s }
        .getOrElse(throw new IllegalArgumentException(s"$timeDim has no units attribute")))
    val lats = readValues(nc, nc.variable(latDim))
    val lons = readValues(nc, nc.variable(lonDim))
    val data = readValues(nc, v)

    val rows = new ArrayBuffer[Row](data.length)
    var t = 0
    while (t < times.length) {
      var la = 0
      while (la < lats.length) {
        var lo = 0
        while (lo < lons.length) {
          val d = data(t * lats.length * lons.length + la * lons.length + lo)
          rows += Row(times(t), lats(la), lons(lo),
            if (d.isNaN) null else java.lang.Double.valueOf(d))
          lo += 1
        }
        la += 1
      }
      t += 1
    }
    spark.createDataFrame(java.util.Arrays.asList(rows.toSeq: _*), StructType(Seq(
      StructField("time", TimestampType),
      StructField("latitude", DoubleType),
      StructField("longitude", DoubleType),
      StructField("precip", DoubleType))))
  }
}
