package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{CRC32, Deflater}

/** Real (JDK-only) media container codecs: minimal WRITERS that emit
  * valid BMP / PNG / WAV / AVI files, and header PARSERS that recover
  * dimensions/duration from the raw bytes — the metadata-extraction
  * step a training-data pipeline runs over binary media columns.
  *
  * Parsing reads container headers only (no pixel/sample decode): at
  * 100 TB you sniff dimensions from the first KB of a blob, you never
  * decompress it. The writers exist so fixtures and the gate query use
  * REAL bytes — every generated file round-trips through the JDK's own
  * independent decoders (`javax.imageio`, `javax.sound.sampled`) in
  * MultimodalSpec, proving both sides against a reference
  * implementation.
  *
  * Format references (public specs): BMP BITMAPFILEHEADER/
  * BITMAPINFOHEADER layout; PNG RFC 2083 (signature, IHDR, CRC-32);
  * WAV/AVI = RIFF chunks (fmt/data, hdrl/avih).
  */
object MediaCodec {

  /** Parsed container metadata. `width`/`height` are 0 for pure audio;
    * `durationMs` is 0 for still images. */
  final case class Decoded(format: String, width: Int, height: Int, durationMs: Long)

  // ---------------------------------------------------------------- writers

  /** 24-bit uncompressed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER),
    * zero-filled pixels, 4-byte-aligned rows. */
  def bmp(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bmp dims $width x $height")
    val rowSize = ((3 * width + 3) / 4) * 4
    val imageSize = rowSize * height
    val fileSize = 54 + imageSize
    val b = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54) // reserved, pixel-data offset
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(imageSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    b.array() // remaining pixel bytes stay zero
  }

  private def crcChunk(out: ByteArrayOutputStream, chunkType: String, data: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(4).putInt(data.length).array()
    out.write(len, 0, 4)
    val typeBytes = chunkType.getBytes("US-ASCII")
    out.write(typeBytes, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32
    crc.update(typeBytes)
    crc.update(data)
    out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array(), 0, 4)
  }

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Valid 8-bit grayscale PNG: signature + IHDR + one zlib-deflated
    * IDAT of zero scanlines + IEND, with correct CRC-32s throughout. */
  def png(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0, s"png dims $width x $height")
    val out = new ByteArrayOutputStream()
    out.write(PngSig, 0, 8)
    val ihdr = ByteBuffer.allocate(13).putInt(width).putInt(height)
      .put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte).array()
    crcChunk(out, "IHDR", ihdr)
    // raw image stream: per scanline a filter byte (0) + `width` zero samples
    val raw = new Array[Byte](height * (width + 1))
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val zbuf = new ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    crcChunk(out, "IDAT", zbuf.toByteArray)
    crcChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** PCM WAV (RIFF/WAVE fmt+data) of silence. `durationMs` must land on
    * a whole byte count: with the 8 kHz / 16-bit / mono default any
    * whole millisecond does (byteRate 16000 = 16 bytes per ms). */
  def wav(durationMs: Int, sampleRate: Int = 8000, channels: Int = 1,
      bitsPerSample: Int = 16): Array[Byte] = {
    require(durationMs >= 0, s"wav duration $durationMs")
    val byteRate = sampleRate * channels * bitsPerSample / 8
    val dataLen = (durationMs.toLong * byteRate / 1000).toInt
    require(dataLen.toLong * 1000 == durationMs.toLong * byteRate,
      s"duration $durationMs ms not byte-aligned at byteRate $byteRate")
    val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort).putInt(sampleRate).putInt(byteRate)
      .putShort((channels * bitsPerSample / 8).toShort).putShort(bitsPerSample.toShort)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    b.array() // silence: data bytes stay zero
  }

  /** Minimal RIFF/AVI: LIST hdrl with the 56-byte `avih` main header
    * (frame period, total frames, dimensions) + an empty LIST movi.
    * Duration = microSecPerFrame × frames. */
  def avi(width: Int, height: Int, frames: Int, microSecPerFrame: Int = 40000): Array[Byte] = {
    require(width > 0 && height > 0 && frames >= 0, s"avi $width x $height x $frames")
    // layout: RIFF(4+4+4) 'AVI ' | LIST(12) 'hdrl' avih(8+56) | LIST(12) 'movi'
    val hdrlSize = 4 + 8 + 56 // 'hdrl' + avih chunk
    val moviSize = 4          // 'movi'
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val b = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(riffSize).put("AVI ".getBytes("US-ASCII"))
    b.put("LIST".getBytes("US-ASCII")).putInt(hdrlSize).put("hdrl".getBytes("US-ASCII"))
    b.put("avih".getBytes("US-ASCII")).putInt(56)
    b.putInt(microSecPerFrame).putInt(0).putInt(0).putInt(0) // period, maxBytesPerSec, padding, flags
    b.putInt(frames).putInt(0).putInt(1).putInt(0)           // totalFrames, initialFrames, streams, bufSize
    b.putInt(width).putInt(height)
    b.putInt(0).putInt(0).putInt(0).putInt(0)                // dwReserved[4]
    b.put("LIST".getBytes("US-ASCII")).putInt(moviSize).put("movi".getBytes("US-ASCII"))
    b.array()
  }

  // ---------------------------------------------------------------- parsers

  private def u16le(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8)
  private def i32le(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8) | ((a(off + 2) & 0xff) << 16) | ((a(off + 3) & 0xff) << 24)
  private def i32be(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xff) << 24) | ((a(off + 1) & 0xff) << 16) | ((a(off + 2) & 0xff) << 8) | (a(off + 3) & 0xff)
  private def fourcc(a: Array[Byte], off: Int): String =
    new String(a, off, 4, "US-ASCII")

  /** Sniff the container by magic bytes and parse its header. `None`
    * for unrecognized or truncated payloads — the quarantine signal a
    * pipeline routes to a dead-letter sink rather than failing the
    * whole partition. */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < 12) return None
    if (bytes.take(8).sameElements(PngSig)) parsePng(bytes)
    else if (bytes(0) == 'B' && bytes(1) == 'M') parseBmp(bytes)
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8') parseGif(bytes)
    else if (fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "WAVE") parseWav(bytes)
    else if (fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI ") parseAvi(bytes)
    else None
  }

  private def parsePng(a: Array[Byte]): Option[Decoded] =
    if (a.length < 24 || fourcc(a, 12) != "IHDR") None
    else Some(Decoded("png", i32be(a, 16), i32be(a, 20), 0L))

  private def parseBmp(a: Array[Byte]): Option[Decoded] =
    if (a.length < 26) None
    // height may be negative (top-down DIB) — magnitude is the dimension
    else Some(Decoded("bmp", i32le(a, 18), math.abs(i32le(a, 22)), 0L))

  private def parseGif(a: Array[Byte]): Option[Decoded] =
    if (a.length < 10) None
    else Some(Decoded("gif", u16le(a, 6), u16le(a, 8), 0L))

  /** Walk RIFF sub-chunks from offset 12: `fmt ` gives the byte rate,
    * `data` the payload size; duration = dataLen / byteRate. */
  private def parseWav(a: Array[Byte]): Option[Decoded] = {
    var off = 12
    var byteRate = -1
    var dataLen = -1L
    while (off + 8 <= a.length && (byteRate < 0 || dataLen < 0)) {
      val id = fourcc(a, off)
      val size = i32le(a, off + 4)
      if (id == "fmt " && off + 16 <= a.length) byteRate = i32le(a, off + 16)
      if (id == "data") dataLen = size.toLong & 0xffffffffL
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (byteRate <= 0 || dataLen < 0) None
    else Some(Decoded("wav", 0, 0, dataLen * 1000L / byteRate))
  }

  /** Find LIST/hdrl → avih: frame period (µs), frame count, dims. */
  private def parseAvi(a: Array[Byte]): Option[Decoded] = {
    var off = 12
    while (off + 12 <= a.length) {
      val id = fourcc(a, off)
      val size = i32le(a, off + 4)
      if (id == "LIST" && fourcc(a, off + 8) == "hdrl") {
        val avihOff = off + 12
        if (avihOff + 8 + 40 <= a.length && fourcc(a, avihOff) == "avih") {
          val h = avihOff + 8
          val microPerFrame = i32le(a, h).toLong & 0xffffffffL
          val frames = i32le(a, h + 16).toLong & 0xffffffffL
          return Some(Decoded("avi", i32le(a, h + 32), i32le(a, h + 36),
            microPerFrame * frames / 1000L))
        }
      }
      off += 8 + size + (size & 1)
    }
    None
  }
}
