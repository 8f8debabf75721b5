package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql.{columnOf, expressionOf}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL byte-level media header parsing — the multimodal operation a
  * curation pipeline actually runs at scan speed (drop images under
  * 64×64, bucket by aspect ratio) without ever decoding pixels. Unlike
  * the clearly-stubbed codec kernels in
  * [[graft.operators.Multimodal]], nothing here is a stand-in: these
  * are the published PNG (RFC 2083 IHDR), JPEG (ISO 10918 SOFn marker
  * scan) and GIF (87a/89a logical screen descriptor) layouts parsed
  * from the actual bytes.
  */
object MediaFunctions {

  /** (format, width, height) parsed from an image byte column; null
    * for unrecognized/truncated bytes. One compiled pass, no codecs. */
  def imageDims(c: Column): Column = columnOf(ImageDims(expressionOf(c)))

  /** (channels, sample_rate, bits, n_samples) parsed from a WAV/RIFF
    * byte column; null for non-WAV/truncated bytes. */
  def wavMeta(c: Column): Column = columnOf(WavMeta(expressionOf(c)))

  /** (timescale, duration) from an MP4/ISO-BMFF moov/mvhd box; null
    * for non-MP4/truncated bytes. Seconds = duration / timescale. */
  def mp4Meta(c: Column): Column = columnOf(Mp4Meta(expressionOf(c)))
}

/** Parse MP4/ISO-BMFF movie metadata from the container bytes: scan
  * the top-level boxes ([u32be size][4-byte type], size 1 → u64
  * largesize) to `moov`, scan its children to `mvhd`, and read
  * timescale/duration (version 0: u32s; version 1: u64 duration) —
  * enough for the duration/fps gating a video curation pass runs
  * without touching a codec. */
case class Mp4Meta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("timescale", LongType, nullable = false),
    StructField("duration", LongType, nullable = false)))

  override def nullable: Boolean = true

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s(0).toByte && b(i + 1) == s(1).toByte &&
      b(i + 2) == s(2).toByte && b(i + 3) == s(3).toByte

  /** (payloadStart, boxEnd) of the box headed at `i`, or null. */
  private def box(b: Array[Byte], i: Int, limit: Long): Option[(Int, Long)] = {
    if (i + 8 > limit) return None
    val size32 = be32(b, i)
    if (size32 == 1) {
      if (i + 16 > limit) None else Some((i + 16, i + be64(b, i + 8)))
    } else Some((i + 8, i + size32))
  }

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    var i = 0
    while (i + 8 <= b.length) {
      val (payload, end) = box(b, i, b.length).getOrElse(return null)
      if (tag(b, i + 4, "moov")) {
        var j = payload
        while (j + 8 <= end && j + 8 <= b.length) {
          val (p2, e2) = box(b, j, math.min(end, b.length)).getOrElse(return null)
          if (tag(b, j + 4, "mvhd") && p2 + 4 <= b.length) {
            val version = u8(b, p2)
            // version+flags (4), then ctime/mtime (2×4 or 2×8),
            // timescale u32, duration u32 (v0) / u64 (v1)
            return version match {
              case 0 if p2 + 20 <= b.length =>
                InternalRow(be32(b, p2 + 12), be32(b, p2 + 16))
              case 1 if p2 + 32 <= b.length =>
                InternalRow(be32(b, p2 + 20), be64(b, p2 + 24))
              case _ => null
            }
          }
          if (e2 <= j) return null // malformed zero-size box
          j = e2.toInt
        }
        return null
      }
      if (end <= i) return null
      i = end.toInt
    }
    null
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Parse WAV (RIFF/WAVE) audio metadata from the container bytes: the
  * "fmt " chunk carries channels (u16le), sample rate (u32le) and bit
  * depth (u16le); the "data" chunk's size over the block align gives
  * the sample-frame count (duration = n_samples / sample_rate). Chunks
  * are scanned generically by id+size, so LIST/INFO chunks before
  * "data" are skipped like any real file's. */
case class WavMeta(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false)))

  override def nullable: Boolean = true

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s(0).toByte && b(i + 1) == s(1).toByte &&
      b(i + 2) == s(2).toByte && b(i + 3) == s(3).toByte

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var i = 12
    var channels = -1; var rate = -1; var bits = -1; var blockAlign = -1
    var dataSize = -1L
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (tag(b, i, "fmt ") && i + 24 <= b.length) {
        channels = le16(b, i + 10)
        rate = le32(b, i + 12).toInt
        blockAlign = le16(b, i + 20)
        bits = le16(b, i + 22)
      } else if (tag(b, i, "data")) {
        dataSize = size
      }
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (channels <= 0 || rate <= 0 || blockAlign <= 0 || dataSize < 0) return null
    InternalRow(channels, rate, bits, dataSize / blockAlign)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Parse image dimensions from raw encoded bytes:
  *  - PNG:  8-byte signature, then the IHDR chunk carries width/height
  *    as big-endian u32 at offsets 16/20.
  *  - JPEG: scan FF-marker segments from offset 2, skipping each by its
  *    big-endian length, until a SOFn frame header (C0–CF except
  *    C4/C8/CC); height/width are big-endian u16 after the precision
  *    byte.
  *  - GIF:  "GIF87a"/"GIF89a", then little-endian u16 width/height.
  * Returns struct(format, width, height) or null. */
case class ImageDims(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private def result(fmt: String, w: Long, h: Long): InternalRow =
    InternalRow(UTF8String.fromString(fmt), w.toInt, h.toInt)

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    // PNG: 89 50 4E 47 0D 0A 1A 0A | len | "IHDR" | w u32be | h u32be
    if (b.length >= 24 && u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return result("png", be32(b, 16), be32(b, 20))
    // GIF: "GIF87a" / "GIF89a" | w u16le | h u16le
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return result("gif", le16(b, 6), le16(b, 8))
    // JPEG: FF D8, then FF-marker segments; SOFn carries the frame size
    if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(b, i) != 0xff) return null // desynchronized stream
        val m = u8(b, i + 1)
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01 || m == 0xff) {
          i += 2 // standalone marker (no length field)
        } else if ((m >= 0xc0 && m <= 0xcf) && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          // SOFn: len u16 | precision u8 | height u16be | width u16be
          if (i + 8 < b.length)
            return result("jpeg", be16(b, i + 7), be16(b, i + 5))
          return null
        } else {
          i += 2 + be16(b, i + 2) // skip segment: length includes itself
        }
      }
      return null
    }
    null
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
