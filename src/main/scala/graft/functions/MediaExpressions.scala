package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** JPEG header walk — the real decode step behind
  * [[graft.multimodal.Multimodal.decodeDims]].
  *
  * JPEG stores image dimensions inside a Start-Of-Frame segment at a
  * variable offset (APPn/COM/DQT/... segments of arbitrary length come
  * first), so unlike PNG's fixed-offset IHDR it cannot be parsed with
  * substring arithmetic alone: the segment chain must be WALKED —
  * marker, 2-byte big-endian length, skip, repeat — until a SOFn marker.
  * That walk is a primitive loop per row, so it lives in a native
  * codegen'd Catalyst expression (one branchy scan over the header
  * bytes, no allocation) rather than a UDF.
  */
object MediaUtil {
  /** Walks the JPEG segment chain of `b` and returns the SOFn frame
    * dimensions packed as `(height << 16) | width`, or -1 when `b` is
    * not a JPEG / has no SOF before SOS/EOI / is truncated. Packing into
    * one long keeps the expression's codegen a primitive (the
    * width/height split is plain column bit-arithmetic on top). */
  def jpegDimsPacked(b: Array[Byte]): Long = {
    val n = b.length
    if (n < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return -1L
    var i = 2
    while (i + 3 < n) {
      if ((b(i) & 0xFF) != 0xFF) return -1L
      // 0xFF fill bytes before a marker are legal padding.
      while (i + 1 < n && (b(i + 1) & 0xFF) == 0xFF) i += 1
      if (i + 3 >= n) return -1L
      val marker = b(i + 1) & 0xFF
      if (marker >= 0xC0 && marker <= 0xCF &&
        marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
        // SOFn: len(2) precision(1) height(2) width(2) ...
        if (i + 8 >= n) return -1L
        val h = ((b(i + 5) & 0xFF) << 8) | (b(i + 6) & 0xFF)
        val w = ((b(i + 7) & 0xFF) << 8) | (b(i + 8) & 0xFF)
        return (h.toLong << 16) | w.toLong
      } else if (marker == 0xD8 || marker == 0x01 ||
        (marker >= 0xD0 && marker <= 0xD7)) {
        i += 2 // standalone markers carry no length field
      } else if (marker == 0xD9 || marker == 0xDA) {
        return -1L // EOI / start-of-scan before any SOF: no dims
      } else {
        val len = ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
        if (len < 2) return -1L // corrupt length would loop forever
        i += 2 + len
      }
    }
    -1L
  }
}

object Mp4Util {
  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)

  private def is4cc(b: Array[Byte], i: Int, cc: String): Boolean =
    b(i) == cc.charAt(0).toByte && b(i + 1) == cc.charAt(1).toByte &&
      b(i + 2) == cc.charAt(2).toByte && b(i + 3) == cc.charAt(3).toByte

  /** Walks the ISO-BMFF (MP4) box tree of `b` and returns
    * [width, height, duration_ms, n_tracks], or null when the bytes
    * carry no `ftyp` leader or no `moov` with an mvhd. Width/height
    * come from the FIRST trak whose tkhd has nonzero 16.16 dimensions
    * (the video track; audio traks carry zeros); duration_ms =
    * mvhd duration * 1000 / timescale. Boxes are walked by their size
    * fields — `free`/`skip`/unknown boxes of any length are stepped
    * over, so the layout is NOT assumed fixed. Version-1 (64-bit)
    * mvhd/tkhd are out of scope (null), as are 64-bit box sizes. */
  def mp4Meta(b: Array[Byte]): Array[Long] = {
    val n = b.length
    if (n < 16 || !is4cc(b, 4, "ftyp")) return null
    var w = -1L; var h = -1L; var durMs = -1L; var tracks = 0L
    // Every size is validated against the REMAINING bytes before the
    // walk steps: a 32-bit size past the buffer (corrupt, or the
    // 0xFFFFFFF8 wrap that would turn .toInt negative and walk
    // BACKWARDS forever) is corrupt metadata -> null, never a hang.
    var i = 0
    while (i + 8 <= n) {
      val size = u32(b, i)
      if (size < 8 || size > n - i) return null
      if (is4cc(b, i + 4, "moov")) {
        val end = i + size.toInt
        var j = i + 8
        while (j + 8 <= end) {
          val bs = u32(b, j)
          if (bs < 8 || bs > end - j) return null
          if (is4cc(b, j + 4, "mvhd")) {
            // bounds BEFORE the version-byte read; v1 (64-bit) headers
            // are out of scope -> null, per the contract.
            if (j + 32 > end || b(j + 8) != 0) return null
            val timescale = u32(b, j + 20)
            val duration = u32(b, j + 24)
            if (timescale > 0) durMs = duration * 1000L / timescale
          } else if (is4cc(b, j + 4, "trak")) {
            tracks += 1
            val tend = j + bs.toInt
            var k = j + 8
            while (k + 8 <= tend) {
              val ts = u32(b, k)
              if (ts < 8 || ts > tend - k) return null
              if (is4cc(b, k + 4, "tkhd")) {
                // A v1 or truncated tkhd is corrupt-for-us, not
                // silently-dimensionless (keeps mvhd/tkhd consistent).
                if (k + 92 > tend || b(k + 8) != 0) return null
                val tw = u32(b, k + 84) >> 16 // 16.16 fixed
                val th = u32(b, k + 88) >> 16
                if (tw > 0 && th > 0 && w < 0) { w = tw; h = th }
              }
              k += ts.toInt
            }
          }
          j += bs.toInt
        }
        return if (durMs < 0) null
          else Array(math.max(w, 0), math.max(h, 0), durMs, tracks)
      }
      i += size.toInt
    }
    null
  }

  /** Row-shaped wrapper called from generated code. Lives HERE (an
    * object with no companion class) so scalac emits a true static
    * forwarder — a method named `eval` on the [[Mp4Meta]] companion
    * gets NO forwarder because it collides with `Expression.eval`,
    * and Janino then fails to resolve the call, silently dropping the
    * stage to interpreted execution. */
  def evalRow(b: Array[Byte]): InternalRow = {
    val m = mp4Meta(b)
    if (m == null) null
    else new GenericInternalRow(Array[Any](m(0), m(1), m(2), m(3)))
  }
}

object WavUtil {
  private[functions] def u16le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8)

  private[functions] def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  private[functions] def is4cc(b: Array[Byte], i: Int, cc: String): Boolean =
    b(i) == cc.charAt(0).toByte && b(i + 1) == cc.charAt(1).toByte &&
      b(i + 2) == cc.charAt(2).toByte && b(i + 3) == cc.charAt(3).toByte

  /** Walks the RIFF/WAVE chunk list and returns
    * [channels, sample_rate, bits_per_sample, duration_ms], or null
    * without a RIFF/WAVE leader or an fmt chunk. duration_ms is the
    * DECLARED data-chunk size scaled by the fmt byte rate (-1 when
    * either is absent/zero, surfaced as null by the expression; a
    * truncated tail still yields the declared duration — this is
    * header metadata, not a payload integrity check). Chunks are
    * walked by their size fields (word-aligned per RIFF), so LIST/fact
    * or any unknown chunks of any length are stepped over; the walk
    * always advances >= 8 bytes, so corrupt sizes cannot loop. */
  def wavMeta(b: Array[Byte]): Array[Long] = {
    val n = b.length
    if (n < 12 || !is4cc(b, 0, "RIFF") || !is4cc(b, 8, "WAVE")) return null
    var channels = -1L; var rate = -1L; var bits = -1L
    var byteRate = -1L; var dataBytes = -1L
    var i = 12
    while (i + 8 <= n) {
      val size = u32le(b, i + 4)
      // A valid PCM fmt chunk declares >= 16 bytes; a shorter declared
      // size means the fields below would be read from the NEXT chunk's
      // bytes — treat as corrupt and skip rather than parse garbage.
      if (is4cc(b, i, "fmt ") && size >= 16 && i + 24 <= n) {
        channels = u16le(b, i + 10)
        rate = u32le(b, i + 12)
        byteRate = u32le(b, i + 16)
        bits = u16le(b, i + 22)
      } else if (is4cc(b, i, "data")) {
        dataBytes = size
      }
      // RIFF chunks are word-aligned: odd sizes carry a pad byte.
      val step = 8 + size + (size & 1L)
      if (i + step > Int.MaxValue) return finish(channels, rate, bits, byteRate, dataBytes)
      i += step.toInt
    }
    finish(channels, rate, bits, byteRate, dataBytes)
  }

  private def finish(channels: Long, rate: Long, bits: Long,
                     byteRate: Long, dataBytes: Long): Array[Long] =
    if (channels < 0) null
    else Array(channels, rate, bits,
      if (byteRate > 0 && dataBytes >= 0) dataBytes * 1000L / byteRate else -1L)

  /** Row-shaped wrapper called from generated code — see
    * [[Mp4Util.evalRow]] for why it must NOT live on the [[WavMeta]]
    * companion (no static forwarder for a name colliding with
    * `Expression.eval`). */
  def evalRow(b: Array[Byte]): InternalRow = {
    val m = wavMeta(b)
    if (m == null) null
    else new GenericInternalRow(Array[Any](
      m(0), m(1), m(2), if (m(3) < 0) null else m(3)))
  }
}

/** `(height << 16) | width` of a JPEG binary column, null when no SOF
  * frame header is found. */
case class JpegDimsPacked(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(bin: Any): Any = {
    val packed = MediaUtil.jpegDimsPacked(bin.asInstanceOf[Array[Byte]])
    if (packed < 0) null else packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MediaUtil.jpegDimsPacked($c);
      if (${ev.value} < 0L) { ${ev.isNull} = true; ${ev.value} = 0L; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ISO-BMFF (MP4) metadata: struct<width, height, duration_ms,
  * n_tracks>, null for non-MP4 bytes. Same narrow codegen'd walk shape
  * as [[JpegDimsPacked]] — a 100 TB video-container table streams
  * scan → walk → project, no shuffle, no codec. */
case class Mp4Meta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = Mp4Meta.schema
  override def nullable: Boolean = true

  override def nullSafeEval(bin: Any): Any =
    Mp4Util.evalRow(bin.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Mp4Util.evalRow($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mp4Meta {
  val schema: StructType = StructType(Seq(
    StructField("width", LongType), StructField("height", LongType),
    StructField("duration_ms", LongType), StructField("n_tracks", LongType)))
}

/** RIFF/WAVE metadata: struct<channels, sample_rate, bits,
  * duration_ms>, null for non-WAV bytes; duration_ms is null when the
  * fmt byte rate or data chunk is absent. */
case class WavMeta(child: Expression) extends UnaryExpression {
  override def dataType: DataType = WavMeta.schema
  override def nullable: Boolean = true

  override def nullSafeEval(bin: Any): Any =
    WavUtil.evalRow(bin.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WavUtil.evalRow($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavMeta {
  val schema: StructType = StructType(Seq(
    StructField("channels", LongType), StructField("sample_rate", LongType),
    StructField("bits", LongType), StructField("duration_ms", LongType)))
}

object WavPcmUtil {
  import WavUtil.{is4cc, u16le, u32le}

  /** Decodes the PCM payload of a RIFF/WAVE buffer and returns one
    * [channel, n_frames, sum, peak] row per channel, or null when the
    * bytes are not a PCM WAV (no RIFF/WAVE leader, no valid fmt chunk,
    * non-PCM format tag, or bits outside 8/16/24/32). Samples are
    * little-endian signed (8-bit: unsigned, centered by -128, per the
    * WAV convention); `sum` is the exact integer sample sum and `peak`
    * the max absolute sample — the two stats that pin a decode
    * byte-exactly without any float accumulation order to disagree
    * over. Only COMPLETE frames are decoded (a truncated tail frame is
    * ignored); the data chunk is bounded by both its declared size and
    * the physical buffer, so a lying header cannot over-read. */
  def pcmStats(b: Array[Byte]): Array[Array[Long]] = {
    val n = b.length
    if (n < 12 || !is4cc(b, 0, "RIFF") || !is4cc(b, 8, "WAVE")) return null
    var channels = -1; var bits = -1; var fmtTag = -1
    var dataOff = -1; var dataLen = -1L
    var i = 12
    while (i + 8 <= n) {
      val size = u32le(b, i + 4)
      if (is4cc(b, i, "fmt ") && size >= 16 && i + 24 <= n) {
        fmtTag = u16le(b, i + 8).toInt
        channels = u16le(b, i + 10).toInt
        bits = u16le(b, i + 22).toInt
      } else if (is4cc(b, i, "data") && dataOff < 0) {
        dataOff = i + 8
        dataLen = size
      }
      val step = 8 + size + (size & 1L)
      if (i + step > Int.MaxValue) return stats(b, channels, bits, fmtTag, dataOff, dataLen)
      i += step.toInt
    }
    stats(b, channels, bits, fmtTag, dataOff, dataLen)
  }

  private def stats(b: Array[Byte], channels: Int, bits: Int, fmtTag: Int,
                    dataOff: Int, dataLen: Long): Array[Array[Long]] = {
    if (fmtTag != 1 || channels < 1 || channels > 64 ||
      !(bits == 8 || bits == 16 || bits == 24 || bits == 32) ||
      dataOff < 0) return null
    val bytesPer = bits / 8
    val blockAlign = channels * bytesPer
    val avail = math.min(dataLen, (b.length - dataOff).toLong)
    val frames = (avail / blockAlign).toInt
    val sums = new Array[Long](channels)
    val peaks = new Array[Long](channels)
    var f = 0
    while (f < frames) {
      var c = 0
      while (c < channels) {
        val o = dataOff + f * blockAlign + c * bytesPer
        val v: Long = bytesPer match {
          case 1 => (b(o) & 0xFF) - 128L
          case 2 => ((b(o) & 0xFF) | (b(o + 1) << 8)).toShort.toLong
          case 3 =>
            val u = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16)
            if (u >= 0x800000) u - 0x1000000 else u.toLong
          case _ =>
            ((b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
              ((b(o + 2) & 0xFF) << 16) | (b(o + 3) << 24)).toLong
        }
        sums(c) += v
        val a = math.abs(v)
        if (a > peaks(c)) peaks(c) = a
        c += 1
      }
      f += 1
    }
    Array.tabulate(channels)(c => Array(c.toLong, frames.toLong, sums(c), peaks(c)))
  }

  /** ArrayData-shaped wrapper called from generated code — see
    * [[Mp4Util.evalRow]] for the static-forwarder constraint. */
  def evalStats(b: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val m = pcmStats(b)
    if (m == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      m.map(r => new GenericInternalRow(Array[Any](r(0), r(1), r(2), r(3)))
        : Any))
  }
}

/** Per-channel PCM sample statistics of a WAV binary column:
  * array<struct<channel, n_frames, sum_raw, peak_raw>>, null for
  * non-PCM-WAV bytes — the REAL sample-decode step (the metadata walk
  * is [[WavMeta]]); same scan → decode → project shape, no codec
  * library, no shuffle. */
case class WavPcmStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = WavPcmStats.schema
  override def nullable: Boolean = true

  override def nullSafeEval(bin: Any): Any =
    WavPcmUtil.evalStats(bin.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WavPcmUtil.evalStats($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavPcmStats {
  val schema: DataType = org.apache.spark.sql.types.ArrayType(StructType(Seq(
    StructField("channel", LongType), StructField("n_frames", LongType),
    StructField("sum_raw", LongType), StructField("peak_raw", LongType))))
}

object MediaFunctions {
  def jpegDimsPacked(bin: Column): Column =
    GraftShim.column(JpegDimsPacked(GraftShim.expression(bin)))

  def mp4Meta(bin: Column): Column =
    GraftShim.column(Mp4Meta(GraftShim.expression(bin)))

  def wavMeta(bin: Column): Column =
    GraftShim.column(WavMeta(GraftShim.expression(bin)))

  def wavPcmStats(bin: Column): Column =
    GraftShim.column(WavPcmStats(GraftShim.expression(bin)))
}
