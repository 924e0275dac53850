package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.MediaFunctions

/** Multimodal columns (builder-prompt extension): media as opaque
  * `binary` columns with typed metadata, plus byte-level operators —
  * magic-byte format sniffing, REAL header-parse dimension decode,
  * frame/window sampling, content hashing.
  *
  * Dimension decode is real: PNG width/height are read from the IHDR
  * chunk (always bytes 17-24 of a valid file, so pure
  * substring/hex/conv column arithmetic suffices) and JPEG width/height
  * from the SOFn frame header found by walking the segment chain (a
  * native codegen'd expression, [[graft.functions.JpegDimsPacked]],
  * because SOF sits at a variable offset behind APPn/COM/DQT segments).
  * PIXEL decode is real too: [[decodeResize]] runs the JDK's own
  * ImageIO codecs (no external library) to decode, downsample and
  * summarize — video frame RASTERIZING alone stays out of scope (no
  * video codec ships with the JDK). All operators are narrow per-row
  * projections over BinaryType: a 100 TB media table streams through
  * scan → decode → project, no shuffle.
  */
object Multimodal {

  // Header layout constants, shared verbatim with the DuckDB oracle SQL
  // (queries/CorpusQueries) so both engines construct identical bytes.
  /** 8-byte PNG signature. */
  val PngSigHex = "89504e470d0a1a0a"
  /** IHDR chunk length (13) + "IHDR" tag — the bytes between the PNG
    * signature and the big-endian width. */
  val PngPreDimsHex = "0000000d" + "49484452"
  /** bit depth 8, color type 6 (RGBA), compression 0, filter 0,
    * interlace 0, then a placeholder CRC. */
  val PngPostDimsHex = "0806000000" + "00000000"
  /** SOI + APP0 marker; the 2-byte APP0 length follows. */
  val JpegSoiApp0Hex = "ffd8" + "ffe0"
  /** JFIF identifier, version 1.1, aspect-ratio units, 1x1 density, no
    * thumbnail — the standard 14-byte APP0 body (optionally padded). */
  val JfifBodyHex = "4a46494600" + "0101" + "00" + "0001" + "0001" + "00" + "00"
  /** SOF0 marker, segment length 17, precision 8; big-endian HEIGHT then
    * WIDTH follow. */
  val SofPreDimsHex = "ffc0" + "0011" + "08"
  /** 3 components: Y 2x2 sampling qtable 0, Cb/Cr 1x1 qtable 1. */
  val SofPostDimsHex = "03" + "012200" + "021101" + "031101"

  /** Big-endian hex of a numeric column, left-padded to `bytes` bytes. */
  private def beHex(v: Column, bytes: Int): Column =
    lpad(lower(hex(v)), bytes * 2, "0")

  /** Little-endian hex (RIFF/WAVE's byte order): the big-endian hex
    * with its byte pairs reversed. */
  private def leHex(v: Column, bytes: Int): Column = {
    val be = beHex(v, bytes)
    concat((bytes - 1 to 0 by -1).map(i => substring(be, i * 2 + 1, 2)): _*)
  }

  /** Deterministic fake media bytes with STRUCTURALLY VALID headers: a
    * real PNG signature + IHDR chunk, or a real JPEG SOI + JFIF APP0
    * (variable-length — padded by `id % 8` bytes so the decoder's
    * segment walk is actually exercised) + SOF0 frame header, or no
    * header at all; payload bytes follow. Width is `id % 640 + 1`,
    * height `id % 480 + 1` — but they are EMBEDDED in the header bytes
    * and [[decodeDims]] must recover them from there. */
  def fakeMedia(payload: Column, id: Column): Column = {
    val w = id % 640 + 1
    val h = id % 480 + 1
    val pngHeader = concat(
      lit(PngSigHex + PngPreDimsHex), beHex(w, 4), beHex(h, 4), lit(PngPostDimsHex))
    val pad = id % 8 // APP0 padding bytes: SOF0's offset varies per row
    val jpegHeader = concat(
      lit(JpegSoiApp0Hex), beHex(pad + 16, 2), lit(JfifBodyHex),
      lit("0" * 14).substr(lit(1), (pad * 2).cast("int")),
      lit(SofPreDimsHex), beHex(h, 2), beHex(w, 2), lit(SofPostDimsHex))
    when(id % 3 === 0, concat(unhex(pngHeader), payload.cast("binary")))
      .when(id % 3 === 1, concat(unhex(jpegHeader), payload.cast("binary")))
      .otherwise(payload.cast("binary"))
  }

  /** Magic-byte container sniff: full 8-byte PNG signature, or the JPEG
    * SOI marker (any JPEG flavor — JFIF, EXIF, raw-DQT). */
  def sniffFormat(bin: Column): Column =
    when(lower(hex(substring(bin, 1, 8))) === PngSigHex, lit("png"))
      .when(lower(hex(substring(bin, 1, 2))) === "ffd8", lit("jpeg"))
      .otherwise(lit("unknown"))

  /** Byte length of the media content. */
  def nBytes(bin: Column): Column = length(bin).cast("long")

  /** REAL dimension decode from the header bytes:
    *  - PNG: IHDR is mandated to be the first chunk, so width/height are
    *    the big-endian u32s at bytes 17-24 — parsed with
    *    substring+hex+conv column arithmetic (whole-stage codegen, no
    *    custom expression needed);
    *  - JPEG: SOFn is found by walking the segment chain (native
    *    expression, one pass over the header bytes per row);
    *  - anything else (or a JPEG with no SOF): null dims.
    * Returns struct<width: long, height: long>. */
  def decodeDims(bin: Column): Column = {
    val isPng = lower(hex(substring(bin, 1, 8))) === PngSigHex &&
      lower(hex(substring(bin, 13, 4))) === "49484452"
    val isJpeg = lower(hex(substring(bin, 1, 2))) === "ffd8"
    val pngW = conv(hex(substring(bin, 17, 4)), 16, 10).cast("long")
    val pngH = conv(hex(substring(bin, 21, 4)), 16, 10).cast("long")
    val packed = MediaFunctions.jpegDimsPacked(bin)
    val nullDim = lit(null).cast("long")
    when(isPng, struct(pngW.as("width"), pngH.as("height")))
      .when(isJpeg, struct(
        packed.bitwiseAND(lit(0xFFFFL)).as("width"),
        shiftright(packed, 16).as("height")))
      .otherwise(struct(nullDim.as("width"), nullDim.as("height")))
  }

  /** Frame/window sampling: k fixed-size byte windows at a fixed stride,
    * hex-encoded (cross-engine-comparable). Windows past the end truncate
    * like any substring. */
  def frameWindows(bin: Column, k: Int, windowBytes: Int, strideBytes: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      lower(hex(bin.substr(i * strideBytes + 1, lit(windowBytes)))))

  // ---- Audio/video containers (ISO-BMFF + RIFF/WAVE) ----------------

  /** 16-byte `ftyp` leader (isom, minor 0x200). */
  val Mp4FtypHex: String = "00000010" + "66747970" + "69736f6d" + "00000200"
  /** The 3x3 identity transform matrix both mvhd and tkhd carry. */
  val Mp4MatrixHex: String =
    "00010000" + "00000000" * 3 + "00010000" + "00000000" * 3 + "40000000"

  /** Deterministic fake MP4 with a REAL ISO-BMFF box tree: ftyp, a
    * variable-length `free` box (id % 8 pad bytes — the box walk is
    * actually exercised, moov never sits at a fixed offset), and a moov
    * holding mvhd (timescale 1000, duration id % 5000 + 40 ticks → the
    * same number in ms) plus one video trak (tkhd 16.16 dims embedding
    * width = id % 640 + 1, height = id % 480 + 1) and, for odd ids, an
    * audio trak with zero dims. Payload bytes follow as an opaque tail.
    * [[decodeAv]] must recover every value from the BYTES. */
  def fakeMp4(payload: Column, id: Column): Column = {
    val w = id % 640 + 1
    val h = id % 480 + 1
    val dur = id % 5000 + 40
    val pad = id % 8
    val mvhd = concat(
      lit("0000006c" + "6d766864" + "00000000" + "00000000" + "00000000" +
        "000003e8"),
      beHex(dur, 4),
      lit("00010000" + "0100" + "0000" + "00" * 8 + Mp4MatrixHex +
        "00" * 24 + "00000002"))
    def tkhd(tid: Int, wc: Column, hc: Column) = concat(
      lit("0000005c" + "746b6864" + "00000007" + "00000000" + "00000000"),
      beHex(lit(tid), 4), lit("00000000"), beHex(dur, 4),
      lit("00" * 8 + "0000" + "0000" + "0000" + "0000" + Mp4MatrixHex),
      beHex(wc, 2), lit("0000"), beHex(hc, 2), lit("0000"))
    val trakV = concat(lit("00000064" + "7472616b"), tkhd(1, w, h))
    val trakA = concat(lit("00000064" + "7472616b"), tkhd(2, lit(0), lit(0)))
    val moovSize = lit(116) + lit(100) * (id % 2 + 1)
    val moov = concat(beHex(moovSize, 4), lit("6d6f6f76"), mvhd, trakV,
      when(id % 2 === 1, trakA).otherwise(lit("")))
    val free = concat(beHex(pad + 8, 4), lit("66726565"),
      lit("0" * 14).substr(lit(1), (pad * 2).cast("int")))
    concat(unhex(concat(lit(Mp4FtypHex), free, moov)), payload.cast("binary"))
  }

  /** Deterministic fake WAV with a REAL RIFF chunk list: fmt (PCM,
    * channels = id % 2 + 1, rate = (id % 4 + 1) * 8000, bits =
    * (id % 2 + 2) * 8), a variable-length junk chunk ((id % 4) * 2 pad
    * bytes — the chunk walk is exercised), and a data chunk whose size
    * is the payload's UTF-8 byte length (so duration rides the data). */
  def fakeWav(payload: Column, id: Column): Column = {
    val ch = id % 2 + 1
    val rate = (id % 4 + 1) * 8000
    val bits = (id % 2 + 2) * 8
    // Spark's `/` on integers yields DOUBLE; ch*bits is always a
    // multiple of 8, so the division is exact and the cast lossless.
    val blockAlign = ((ch * bits) / 8).cast("long")
    val byteRate = rate * blockAlign
    val dataSize = length(payload.cast("binary"))
    val p2 = (id % 4) * 2
    val riffSize = lit(36) + p2 + lit(8) + dataSize
    concat(
      unhex(concat(
        lit("52494646"), leHex(riffSize, 4), lit("57415645"),
        lit("666d7420" + "10000000" + "0100"), leHex(ch, 2), leHex(rate, 4),
        leHex(byteRate, 4), leHex(blockAlign, 2), leHex(bits, 2),
        lit("6a756e6b"), leHex(p2, 4),
        lit("0" * 12).substr(lit(1), (p2 * 2).cast("int")),
        lit("64617461"), leHex(dataSize, 4))),
      payload.cast("binary"))
  }

  /** Mixed audio/video corpus: MP4 (id % 3 = 0), WAV (id % 3 = 1),
    * headerless payload otherwise — the a/v sibling of [[fakeMedia]]. */
  def fakeAv(payload: Column, id: Column): Column =
    when(id % 3 === 0, fakeMp4(payload, id))
      .when(id % 3 === 1, fakeWav(payload, id))
      .otherwise(payload.cast("binary"))

  /** REAL container-metadata decode from the bytes: the ISO-BMFF box
    * walk ([[graft.functions.Mp4Meta]]: width/height from the first
    * video trak's tkhd, duration from mvhd, track count) and the RIFF
    * chunk walk ([[graft.functions.WavMeta]]: channels/rate/bits from
    * fmt, duration from data size over byte rate). Null struct for
    * bytes that aren't that container — same contract as
    * [[decodeDims]]. */
  def mp4Meta(bin: Column): Column = graft.functions.MediaFunctions.mp4Meta(bin)
  def wavMeta(bin: Column): Column = graft.functions.MediaFunctions.wavMeta(bin)

  /** REAL PCM sample decode from the data chunk
    * ([[graft.functions.WavPcmStats]]): per-channel exact sample sum
    * and absolute peak over complete frames — the audio sibling of
    * [[decodeResize]]'s pixel path. Null for non-PCM-WAV bytes. */
  def wavPcmStats(bin: Column): Column =
    graft.functions.MediaFunctions.wavPcmStats(bin)

  /** REAL pixel decode + downsample via the JDK's ImageIO codecs
    * ([[graft.functions.DecodeResizeStats]]): decoded dims, resized
    * dims (fit `maxDim`, aspect-preserving integer arithmetic), and
    * per-channel means over the RESIZED pixels. Null for bytes no
    * installed codec accepts — so it composes with [[fakeMedia]]
    * (structured headers, garbage payload → null) and with real
    * PNG/JPEG fixtures ([[graft.functions.ImageOps.solidPng]]) alike.
    * Narrow binary->struct projection: the 100 TB shape is scan →
    * decode → project, no shuffle. */
  def decodeResize(bin: Column, maxDim: Int): Column =
    graft.functions.ImageFunctions.decodeResizeStats(bin, maxDim)
}
