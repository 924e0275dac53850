package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multimodal columns (builder-prompt extension): media as opaque
  * `binary` columns with typed metadata, plus byte-level operators —
  * magic-byte format sniffing, frame/window sampling, content hashing.
  *
  * The actual image/audio DECODE step is STUBBED: this container ships no
  * codec libraries, so [[decodeStub]] derives deterministic fake
  * dimensions from the byte length. Everything around the stub — the
  * binary schema, the codegen'd byte slicing, the per-row window
  * sampling, the partition-friendly shape — is real: swap [[decodeStub]]
  * for a real codec UDF (or `mapInPandas` on a PySpark cluster) and the
  * pipeline is production-shaped. All operators are pure column
  * expressions over BinaryType: a 100 TB media table streams through one
  * narrow projection, no shuffle.
  */
object Multimodal {

  /** Deterministic fake media bytes: a real magic header (PNG/JPEG) or
    * none, prepended to the payload bytes. Stands in for reading real
    * files; keeps format sniffing honest. */
  def fakeMedia(payload: Column, id: Column): Column =
    when(id % 3 === 0, concat(unhex(lit("89504E47")), payload.cast("binary")))
      .when(id % 3 === 1, concat(unhex(lit("FFD8FFE0")), payload.cast("binary")))
      .otherwise(payload.cast("binary"))

  /** Magic-byte container sniff over the first 4 bytes. */
  def sniffFormat(bin: Column): Column = {
    val magic = lower(hex(substring(bin, 1, 4)))
    when(magic === "89504e47", lit("png"))
      .when(magic === "ffd8ffe0", lit("jpeg"))
      .otherwise(lit("unknown"))
  }

  /** Byte length of the media content. */
  def nBytes(bin: Column): Column = length(bin).cast("long")

  /** STUB decode: fake (width, height) derived from the byte length —
    * replace with a real codec call in production. Deterministic so the
    * plumbing is testable end-to-end. */
  def decodeStub(bin: Column): Column =
    struct(
      (nBytes(bin) % 640).as("width"),
      (nBytes(bin) % 480).as("height"))

  /** Frame/window sampling: k fixed-size byte windows at a fixed stride,
    * hex-encoded (cross-engine-comparable). Windows past the end truncate
    * like any substring. */
  def frameWindows(bin: Column, k: Int, windowBytes: Int, strideBytes: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      lower(hex(bin.substr(i * strideBytes + 1, lit(windowBytes)))))

  /** "Resize" stub: byte-range crop via substring — the real operator
    * would decode, resample and re-encode; the Spark-side shape (narrow
    * binary->binary projection) is identical. */
  def resizeStub(bin: Column, maxBytes: Int): Column =
    substring(bin, 1, maxBytes)
}
