package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** REAL pixel decode for the multimodal path — the JDK's own ImageIO
  * codecs (PNG/JPEG/BMP/GIF ship with every JRE, no external library),
  * so "resize" is no longer a byte-crop stub: the image is decoded,
  * downsampled to fit a bounding box, and summarized.
  *
  * Scale shape: decode is a NARROW per-row projection — a 100 TB media
  * table streams scan → decode → project with no shuffle, and the
  * expensive pixel work rides the scan stage exactly where a production
  * codec (libjpeg-turbo via JNI, GPU decode) would sit. The expression
  * returns decoded + output dimensions and per-channel means, the
  * invariant surface an oracle without a codec can still check
  * (header-declared dims == decoded dims; a solid-color fixture's means
  * == its constructor color regardless of resampling kernel).
  */
object ImageOps {

  // ImageIO defaults to a disk-backed stream cache (a temp FILE per
  // decode) — pure overhead for byte-array inputs on the executor hot
  // path; keep everything in memory.
  javax.imageio.ImageIO.setUseCache(false)

  /** Downsampled size fitting `maxDim`, preserving aspect via integer
    * arithmetic (w * maxDim / m with truncating division — the exact
    * semantics an engine-independent oracle can re-derive; no float
    * rounding mode to disagree on). No-op when already within bounds. */
  def fitDims(w: Int, h: Int, maxDim: Int): (Int, Int) = {
    val m = math.max(w, h)
    if (m <= maxDim) (w, h)
    else (math.max(1, w * maxDim / m), math.max(1, h * maxDim / m))
  }

  /** Decode `bytes` with ImageIO, downsample to fit `maxDim`, and return
    * (width, height, out_w, out_h, avg_r, avg_g, avg_b) as an
    * InternalRow — null when no installed codec recognizes the bytes
    * (the structured-header-but-garbage-payload fakes, or truncated
    * files: decode failure is data, not an error). Channel means are
    * over the RESIZED pixels (proof the resample actually ran),
    * rounded to the nearest integer. */
  def decodeResizeStats(bytes: Array[Byte], maxDim: Int): InternalRow = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    val (ow, oh) = fitDims(w, h, maxDim)
    val out = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try g.drawImage(img, 0, 0, ow, oh, null) finally g.dispose()
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        val rgb = out.getRGB(x, y)
        sr += (rgb >> 16) & 0xFF
        sg += (rgb >> 8) & 0xFF
        sb += rgb & 0xFF
        x += 1
      }
      y += 1
    }
    val n = (ow * oh).toDouble
    new GenericInternalRow(Array[Any](
      w.toLong, h.toLong, ow.toLong, oh.toLong,
      math.round(sr / n), math.round(sg / n), math.round(sb / n)))
  }

  /** A `w` x `h` solid-color PNG via ImageIO's encoder — the
    * deterministic REAL-codec fixture (PNG is lossless, so the decoded
    * channel means equal the constructor color exactly). */
  def solidPng(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}

/** `decode_resize_stats(bin, maxDim)` →
  * struct<width,height,out_w,out_h,avg_r,avg_g,avg_b: bigint>, null for
  * undecodable bytes. maxDim is a plan-time constant (it parameterizes
  * the operator, not the data). Codegen is a single static call — the
  * loop cost is the decode itself, exactly like the JPEG segment walk
  * ([[JpegDimsPacked]]). */
case class DecodeResizeStats(child: Expression, maxDim: Int)
    extends UnaryExpression {
  require(maxDim >= 1, "decode_resize_stats: maxDim must be >= 1")

  override def dataType: DataType = DecodeResizeStats.schema
  override def nullable: Boolean = true

  override def nullSafeEval(bin: Any): Any =
    ImageOps.decodeResizeStats(bin.asInstanceOf[Array[Byte]], maxDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ImageOps.decodeResizeStats($c, $maxDim);
      if (${ev.value} == null) {
        ${ev.isNull} = true;
        ${ev.value} = null;
      }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DecodeResizeStats {
  val schema: StructType = StructType(Seq(
    StructField("width", LongType), StructField("height", LongType),
    StructField("out_w", LongType), StructField("out_h", LongType),
    StructField("avg_r", LongType), StructField("avg_g", LongType),
    StructField("avg_b", LongType)))
}

object ImageFunctions {
  def decodeResizeStats(bin: Column, maxDim: Int): Column =
    GraftShim.column(DecodeResizeStats(GraftShim.expression(bin), maxDim))
}
