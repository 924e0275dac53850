package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}

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

object MediaFunctions {
  def jpegDimsPacked(bin: Column): Column =
    GraftShim.column(JpegDimsPacked(GraftShim.expression(bin)))
}
