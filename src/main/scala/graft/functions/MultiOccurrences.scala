package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared eval: non-overlapping occurrence counts of every pattern in
  * one pass over the (already padded/lowercased, if the caller needs
  * that) input — indexOf + skip-past-match per pattern, no intermediate
  * string is ever allocated. Exactly the `replace`-arithmetic semantics
  * of [[graft.text.TextFunctions.occurrences]] (replace removes
  * non-overlapping matches left to right), so the fast path is
  * bit-compatible with the composable twin and the SQL oracles. */
object MultiOccUtil {
  def counts(s: UTF8String, pats: Array[UTF8String]): ArrayData = {
    val out = new Array[Any](pats.length)
    var i = 0
    while (i < pats.length) {
      val p = pats(i)
      var cnt = 0L
      if (p.numChars() > 0) {
        var idx = s.indexOf(p, 0)
        while (idx >= 0) {
          cnt += 1
          idx = s.indexOf(p, idx + p.numChars())
        }
      }
      out(i) = cnt
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `array(occurrences(s, p1), ..., occurrences(s, pN))` fused into one
  * native expression. The marker-count language ID runs 25 `replace`
  * chains per document (each allocating a full copy of the text) and
  * the quality score another ~13 — this expression replaces all of
  * them with zero-allocation scans, the same native-expression move
  * that made shingling and winnowing cheap. */
case class MultiOccurrences(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty, "need at least one pattern")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val pats: Array[UTF8String] =
    patterns.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(s: Any): Any =
    MultiOccUtil.counts(s.asInstanceOf[UTF8String], pats)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patsRef = ctx.addReferenceObj("pats", pats,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.MultiOccUtil.counts($c, $patsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MultiOccFunctions {
  /** Non-overlapping occurrence counts of each literal pattern, as
    * `array<long>` in pattern order. */
  def occurrencesAll(text: Column, patterns: Seq[String]): Column =
    GraftShim.column(MultiOccurrences(GraftShim.expression(text.cast("string")), patterns))
}
