package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared eval: non-overlapping occurrence counts of every pattern in
  * one pass over the (already padded/lowercased, if the caller needs
  * that) input — indexOf + skip-past-match per pattern, no intermediate
  * string is ever allocated. Exactly the `replace`-arithmetic semantics
  * of [[graft.text.TextFunctions.occurrences]] (replace removes
  * non-overlapping matches left to right), so the fast path is
  * bit-compatible with the composable twin and the SQL oracles. */
object MultiOccUtil {
  private def countOne(s: UTF8String, p: UTF8String): Long = {
    var cnt = 0L
    if (p.numChars() > 0) {
      var idx = s.indexOf(p, 0)
      while (idx >= 0) {
        cnt += 1
        idx = s.indexOf(p, idx + p.numChars())
      }
    }
    cnt
  }

  def counts(s: UTF8String, pats: Array[UTF8String]): ArrayData = {
    val out = new Array[Any](pats.length)
    var i = 0
    while (i < pats.length) {
      out(i) = countOne(s, pats(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Σ over all patterns of their non-overlapping counts — the fused
    * form of `element_at(counts, 1) + ... + element_at(counts, N)`.
    * Consumers that only need the SUM must use this: each element_at
    * of an array-valued expression re-generates the whole child
    * subtree in operators without subexpression elimination (Filter
    * predicates), and the N-fold duplication is what pushed the
    * corpus-clean quality filter's generated method past Janino's
    * 64 KB limit — silently de-optimizing the hottest document filter
    * to interpreted eval at every scale. */
  def total(s: UTF8String, pats: Array[UTF8String]): Long = {
    var t = 0L
    var i = 0
    while (i < pats.length) {
      t += countOne(s, pats(i))
      i += 1
    }
    t
  }

  /** Index of the FIRST group whose summed pattern counts is the
    * strict maximum, or -1 when every group sums to zero — the
    * marker-table language-ID argmax (groups = consecutive runs of
    * `groupLens(g)` patterns), fused so the N·L `element_at` copies
    * of the scores/argmax when-chain never materialize in generated
    * code. Strict `>` keeps first-wins tie-breaking, and a zero best
    * maps to -1 ("und"), both bit-compatible with the composable
    * greatest/when formulation. */
  def bestGroup(s: UTF8String, pats: Array[UTF8String],
                groupLens: Array[Int]): Int = {
    var best = 0L
    var bestIdx = -1
    var p = 0
    var g = 0
    while (g < groupLens.length) {
      var sum = 0L
      var j = 0
      while (j < groupLens(g)) {
        sum += countOne(s, pats(p))
        p += 1
        j += 1
      }
      if (sum > best) { best = sum; bestIdx = g }
      g += 1
    }
    bestIdx
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

/** [[MultiOccurrences]] fused one step further: the SUM of every
  * pattern's count, directly as `long`. See [[MultiOccUtil.total]] for
  * why sum-consumers must not go through the array + element_at form. */
case class MultiOccTotal(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty, "need at least one pattern")

  override def dataType: DataType = LongType

  private lazy val pats: Array[UTF8String] =
    patterns.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(s: Any): Any =
    MultiOccUtil.total(s.asInstanceOf[UTF8String], pats)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patsRef = ctx.addReferenceObj("pats", pats,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.MultiOccUtil.total($c, $patsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The marker-table argmax fused into one call: group index (position
  * in `groupLens`) of the first strict-maximum summed count, -1 when
  * all groups sum to zero. See [[MultiOccUtil.bestGroup]]. */
case class MultiOccBestGroup(child: Expression, patterns: Seq[String],
                             groupLens: Seq[Int])
    extends UnaryExpression {
  require(groupLens.nonEmpty && groupLens.forall(_ > 0) &&
    groupLens.sum == patterns.length,
    "groupLens must be positive runs partitioning the pattern list")

  override def dataType: DataType = IntegerType

  private lazy val pats: Array[UTF8String] =
    patterns.map(UTF8String.fromString).toArray
  private lazy val lens: Array[Int] = groupLens.toArray

  override protected def nullSafeEval(s: Any): Any =
    MultiOccUtil.bestGroup(s.asInstanceOf[UTF8String], pats, lens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patsRef = ctx.addReferenceObj("pats", pats,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val lensRef = ctx.addReferenceObj("lens", lens, "int[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MultiOccUtil.bestGroup($c, $patsRef, $lensRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MultiOccFunctions {
  /** Non-overlapping occurrence counts of each literal pattern, as
    * `array<long>` in pattern order. */
  def occurrencesAll(text: Column, patterns: Seq[String]): Column =
    GraftShim.column(MultiOccurrences(GraftShim.expression(text.cast("string")), patterns))

  /** Σ of all patterns' non-overlapping counts, as `long`. */
  def occurrencesTotal(text: Column, patterns: Seq[String]): Column =
    GraftShim.column(MultiOccTotal(GraftShim.expression(text.cast("string")), patterns))

  /** First-wins argmax group of summed counts (-1 ⇒ all zero), as `int`;
    * groups are consecutive `groupLens` runs of the pattern list. */
  def occurrencesBestGroup(text: Column, patterns: Seq[String],
                           groupLens: Seq[Int]): Column =
    GraftShim.column(MultiOccBestGroup(
      GraftShim.expression(text.cast("string")), patterns, groupLens))
}
