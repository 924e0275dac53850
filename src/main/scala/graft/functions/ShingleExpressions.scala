package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word n-gram shingling, called from both eval paths.
  *
  * Semantics mirror the composable formulation exactly —
  * `transform(sequence(1, size(toks)-n+1), i => concat_ws(" ", slice(toks, i, n)))`
  * over `tokens = split(trim(text), "\\s+")`, with fewer-than-n tokens
  * collapsing to the single space-joined shingle — including the edge
  * cases: trim strips ASCII spaces only (Spark `trim`, not Java `trim`),
  * and the regex split keeps trailing empty strings (Spark `split` uses
  * limit -1).
  */
object ShingleUtil {
  def shingles(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val t = text.trim()
    val raw: Array[UTF8String] =
      if (t.numBytes == 0) Array(UTF8String.EMPTY_UTF8)
      else {
        val toks = t.toString.split("\\s+", -1)
        if (toks.length < n) Array(UTF8String.fromString(toks.mkString(" ")))
        else {
          val m = toks.length - n + 1
          val arr = new Array[UTF8String](m)
          val sb = new java.lang.StringBuilder
          var i = 0
          while (i < m) {
            sb.setLength(0)
            var j = 0
            while (j < n) {
              if (j > 0) sb.append(' ')
              sb.append(toks(i + j))
              j += 1
            }
            arr(i) = UTF8String.fromString(sb.toString)
            i += 1
          }
          arr
        }
      }
    val out: Array[Any] =
      if (!distinct) raw.toArray[Any]
      else {
        // UTF8String hashes/compares by bytes, same equality array_distinct
        // uses; LinkedHashSet keeps first-occurrence order.
        val seen = new java.util.LinkedHashSet[UTF8String]
        raw.foreach(seen.add)
        val arr = new Array[Any](seen.size)
        val it = seen.iterator()
        var i = 0
        while (it.hasNext) { arr(i) = it.next(); i += 1 }
        arr
      }
    new GenericArrayData(out)
  }

  /** All n-code-point substrings, start offsets 1..len-n+1 (matches
    * `substring(text, i, n)` over a code-point sequence); shorter input
    * yields the whole string. */
  def charGrams(text: UTF8String, n: Int): ArrayData = {
    val len = text.numChars()
    if (len <= n) return new GenericArrayData(Array[Any](text))
    val m = len - n + 1
    val arr = new Array[Any](m)
    var i = 0
    while (i < m) {
      arr(i) = text.substringSQL(i + 1, n)
      i += 1
    }
    new GenericArrayData(arr)
  }
}

/** Word n-gram shingles of a text column as a native expression.
  *
  * The composable version runs `slice` + `concat_ws` lambdas through the
  * interpreted higher-order-function path once per token position — for
  * corpus dedup that loop dominates the whole MinHash pipeline (it is the
  * first full pass over every byte of text). This expression does the
  * tokenize+join in one JVM pass per document and optionally dedupes
  * in-place, saving the separate `array_distinct` array materialization.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  // StringType input is enforced by the Column entry points below, which
  // cast; the expression itself assumes a UTF8String child.
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(s: Any): Any =
    ShingleUtil.shingles(s.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleUtil.shingles($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Character n-grams of a string, one per start offset (1..len-n+1, by
  * Unicode code point like Spark's `substring`); a string shorter than n
  * yields the whole string as its single gram. The rolling pass feeds
  * fingerprinting (winnowing) — same rationale as [[WordShingles]]: the
  * `transform(sequence(...), i -> substring(text, i, n))` formulation
  * pays an interpreted lambda per character of every document. */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(s: Any): Any =
    ShingleUtil.charGrams(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.charGrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleFunctions {
  def charGrams(text: Column, n: Int): Column =
    GraftShim.column(CharShingles(GraftShim.expression(text.cast("string")), n))

  def shingles(text: Column, n: Int): Column =
    GraftShim.column(WordShingles(GraftShim.expression(text.cast("string")), n, distinct = false))

  /** `array_distinct(shingles(text, n))` fused into one pass. */
  def distinctShingles(text: Column, n: Int): Column =
    GraftShim.column(WordShingles(GraftShim.expression(text.cast("string")), n, distinct = true))
}
