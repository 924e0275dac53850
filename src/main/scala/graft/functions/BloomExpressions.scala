package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership test of a string column against a PRE-BUILT Bloom filter
  * riding in the plan (serialized with the expression, one instance per
  * executor) — the broadcast-prefilter shape of large-scale
  * decontamination: the small side's key set becomes a few MB of bits,
  * and the 100 TB side is cut IN ITS SCAN STAGE before any shuffle.
  * False positives survive (eliminated by the exact verify that
  * follows); false negatives are impossible, so a bloom-prefiltered
  * exact join returns exactly the unfiltered join's result. Codegen'd:
  * one hash probe per row, no boxing (a UDF would box every row). */
case class BloomMightContainString(bloom: BloomFilter, child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(s: Any): Any =
    bloom.mightContainBinary(s.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bloomRef.mightContainBinary($c.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFunctions {
  /** `bloom.mightContain(s)` as a codegen'd column predicate. The
    * filter must have been built over the SAME UTF-8 byte encoding
    * (`putString`/string-typed `stat.bloomFilter` both hash the UTF-8
    * bytes, matching `mightContainBinary(getBytes)` here). */
  def mightContainString(bloom: BloomFilter, s: Column): Column =
    GraftShim.column(BloomMightContainString(bloom, GraftShim.expression(s)))

  /** Hex serialization of a filter — how a pre-built Bloom crosses the
    * pure-SQL surface (`graft_bloom_might_contain('<hex>', col)`): SQL
    * text has no object literals, so the filter rides as a string and
    * is deserialized ONCE at analysis time into the expression's
    * reference object (per-row cost is still one codegen'd probe).
    * Dimension-sized filters only (a few KB..MB of hex in the query
    * text); a corpus-sized filter belongs on the Column API. */
  def toHex(bloom: BloomFilter): String = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    java.util.HexFormat.of().formatHex(bos.toByteArray)
  }

  def fromHex(hex: String): BloomFilter =
    BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(java.util.HexFormat.of().parseHex(hex)))
}
