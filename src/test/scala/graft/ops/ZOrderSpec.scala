package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{ZOrderFunctions, ZOrderUtil}

/** Morton interleave correctness + the locality property that makes it
  * a clustering key. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton2 interleaves bits exactly (a even, b odd)") {
    assert(ZOrderUtil.morton2(0L, 0L) == 0L)
    assert(ZOrderUtil.morton2(1L, 0L) == 1L) // a bit0 -> pos0
    assert(ZOrderUtil.morton2(0L, 1L) == 2L) // b bit0 -> pos1
    assert(ZOrderUtil.morton2(3L, 0L) == 5L) // 0b11 -> 0b0101
    assert(ZOrderUtil.morton2(0L, 3L) == 10L) // 0b11 -> 0b1010
    assert(ZOrderUtil.morton2(0xFFFFFFFFL, 0L) == 0x5555555555555555L)
    assert(ZOrderUtil.morton2(0L, 0xFFFFFFFFL) == 0xAAAAAAAAAAAAAAAAL)
    // Exhaustive over a small grid against a bit-by-bit reference.
    def ref(a: Long, b: Long): Long =
      (0 until 32).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    for (a <- 0L until 32L; b <- 0L until 32L)
      assert(ZOrderUtil.morton2(a, b) == ref(a, b), s"($a, $b)")
  }

  test("the column expression matches the Scala helper (codegen path)") {
    val df = spark.range(0, 1000).select(
      col("id").as("a"), (col("id") * 7 % 366).as("b"))
    val bad = df.filter(
      ZOrderFunctions.morton2(col("a"), col("b")) =!=
        udf((a: Long, b: Long) => ZOrderUtil.morton2(a, b)).apply(col("a"), col("b")))
    assert(bad.count() == 0)
  }

  test("z-sorted layout keeps BOTH dimensions' ranges tight; single-key sort does not") {
    // 64 points on an 8x8 grid, one row group per z-range quartile.
    val pts = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)).toDF("x", "y")
    val z = pts.withColumn("zv", ZOrderFunctions.morton2(col("x"), col("y")))
      .orderBy("zv").withColumn("q", floor(ZOrderFunctions.morton2(col("x"), col("y")) / 16))
    // Within each z-quartile (a 4x4 block), x and y both span at most 4.
    val spans = z.groupBy("q").agg(
      (max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys")).collect()
    spans.foreach { r =>
      assert(r.getLong(1) <= 3 && r.getLong(2) <= 3,
        s"z block ${r.get(0)} spans x=${r.getLong(1)} y=${r.getLong(2)}")
    }
    // The same 4 blocks under an x-sort leave y spanning the full grid.
    val xSorted = pts.orderBy("x").withColumn("q", floor(col("x") / 2))
    val ySpans = xSorted.groupBy("q").agg((max("y") - min("y")).as("ys")).collect()
    assert(ySpans.forall(_.getLong(1) == 7))
  }
}
