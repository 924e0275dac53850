package graft.corpus

import graft.SparkSpec
import graft.functions.VectorFunctions.dot
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The native DotProduct expression must be indistinguishable from the
  * higher-order `aggregate(zip_with(...))` formulation it replaced, on
  * both eval paths (codegen and interpreted). */
class VectorExprSpec extends SparkSpec {

  private def hofDot = expr(
    "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")

  test("dot matches the HOF formulation on doubles, floats, and mixed") {
    val d = df("a array<double>, b array<double>")(Seq(
      Row(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      Row(Seq.empty[Double], Seq.empty[Double]),
      Row(Seq(0.1, -0.2), Seq(-0.3, 0.4))))
    val out = d.select(dot(col("a"), col("b")).as("native"), hofDot.as("hof")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(out(0).getDouble(0) == 32.0)

    val f = df("a array<float>, b array<float>")(Seq(
      Row(Seq(1.5f, 2.5f), Seq(2.0f, 4.0f))))
    assert(f.select(dot(col("a"), col("b"))).head.getDouble(0) == 13.0)
    // mixed float/double
    val m = f.select(dot(col("a"), expr("array(CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE))")))
    assert(m.head.getDouble(0) == 4.0)
  }

  test("dot: length mismatch and null elements yield null (zip_with parity)") {
    val d = df("a array<double>, b array<double>")(Seq(
      Row(Seq(1.0, 2.0), Seq(1.0)),                 // length mismatch
      Row(Seq[Any](1.0, null), Seq[Any](1.0, 1.0)), // null element
      Row(null, Seq(1.0))))                         // null array
    val out = d.select(dot(col("a"), col("b")).as("n"), hofDot.as("h")).collect()
    out.foreach { r => assert(r.isNullAt(0)); assert(r.isNullAt(1)) }
  }

  test("dot agrees between codegen and interpreted eval") {
    val d = df("a array<float>, b array<float>")(Seq(
      Row(Seq(1.25f, -2.5f, 3.0f), Seq(0.5f, 2.0f, -1.5f))))
    val cg = d.select(dot(col("a"), col("b"))).head.getDouble(0)
    val prevWS = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFM = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = d.select(dot(col("a"), col("b"))).head.getDouble(0)
      assert(cg == interp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prevWS)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFM)
    }
  }
}
