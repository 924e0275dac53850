package graft.corpus

import graft.SparkSpec
import graft.functions.ShingleFunctions
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** WordShingles must be indistinguishable from the composable
  * `transform(sequence(...), i -> concat_ws(' ', slice(toks, i, n)))`
  * formulation it replaced, over tokens = split(trim(text), '\\s+'). */
class ShingleExprSpec extends SparkSpec {

  private def hofShingles(n: Int) = expr(
    "CASE WHEN size(toks) < " + n + " THEN array(concat_ws(' ', toks)) " +
      s"ELSE transform(sequence(1, size(toks) - ${n - 1}), " +
      s"i -> concat_ws(' ', slice(toks, i, $n))) END")

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "one",
    "two words",
    "",
    "   ",
    "\ttab\tseparated\ttokens\t",
    "multiple   internal    spaces",
    "a b a b a b",           // repeats, exercises distinct
    "trailing space ",
    " leading space",
    "unicode tükörfúrógép 中文 词语 здесь")

  private def withToks(n: Int) =
    df("text string")(samples.map(Row(_)))
      .withColumn("toks",
        when(length(trim(col("text"))) === 0, array().cast("array<string>"))
          .otherwise(split(trim(col("text")), "\\s+")))
      .select(col("text"),
        ShingleFunctions.shingles(col("text"), n).as("native"),
        hofShingles(n).as("hof"),
        ShingleFunctions.distinctShingles(col("text"), n).as("native_distinct"),
        array_distinct(hofShingles(n)).as("hof_distinct"))

  test("native shingles == HOF shingles for n in 1..4, incl. edge cases") {
    (1 to 4).foreach { n =>
      withToks(n).collect().foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n text=${r.getString(0)!=null}")
        assert(r.getSeq[String](3) == r.getSeq[String](4),
          s"distinct n=$n text='${r.getString(0)}'")
      }
    }
  }

  test("null text yields null shingles") {
    val d = df("text string")(Seq(Row(null)))
    assert(d.select(ShingleFunctions.shingles(col("text"), 2)).head.isNullAt(0))
  }
}
