package graft.corpus

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.text.Mixing

class MixingSpec extends SparkSpec {

  test("concatChunk: start-offset assignment, boundary crossing, zero-token docs") {
    val d = df("g STRING, id BIGINT, tok BIGINT")(Seq(
      Row("a", 1L, 6L),   // start 0  -> chunk 0
      Row("a", 2L, 3L),   // start 6  -> chunk 0 (crosses into 1, assigned by start)
      Row("a", 3L, 0L),   // start 9  -> chunk 0 (zero-token doc is well-defined)
      Row("a", 4L, 2L),   // start 9  -> chunk 0
      Row("a", 5L, 1L),   // start 11 -> chunk 1
      Row("b", 6L, 25L))) // start 0  -> chunk 0 (independent group)
    val out = Mixing.concatChunk(d, "g", "id", col("tok"), 10)
      .select("g", "id", "chunk_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(out == Seq(("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L),
      ("a", 4L, 0L), ("a", 5L, 1L), ("b", 6L, 0L)))
  }

  test("mixtureWeights: shares and sqrt-temperature weights, closed form") {
    val d = df("src STRING, tok BIGINT")(Seq(
      Row("web", 4L), Row("web", 4L),   // 8 tokens
      Row("book", 2L)))                 // 2 tokens
    val out = Mixing.mixtureWeights(d, "src", col("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).sortBy(_._1).toSeq
    // shares 0.8 / 0.2; weights sqrt(8):sqrt(2) = 2:1 -> 2/3, 1/3
    assert(out == Seq(
      ("book", 1L, 2L, 0.2, 0.3333),
      ("web", 2L, 8L, 0.8, 0.6667)))
  }
}
