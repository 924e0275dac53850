package graft.corpus

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.similarity.Similarity
import graft.text.Mixing

/** int8 quantization and sliding chunk windows (round 5). */
class QuantChunkSpec extends SparkSpec {
  import spark.implicits._

  test("int8Quantized: scale and values, zero vectors excluded") {
    val emb = df("vec_id BIGINT, embedding ARRAY<FLOAT>")(Seq(
      Row(1L, Seq(1.0f, -0.5f, 0.25f)),
      Row(2L, Seq(0.0f, 0.0f, 0.0f))))
    val got = Similarity.int8Quantized(emb, "vec_id", "embedding")
      .select("vec_id", "qv", "scale").collect()
    assert(got.length == 1) // zero vector has no scale
    val r = got.head
    assert(r.getLong(0) == 1L)
    assert(r.getSeq[Double](1) == Seq(127.0, -64.0, 32.0)) // round(63.5)=64 half-up
    assert(math.abs(r.getDouble(2) - 1.0 / 127) < 1e-12)
  }

  test("int8 cosine error stays small on unit-ish vectors") {
    val rng = new scala.util.Random(7)
    val emb = df("vec_id BIGINT, embedding ARRAY<FLOAT>")(
      (0L until 50L).map(i => Row(i, Seq.fill(64)(rng.nextGaussian().toFloat))))
    val q = Similarity.int8Quantized(emb, "vec_id", "embedding")
    val l = q.select(col("vec_id").as("id1"), col("embedding").as("e1"), col("qv").as("q1"))
    val r = q.select(col("vec_id").as("id2"), col("embedding").as("e2"), col("qv").as("q2"))
    val maxErr = l.crossJoin(r).filter(col("id1") < col("id2"))
      .select(abs(
        Similarity.dot(col("e1"), col("e2")) /
          (Similarity.l2norm(col("e1")) * Similarity.l2norm(col("e2"))) -
        Similarity.dot(col("q1"), col("q2")) /
          (Similarity.l2norm(col("q1")) * Similarity.l2norm(col("q2")))).as("err"))
      .agg(max(col("err"))).as[Double].head()
    assert(maxErr < 0.01, s"int8 cosine error too large: $maxErr")
  }

  test("slidingChunks: offsets, tail chunk, overlap, tokenless docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "only three tokens"),
      (3L, "   ")) // tokenless -> no chunks
      .toDF("doc_id", "text")
    val got = Mixing.slidingChunks(docs, "doc_id", "text", window = 4, stride = 3)
      .orderBy("doc_id", "chunk_idx")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 4L, "w1"), (1L, 1L, 3L, 4L, "w4"),
      (1L, 2L, 6L, 4L, "w7"), (1L, 3L, 9L, 1L, "w10"),
      (2L, 0L, 0L, 3L, "only")))
  }

  test("slidingChunks rejects stride > window") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Mixing.slidingChunks(docs, "doc_id", "text", window = 2, stride = 3)
    }
  }
}
