package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((0L, "hello world"), (1L, "jpeg payload"), (2L, "raw bytes"),
    (3L, "的是不了在")) // multibyte: byte length != char length
    .toDF("id", "payload")
    .withColumn("bin", Multimodal.fakeMedia($"payload", $"id"))

  test("sniffFormat reads the magic bytes, not the id") {
    val got = rows(docs.select($"id", Multimodal.sniffFormat($"bin")).orderBy("id"))
    assert(got == Seq(Seq(0L, "png"), Seq(1L, "jpeg"), Seq(2L, "unknown"), Seq(3L, "png")))
  }

  test("nBytes counts bytes (UTF-8), not characters") {
    val got = rows(docs.filter($"id" === 3).select(Multimodal.nBytes($"bin"))).head.head
    assert(got == 5 * 3 + 4L) // 5 CJK chars x 3 bytes + 4-byte header
  }

  test("frameWindows slices fixed windows at stride; short tail truncates") {
    val w = rows(docs.filter($"id" === 2)
      .select(Multimodal.frameWindows($"bin", 3, 4, 4))).head.head
      .asInstanceOf[scala.collection.Seq[String]]
    // "raw bytes" = 9 bytes -> windows at offsets 0,4,8: 4+4+1 bytes
    assert(w.map(_.length) == Seq(8, 8, 2))
    assert(w.head == "72617720") // "raw "
  }

  test("decodeStub is deterministic and bounded (stub, not a codec)") {
    val got = rows(docs.select(Multimodal.decodeStub($"bin").getField("width"),
      Multimodal.decodeStub($"bin").getField("height")))
    got.foreach { r =>
      assert(r(0).asInstanceOf[Long] < 640 && r(1).asInstanceOf[Long] < 480)
    }
  }
}
