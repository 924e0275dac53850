package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import java.sql.Timestamp

class FunnelStreamSpec extends SparkSpec {
  import FunnelStream._

  private def ts(min: Long): Timestamp = new Timestamp(1700000000000L + min * 60000L)
  private val stages = Seq("signup", "click", "purchase")
  private def flush(id: Long) = Ev(-id, -1L, ts(60 * 24 * 10), "flush")

  private def run(name: String)(batches: Seq[Ev]*): Seq[(Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val query = reaches(input.toDS(), stages, watermarkMin = 600, flushSlackMin = 120)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b => input.addData(b: _*); query.processAllAvailable() }
      spark.table(name).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("stage_no"),
          (r.getAs[Long]("tk_us") - r.getAs[Long]("t0_us")) / 60000000L))
        .sorted.toSeq
    } finally query.stop()
  }

  test("reaches replay the greedy recurrence at flush; order rules hold") {
    // u1 full funnel; u2 click BEFORE signup (stops at stage 1);
    // u3 purchase before click (stops at stage 2); u4 never signs up.
    val got = run("graft_funnel1")(Seq(
      Ev(1L, 1L, ts(0), "signup"), Ev(1L, 2L, ts(60), "click"),
      Ev(1L, 3L, ts(90), "purchase"),
      Ev(2L, 4L, ts(0), "click"), Ev(2L, 5L, ts(30), "signup"),
      Ev(3L, 6L, ts(0), "signup"), Ev(3L, 7L, ts(30), "purchase"),
      Ev(3L, 8L, ts(60), "click"),
      Ev(4L, 9L, ts(0), "click"),
      flush(1)))
    assert(got == Seq((1L, 1L, 0L), (1L, 2L, 60L), (1L, 3L, 90L),
      (2L, 1L, 0L), (3L, 1L, 0L), (3L, 2L, 60L)))
  }

  test("arrival order within the watermark delay is irrelevant") {
    // The purchase and click arrive in batch 1, the signup in batch 2
    // (90 min of event-time disorder, inside the 600-min watermark) — a
    // greedy per-event state machine would miss the whole funnel. Rows
    // later than the watermark itself ARE dropped by the engine; that
    // is the streaming contract, and the delay bounds the disorder.
    val inOrder = run("graft_funnel2")(Seq(
      Ev(1L, 1L, ts(0), "signup"), Ev(1L, 2L, ts(60), "click"),
      Ev(1L, 3L, ts(90), "purchase"), flush(1)))
    val reversed = run("graft_funnel3")(
      Seq(Ev(1L, 3L, ts(90), "purchase"), Ev(1L, 2L, ts(60), "click")),
      Seq(Ev(1L, 1L, ts(0), "signup")),
      Seq(flush(1)))
    assert(reversed == inOrder)
    assert(reversed == Seq((1L, 1L, 0L), (1L, 2L, 60L), (1L, 3L, 90L)))
  }

  test("no emission before the watermark closes the entity") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val query = reaches(input.toDS(), stages, watermarkMin = 600, flushSlackMin = 120)
      .writeStream.format("memory").queryName("graft_funnel4")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Ev(1L, 1L, ts(0), "signup"))
      query.processAllAvailable()
      assert(spark.table("graft_funnel4").count() == 0) // buffered, not emitted
      input.addData(flush(1))
      query.processAllAvailable()
      assert(spark.table("graft_funnel4").count() == 1)
    } finally query.stop()
  }
}
