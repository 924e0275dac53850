package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.SparkSpec
import java.sql.Timestamp

class SessionizeSpec extends SparkSpec {
  import Sessionize._

  private def ts(min: Long): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  test("flatMapGroupsWithState closes a session when a later batch exceeds the gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val query = sessions(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("graft_sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two events 10 minutes apart -> one open session
      input.addData(Ev(1L, 1L, ts(0)), Ev(1L, 2L, ts(10)))
      query.processAllAvailable()
      assert(spark.table("graft_sessions").count() == 0) // still open

      // batch 2: event 2 hours later -> closes session 1 immediately
      input.addData(Ev(1L, 3L, ts(120)))
      query.processAllAvailable()
      val closed = spark.table("graft_sessions").collect()
      assert(closed.length == 1)
      val s = closed.head
      assert(s.getAs[Long]("user_id") == 1L)
      assert(s.getAs[Timestamp]("session_start") == ts(0))
      assert(s.getAs[Timestamp]("session_end") == ts(10))
      assert(s.getAs[Long]("n_events") == 2L)
    } finally query.stop()
  }

  test("events within the gap extend the session across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val query = sessions(input.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("graft_sessions2")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Ev(7L, 1L, ts(0)))
      query.processAllAvailable()
      input.addData(Ev(7L, 2L, ts(20)), Ev(7L, 3L, ts(40)))
      query.processAllAvailable()
      // all three chained within the gap; close with a far event
      input.addData(Ev(7L, 4L, ts(500)))
      query.processAllAvailable()
      val closed = spark.table("graft_sessions2").collect()
      assert(closed.length == 1)
      assert(closed.head.getAs[Timestamp]("session_end") == ts(40))
      assert(closed.head.getAs[Long]("n_events") == 3L)
    } finally query.stop()
  }
}
