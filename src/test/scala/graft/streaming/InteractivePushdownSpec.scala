package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.ColumnOps

final case class Obs(id: Long, location: String, species: String, nest_age: String)

/** §2.11 interactive pushdown over the live frame (app.R:193-218): the
  * Shiny app re-filters the latest feed pull whenever a picker changes.
  * Spark shape: stream into a memory-sink table, then run parameterized
  * picker filters (ColumnOps.applyPickers, "all" = no-op) against the
  * continuously updated table — each interaction is a fresh query over
  * the current snapshot, no stream restart. */
class InteractivePushdownSpec extends SparkSpec {

  test("picker filters re-query the live memory table across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Obs]
    val query = input.toDS().writeStream
      .format("memory").queryName("graft_live_obs").start()
    try {
      input.addData(
        Obs(1, "Thevenard", "flatback", "fresh"),
        Obs(2, "Perth", "green", "old"))
      query.processAllAvailable()
      val live = spark.table("graft_live_obs")

      // picker: location=Thevenard, species=all, nest_age=all
      val picked = ColumnOps.applyPickers(live,
        Seq("location" -> Some("Thevenard"), "species" -> None, "nest_age" -> None))
      assert(picked.count() == 1)

      // feed grows; the SAME parameterized query sees the new batch
      input.addData(Obs(3, "Thevenard", "green", "fresh"))
      query.processAllAvailable()
      assert(picked.count() == 2)

      // tighter pickers compose; "all" stays a no-op
      val narrow = ColumnOps.applyPickers(live,
        Seq("location" -> Some("Thevenard"), "species" -> Some("green")))
      assert(narrow.count() == 1)
      assert(narrow.head.getLong(0) == 3L)

      // downstream re-aggregation over the filtered frame (app.R:224-237)
      val tally = picked.groupBy("species").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(tally == Map("flatback" -> 1L, "green" -> 1L))
    } finally query.stop()
  }
}
