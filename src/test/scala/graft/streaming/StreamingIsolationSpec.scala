package graft.streaming

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The stream's 8-partition state layout must never leak into the
  * caller's session: dailyTallyOnce runs on a cloned session, so a batch
  * query planned WHILE the stream is live keeps the caller's
  * shuffle-partition setting. */
class StreamingIsolationSpec extends SparkSpec {

  test("batch query concurrent with the stream keeps its shuffle partitions") {
    val sfDir = "/root/testdata/sf0.001"
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    // Run the stream on another thread; while it is live, plan and run a
    // batch aggregate on the caller's session and inspect its exchange.
    val streamResult = scala.concurrent.Future {
      StreamingTallies.dailyTallyOnce(spark, sfDir)
    }(scala.concurrent.ExecutionContext.global)
    // AQE wraps the exchange until execution; turn it off for the probe
    // query only, so the static plan exposes its ShuffleExchange.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val parts = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val batch = graft.Tables.events(spark, sfDir).groupBy("event_type").count()
      assert(batch.count() > 0)
      batch.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeLike => s.numPartitions
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
    assert(parts.nonEmpty && parts.forall(_ == before.toInt),
      s"batch shuffle partitions $parts != session setting $before")
    val settled = scala.concurrent.Await.result(streamResult,
      scala.concurrent.duration.Duration(120, "s"))
    assert(settled.count() > 0)
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before,
      "stream mutated the caller session conf")
  }
}
