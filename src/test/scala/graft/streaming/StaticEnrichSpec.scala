package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Stream-static join: result parity with the batch join, and the
  * STATELESS claim — the join itself adds no state store; state
  * belongs to the downstream aggregation alone. */
class StaticEnrichSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("enriched tally equals the batch join; dimension covers every type") {
    import spark.implicits._
    val got = StaticEnrich.enrichedTallyOnce(spark, sfDir)
      .orderBy("category", "event_type")
      .as[(String, String, Long, Double)].collect().toSeq
    val dimDf = StaticEnrich.dim.toDF("event_type", "category", "weight")
    val want = graft.Tables.events(spark, sfDir)
      .join(dimDf, Seq("event_type"), "left")
      .groupBy("category", "event_type")
      .agg(count(lit(1)).as("n"),
        round(sum(col("value") * col("weight")), 2).as("weighted_value"))
      .orderBy("category", "event_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got == want)
    // The dimension is total over the event types: no null category
    // slipped through the left join.
    assert(got.forall(_._1 != null))
  }

  test("the static join is stateless: exactly one stateful operator (the tally)") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "4")
    import ss.implicits._
    val dimDf = StaticEnrich.dim.toDF("event_type", "category", "weight")
    val stream = ss.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(graft.Tables.eventsRawSchema))
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .join(broadcast(dimDf), Seq("event_type"), "left")
      .groupBy("category").agg(count(lit(1)).as("n"))
    val q = stream.writeStream.format("memory").queryName("se_state_probe")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val progress = q.recentProgress.lastOption
      .getOrElse(fail("no progress recorded"))
    assert(progress.stateOperators.length == 1,
      s"expected ONE stateful operator (the aggregate), got " +
        s"${progress.stateOperators.map(_.operatorName).mkString(", ")}")
    // The one stateful operator is the aggregation's state store
    // ("stateStoreSave"), NOT a symmetric-hash-join state op.
    assert(progress.stateOperators.head.operatorName == "stateStoreSave",
      progress.stateOperators.head.operatorName)
  }
}
