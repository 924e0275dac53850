package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Leg-volume decomposition of the incremental-triangle refresh — counts
  * each enumeration leg at a fixture so broadcast-vs-shuffle decisions
  * rest on measured row volumes, not "increment-bounded" intuition
  * (at 30x collision density the delta-derived candidate sets are
  * millions of rows, and a broadcast hash relation of that size builds
  * single-threaded on the driver — the measured 25 s wall gap).
  *
  * `sbt "runMain graft.DevTri [sfDir]"` */
object DevTri {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.CorpusQueries
    CorpusQueries.prepareTriangleState(spark, d)
    CorpusQueries.prepareLshState(spark, d)
    val docs = Tables.documents(spark, d)
    val stateAdj = spark.table(CorpusQueries.pgEdgeStateTable(d))
    val incPairs = graft.dedup.Dedup.incrementalNearDupPairs(
      docs.filter(col("doc_id") % 3 === 2),
      docs.filter(col("doc_id") % 3 =!= 2),
      spark.table(CorpusQueries.lshStateTable(d)),
      "doc_id", "text", numHashes = 32, rowsPerBand = 4,
      shingleN = 2, threshold = 0.5, bandBucketCap = None)
    val dp = graft.ops.CacheOnce.swapTruncated("devtri-delta",
      incPairs.select(least(col("id1"), col("id2")).as("id1"),
        greatest(col("id1"), col("id2")).as("id2")).distinct())
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[devtri] $name%-12s $n%12d rows  ${(System.nanoTime() - t0) / 1e9}%6.1f s")
    }
    time("stateAdj") { stateAdj.count() }
    time("delta") { dp.count() }
    val dpe = dp.select(col("id1").as("_u"), col("id2").as("_v"))
    time("candEE") {
      stateAdj.hint("merge").join(dpe, stateAdj("src") === dpe("_u"))
        .select(col("_u"), col("_v"), col("dst").as("_w"))
        .filter(col("_w") =!= col("_v")).count()
    }
    time("candEEv") {
      stateAdj.hint("merge").join(dpe, stateAdj("src") === dpe("_v"))
        .select(col("_u"), col("_v"), col("dst").as("_w"))
        .filter(col("_w") =!= col("_u")).count()
    }
    val dAdj = dp.select(col("id1").as("s"), col("id2").as("n"))
      .union(dp.select(col("id2").as("s"), col("id1").as("n")))
    time("wedge") {
      dAdj.select(col("s"), col("n").as("_x"))
        .join(dAdj.select(col("s"), col("n").as("_y")), Seq("s"))
        .filter(col("_x") < col("_y")).count()
    }
    time("dDD-wedge") {
      dp.select(col("id1").as("s"), col("id2").as("_x"))
        .join(dp.select(col("id1").as("s"), col("id2").as("_y")), Seq("s"))
        .filter(col("_x") < col("_y")).count()
    }
    spark.stop()
  }
}
