package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase decomposition of pg_incremental_pagerank's warm refresh — the
  * cluster family's SCALE.md treatment applied to the graph family's
  * heaviest query. Times, per rep in one hot JVM:
  *
  *   prep      — state freshness checks (fingerprint reads, catalog)
  *   pairs     — the increment's LSH pair feed (probe + Jaccard verify)
  *   iters=1   — full refresh with ONE superstep
  *   iters=2   — full refresh with TWO (the registered query's shape)
  *
  * so `iters2 - iters1` is one superstep's marginal cost and
  * `iters1 - pairs` is the fixed merge/seed/guard overhead around the
  * supersteps. A stage listener reports stages submitted and summed
  * executor task time per phase — at sf0.1 the graph is ~500 nodes, so
  * a large wall-to-task-time gap is SCHEDULING cost, not data.
  *
  * `sbt "runMain graft.ProfPageRank [sfDir] [reps]"` */
object ProfPageRank {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
        stages.incrementAndGet(); ()
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null)
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
        ()
      }
    })

    def phase[A](name: String, rep: Int)(body: => A): A = {
      val (s0, t0, w0) = (stages.get(), taskMs.get(), System.nanoTime())
      val out = body
      Thread.sleep(300) // let async listener events drain
      println(f"[ipr] rep $rep $name%-8s ${(System.nanoTime() - w0) / 1e9}%6.2f s  " +
        f"stages ${stages.get() - s0}%4d  taskTime ${(taskMs.get() - t0) / 1e3}%7.1f s-cpu")
      out
    }

    import graft.queries.CorpusQueries
    val d = sfDir
    (1 to reps).foreach { r =>
      phase("prep", r) {
        CorpusQueries.preparePageRankState(spark, d)
        CorpusQueries.prepareLshState(spark, d)
      }
      val docs = Tables.documents(spark, d)
      def pairFeed = graft.dedup.Dedup.incrementalNearDupPairs(
        docs.filter(col("doc_id") % 3 === 2),
        docs.filter(col("doc_id") % 3 =!= 2),
        spark.table(CorpusQueries.lshStateTable(d)),
        "doc_id", "text", numHashes = 32, rowsPerBand = 4,
        shingleN = 2, threshold = 0.5, bandBucketCap = None)
      phase("pairs", r) { pairFeed.count() }
      def full(iters: Int) = graft.graph.PageRank.incrementalPageRank(
        spark.table(CorpusQueries.pgEdgeStateTable(d)),
        graft.graph.PageRank.symmetrize(pairFeed),
        spark.read.parquet(CorpusQueries.rankStatePath(spark, d)),
        iters = iters, damping = 0.85, roundTo = 6).count()
      phase("iters1", r) { full(1) }
      phase("iters2", r) { full(2) }
    }
    spark.stop()
  }
}
