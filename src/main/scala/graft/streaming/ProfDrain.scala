package graft.streaming

import org.apache.spark.sql.SparkSession

/** Per-drain decomposition of the Structured-Streaming lifecycle floor
  * (guide §1 measure-first, applied to the st_* gates): every micro-batch
  * reports its `durationMs` phases (latestOffset, getBatch, queryPlanning,
  * walCommit, addBatch, commitOffsets, triggerExecution) through the
  * StreamingQueryListener, and the profiler prints, per rep of each gate,
  * the wall clock, the number of batches, the summed phase times, and the
  * residual (wall − Σ triggerExecution − listener-invisible start/stop
  * cost). That residual is the stream-lifecycle floor the bench's `gap`
  * field cannot attribute.
  *
  * `sbt "runMain graft.streaming.ProfDrain st_late_tally[,st_funnel...] [sfDir] [reps]"`
  */
object ProfDrain {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class P(name: String, batchId: Long, rows: Long,
                       durs: Map[String, Long], stateOps: String)
    val progress = new java.util.concurrent.CopyOnWriteArrayList[P]()
    val startsStops = new java.util.concurrent.CopyOnWriteArrayList[(String, Long)]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = {
        startsStops.add(("start:" + e.name, System.currentTimeMillis())); ()
      }
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        import scala.jdk.CollectionConverters._
        progress.add(P(Option(e.progress.name).getOrElse("?"),
          e.progress.batchId, e.progress.numInputRows,
          e.progress.durationMs.asScala.map { case (k, v) => k -> v.toLong }.toMap,
          e.progress.stateOperators.map { so =>
            val cm = so.customMetrics.asScala.toSeq.sortBy(_._1)
              .filter(_._2 != 0).map { case (k, v) => s"$k=$v" }.mkString(" ")
            s"op=${so.operatorName} upd=${so.allUpdatesTimeMs}ms rm=${so.allRemovalsTimeMs}ms " +
              s"commit=${so.commitTimeMs}ms rowsTotal=${so.numRowsTotal} mem=${so.memoryUsedBytes} $cm"
          }.mkString(" | ")))
        ()
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
        startsStops.add(("stop", System.currentTimeMillis())); ()
      }
    }
    // The gates run their streams on the shared child session; the
    // listener bus is per-session, so register on that child too.
    LshProbe.streamSession(spark).streams.addListener(listener)
    spark.streams.addListener(listener)

    (1 to reps).foreach { r =>
      names.foreach { name =>
        progress.clear()
        val fn = graft.SparkEntry.queries(name)
        val w0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - w0) / 1e9
        Thread.sleep(400) // drain async listener delivery
        import scala.jdk.CollectionConverters._
        val ps = progress.asScala.toSeq
        val keys = ps.flatMap(_.durs.keys).distinct.sorted
        val sums = keys.map(k => k -> ps.map(_.durs.getOrElse(k, 0L)).sum).toMap
        val trig = sums.getOrElse("triggerExecution", 0L)
        println(f"[drain] $name rep $r: wall $wall%6.2f s  ($n rows, ${ps.size} batches)")
        ps.foreach { p =>
          val d = p.durs.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }.mkString(" ")
          println(f"[drain]   batch ${p.batchId}%2d (${p.rows}%6d rows): $d")
          if (p.stateOps.nonEmpty) println(f"[drain]     state: ${p.stateOps}")
        }
        println(f"[drain]   sums: ${keys.map(k => s"$k=${sums(k)}").mkString(" ")}  " +
          f"residual(wall-trigger) ${wall - trig / 1e3}%5.2f s")
      }
    }
    spark.stop()
  }
}
