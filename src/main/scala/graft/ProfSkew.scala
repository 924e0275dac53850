package graft

import org.apache.spark.sql.SparkSession

/** Per-STAGE skew attribution for one registered query — where [[Prof]]
  * reports a query's aggregate wall/taskTime, this main breaks the
  * taskTime down by stage and, within each stage, reports the max task
  * against the stage's mean: the signature of a hot-key enumeration
  * (one task holding a near-clique hub's whole wedge expansion) is a
  * stage whose max-task runtime ~= the query's wall clock while the
  * stage's other tasks finish in milliseconds. That single number is
  * what decides between "join strategy problem" (many slow tasks, one
  * slow stage) and "intra-task skew" (one slow task) — the r14 triangle
  * experiments needed exactly this and inferred it indirectly.
  *
  * `sbt "runMain graft.ProfSkew <query>[,<query>...] [sfDir] [reps] [topN]"`
  *
  * Comma-separated names run sequentially in ONE JVM — for fixtures
  * where the per-family state build dominates a fresh JVM's first rep
  * (the 100× fixture: the in-memory catalog can't carry a bucketed
  * CTAS across JVMs, so grouping a family's members amortizes its
  * build). The r15 instrument caveat stands: members of DIFFERENT
  * cache-heavy families in one session evict each other — group only
  * within a family. */
object ProfSkew {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val topN = if (args.length > 3) args(3).toInt else 12
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Bucketed sortBy metadata -> scan outputOrdering (GraftSession's
      // note: every ScaleOps bucketed CTAS writes one file per bucket,
      // so persisted-state sort-merge probes skip the state-side Sort).
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // (stageId, attemptId) -> (numTasks, sumMs, maxMs, name)
    val perStage = new java.util.concurrent.ConcurrentHashMap[
      (Int, Int), (Long, Long, Long, String)]
    // jobId -> (submittedMs, completedMs) — the driver timeline: a wall
    // clock far beyond the union of job intervals is time spent with NO
    // job running (Catalyst analysis, AQE re-planning, broadcast
    // relation builds, plan checks), the cost class task metrics are
    // blind to.
    // Jobs tagged to their rep via a local property (Bench's r17
    // treatment): exact attribution for driver-thread jobs; untagged
    // jobs (streaming micro-batch threads) keep wall-clock inclusion.
    val repTagKey = "graft.prof.rep"
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, String)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null) {
          val ms = t.taskMetrics.executorRunTime
          perStage.merge((t.stageId, t.stageAttemptId), (1L, ms, ms, ""),
            (a, b) => (a._1 + b._1, a._2 + b._2, math.max(a._3, b._3), a._4))
          ()
        }
      }
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val k = (s.stageInfo.stageId, s.stageInfo.attemptNumber())
        perStage.computeIfPresent(k,
          (_, v) => (v._1, v._2, v._3, s.stageInfo.name.takeWhile(_ != '\n').take(90)))
        ()
      }
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val tag = Option(j.properties).flatMap(pp =>
          Option(pp.getProperty(repTagKey))).getOrElse("")
        jobs.put(j.jobId, (j.time, -1L, tag)); ()
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        jobs.computeIfPresent(j.jobId, (_, v) => (v._1, j.time, v._3)); ()
      }
    })

    // Validate EVERY name up front (ADVICE r16): with comma-grouped
    // queries a typo in a later member must fail before the earlier
    // (expensive, 100x-fixture) members run, not after.
    val fns = names.map(n => n -> SparkEntry.queries(n))
    fns.foreach { case (name, fn) =>
    (1 to reps).foreach { r =>
      perStage.clear(); jobs.clear()
      val repTag = s"$name#$r"
      spark.sparkContext.setLocalProperty(repTagKey, repTag)
      val rep0 = System.currentTimeMillis()
      val w0 = System.nanoTime()
      val n = try fn(spark, sfDir).count()
        finally spark.sparkContext.setLocalProperty(repTagKey, null)
      val wall = (System.nanoTime() - w0) / 1e9
      Thread.sleep(500) // drain async listener events
      import scala.jdk.CollectionConverters._
      val rows = perStage.asScala.toSeq.sortBy(-_._2._2).take(topN)
      println(f"[skew] $name rep $r: $wall%.2f s wall ($n rows), " +
        f"${perStage.asScala.values.map(_._2).sum / 1e3}%.1f s-cpu total, " +
        s"${perStage.size} stages — top $topN by stage taskTime:")
      rows.foreach { case ((sid, att), (nt, sum, max, sname)) =>
        println(f"[skew]   stage $sid%5d.$att  tasks $nt%5d  sum ${sum / 1e3}%8.1f s  " +
          f"max-task ${max / 1e3}%7.1f s  mean ${sum / math.max(nt, 1) / 1e3}%7.2f s  $sname")
      }
      // Driver timeline: each job's [start, end] offset from rep start,
      // and the idle gap since the previous job's end — a large gap is
      // driver-side work between jobs; a large total-wall-minus-covered
      // is the same inside/around the terminal action.
      // This rep's jobs: tag-exact where stamped, wall-clock for the
      // untagged (streaming-thread) remainder. The per-rep clear()
      // already scopes the map; the tag filter additionally drops late
      // async stragglers of the PREVIOUS rep that land after clear().
      val tl = jobs.asScala.toSeq
        .filter { case (_, (_, _, t)) => t.isEmpty || t == repTag }
        .sortBy(_._2._1)
      var cursor = rep0
      var covered = 0L
      var gapSum = 0L
      val gaps = Seq.newBuilder[String]
      tl.foreach { case (jid, (js, je0, _)) =>
        val je = if (je0 < 0) System.currentTimeMillis() else je0
        val gap = js - cursor
        if (gap > 200)
          gaps += f"[skew]   gap ${gap / 1e3}%6.2f s before job $jid (t+${(js - rep0) / 1e3}%.2f s)"
        covered += math.max(0L, je - math.max(js, cursor))
        gapSum += math.max(0L, gap)
        cursor = math.max(cursor, je)
      }
      println(f"[skew]   jobs ${tl.size}: covered ${covered / 1e3}%.2f s, " +
        f"inter-job driver gaps ${gapSum / 1e3}%.2f s, " +
        f"tail ${(rep0 + (wall * 1000).toLong - cursor) / 1e3}%.2f s; gaps > 0.2 s:")
      gaps.result().foreach(println)
    }
    }
    spark.stop()
  }
}
