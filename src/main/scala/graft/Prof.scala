package graft

import org.apache.spark.sql.SparkSession

/** Dev profiler: times named queries N times in a single hot JVM.
  * `sbt "runMain graft.Prof <name>[,<name>...] [sfDir] [reps]"` —
  * a comma-separated list runs in order per rep, which is how
  * cross-query CacheOnce sharing is measured. Each rep also reports
  * stages submitted and summed executor task time: a wall-clock far
  * above taskTime/32 with few stages is DRIVER cost (Catalyst
  * analysis, plan strings, scheduling) — the signal that found the
  * incremental-PageRank analysis bottleneck. */
object Prof {
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
    // Same durable-materializer configuration as Bench/Verify: with a
    // checkpoint dir set, eagerDurable truncations go through reliable
    // checkpoint() — so GRAFT_MATERIALIZE_DEBUG write-cost numbers from
    // Prof measure the same path the bench pays.
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt")
    spark.sparkContext.setCheckpointDir(ckptDir.toString)
    // Reliable-checkpoint files are NOT cleaned at exit by Spark;
    // repeated Prof runs at stress fixtures would otherwise accumulate
    // pair-graph-sized trees under /tmp until the disk fills.
    sys.addShutdownHook(graft.ops.ScaleOps.deleteLocal(ckptDir.toFile))
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
        stages.incrementAndGet(); ()
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (t.taskMetrics != null) taskMs.addAndGet(t.taskMetrics.executorRunTime)
        ()
      }
    })
    (1 to reps).foreach { r =>
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val (s0, t0, w0) = (stages.get(), taskMs.get(), System.nanoTime())
        val n = fn(spark, sfDir).count()
        val wall = System.nanoTime() - w0 // before the drain sleep — it is
        // measurement overhead, not query time (sub-second queries were
        // overstated 2x+ with the sleep inside the wall)
        Thread.sleep(300) // drain async listener events
        println(f"[prof] $name rep $r: ${wall / 1e9}%.2f s ($n rows)  " +
          f"stages ${stages.get() - s0}%4d  taskTime ${(taskMs.get() - t0) / 1e3}%8.1f s-cpu")
      }
    }
    spark.stop()
  }
}
