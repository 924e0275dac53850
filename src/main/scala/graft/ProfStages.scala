package graft

import org.apache.spark.sql.SparkSession

/** Per-stage attribution for one registered query: prints every stage
  * submitted during each rep with its task count, summed task time and
  * callsite name — the instrument that tells WHICH operator owns a rep's
  * s-cpu when the per-rep total says "something re-executes".
  *
  * `sbt "runMain graft.ProfStages <name> [sfDir] [reps]"` */
object ProfStages {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    final case class St(name: String, var tasks: Int = 0, var ms: Long = 0L)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, St]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
        stages.put(s.stageInfo.stageId, St(s.stageInfo.name.take(120))); ()
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val st = stages.get(t.stageId)
        if (st != null && t.taskMetrics != null) {
          st.tasks += 1; st.ms += t.taskMetrics.executorRunTime
        }
        ()
      }
    })
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { r =>
      stages.clear()
      val w0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - w0) / 1e9
      Thread.sleep(400)
      import scala.jdk.CollectionConverters._
      println(f"[stage] === $name rep $r: $wall%.2f s ($n rows), ${stages.size} stages ===")
      stages.asScala.toSeq.sortBy(-_._2.ms).take(25).foreach { case (id, st) =>
        println(f"[stage]   ${st.ms / 1e3}%7.2f s-cpu ${st.tasks}%4d tasks  #$id ${st.name}")
      }
    }
    spark.stop()
  }
}
