package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Interleaved A/B of the per-micro-batch state-store commit cost under
  * Spark 4.1's checkpoint-file-checksum manager (on vs off), in ONE JVM
  * so microVM host throttling hits both arms equally. Each arm drains a
  * tiny 3-file staged stateful aggregation on a private child session
  * and reports the summed StateOperatorProgress commitTimeMs per drain.
  * Dev tool — not a registered query. */
object DevStateCommit {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 6
    // armA / armB: comma-separated k=v conf overlays (default: checksum A/B)
    def parse(s: String): Map[String, String] =
      if (s.isEmpty) Map.empty
      else s.split(',').map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
    val armA = parse(if (args.length > 1) args(1)
      else "spark.sql.streaming.checkpoint.fileChecksum.enabled=true")
    val armB = parse(if (args.length > 2) args(2)
      else "spark.sql.streaming.checkpoint.fileChecksum.enabled=false")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import scala.jdk.CollectionConverters._

    // Stage 3 tiny parquet files once.
    val dir = java.nio.file.Files.createTempDirectory("devsc").toString
    (0 until 3).foreach { i =>
      spark.range(i * 1000, i * 1000 + 1000)
        .select(col("id"), (col("id") % 50).as("k"))
        .coalesce(1).write.parquet(s"$dir/b$i")
      val f = new java.io.File(s"$dir/b$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(dir, f"b$i%03d.parquet"))
    }

    def drain(conf: Map[String, String]): (Double, Long) = {
      val ss = spark.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", "8")
      conf.foreach { case (k, v) => ss.conf.set(k, v) }
      val commits = new java.util.concurrent.atomic.AtomicLong(0)
      val l = new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          e.progress.stateOperators.foreach(so => commits.addAndGet(so.commitTimeMs))
          ()
        }
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      }
      ss.streams.addListener(l)
      val qn = s"devsc_${System.nanoTime()}"
      val t0 = System.nanoTime()
      ss.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, k BIGINT"))
        .option("pathGlobFilter", "*.parquet").option("maxFilesPerTrigger", "1")
        .parquet(dir)
        .groupBy("k").agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName(qn).outputMode("complete")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      ss.streams.removeListener(l)
      (wall, commits.get())
    }

    drain(armA); drain(armB) // warm both arms
    val (on, off) = (collection.mutable.Buffer[Long](), collection.mutable.Buffer[Long]())
    val (onW, offW) = (collection.mutable.Buffer[Double](), collection.mutable.Buffer[Double]())
    (1 to reps).foreach { _ =>
      val a = drain(armA); on += a._2; onW += a._1
      val b = drain(armB); off += b._2; offW += b._1
    }
    println(s"[devsc] armA = $armA")
    println(s"[devsc] armB = $armB")
    println(s"[devsc] commitMs  armA: ${on.mkString(" ")}  min=${on.min}")
    println(s"[devsc] commitMs  armB: ${off.mkString(" ")}  min=${off.min}")
    println(f"[devsc] wall s    armA: ${onW.map(w => f"$w%.2f").mkString(" ")}  min=${onW.min}%.2f")
    println(f"[devsc] wall s    armB: ${offW.map(w => f"$w%.2f").mkString(" ")}  min=${offW.min}%.2f")
    spark.stop()
  }
}
