package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming SCD2 maintenance — the dimension-feed shape of the
  * reference's timestamped-snapshot habit (ningaloo-etl.Rmd:480-486)
  * run as a LIVE feed: dimension snapshots arrive as files, each
  * micro-batch applies its snapshot(s) to the persisted type-2 history
  * via the same ScdOps.scd2Apply the batch path uses, and the settled
  * history equals the batched replay exactly (scd2Apply's one-at-a-time
  * == batched composability, spec-pinned, is what MAKES the streaming
  * and batch paths one operator).
  *
  * Scale shape: per micro-batch cost is scd2Apply's — O(open frontier ∪
  * snapshot), never O(history) — and the history lands in a VERSIONED
  * parquet dir per applied version (write-once, no read-modify-write on
  * a path being read: the append-only layout a warehouse table format
  * would give; version dirs double as time-travel checkpoints).
  * Version dirs publish by temp-write + rename, so a replayed
  * micro-batch is idempotent AND the replay skip only ever sees
  * completed dirs. Snapshot ORDER is the stream's contract: files stage
  * with increasing mod-times (LateArrivals.stageBatches) so the file
  * source replays versions in order, and a multi-version micro-batch
  * applies its versions ascending — either batching yields the same
  * settled history.
  */
object ScdApplyStream {

  private def latestVersionDir(work: java.io.File): Option[(Long, java.io.File)] = {
    val ds = Option(work.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("hist_"))
      .flatMap(f => f.getName.stripPrefix("hist_").toLongOption.map(_ -> f))
    if (ds.isEmpty) None else Some(ds.maxBy(_._1))
  }

  /** Drain `snapshots` (ascending versions, each a full dimension
    * snapshot) through a file-source stream into a versioned SCD2
    * history seeded from `initHistory` (the version-`initVer` open
    * rows), and return the FINAL history. `tag`/`srcFingerprint` key
    * the staged replay cache (pure function of the source tables). */
  def applyOnce(spark: SparkSession, tag: String, srcFingerprint: String,
                initHistory: DataFrame, initVer: Long,
                snapshots: => Seq[(Long, DataFrame)],
                keys: Seq[String], tracked: Seq[String],
                snapshotSchemaDdl: String): DataFrame = {
    val staged = LateArrivals.stageBatchesCached(tag, srcFingerprint,
      snapshots.map { case (v, df) => df.withColumn("_ver", lit(v)) })
    val work = java.nio.file.Files.createTempDirectory("graft-scd2-stream").toFile
    // Seed: the initial open frontier as hist_<initVer>.
    initHistory.write.mode("overwrite")
      .parquet(new java.io.File(work, s"hist_$initVer").toString)
    val ss = LshProbe.streamSession(spark)
    val stream = ss.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        s"$snapshotSchemaDdl, _ver BIGINT"))
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString)
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // Version count is the number of staged snapshots — driver-small
        // by construction (a dimension feed delivers a handful of
        // versions per drain, not rows).
        val vers = batch.select(col("_ver")).distinct()
          .collect().map(_.getLong(0)).sorted
        vers.foreach { v =>
          val bs = batch.sparkSession
          val (curVer, curDir) = latestVersionDir(work)
            .getOrElse(sys.error(s"no seeded history under $work"))
          // A replayed micro-batch re-derives an already-applied
          // version: skip — hist_<v> already exists and is final. That
          // skip is only sound because hist_<v> appears ATOMICALLY: the
          // write lands in a _tmp_ dir and renames into place, so a
          // crash mid-write leaves no hist_<v> at all (a partial dir
          // under the final name would be skipped forever and seed
          // every later version from truncated history).
          if (v > curVer) {
            val hist = bs.read.parquet(curDir.toString)
            val next = graft.ops.ScdOps.scd2Apply(
              hist, batch.filter(col("_ver") === v).drop("_ver"),
              keys, tracked, newVer = v)
            val tmp = new java.io.File(work, s"_tmp_hist_$v")
            next.write.mode("overwrite").parquet(tmp.toString)
            val dst = new java.io.File(work, s"hist_$v")
            if (!tmp.renameTo(dst))
              sys.error(s"could not publish $tmp as $dst")
          }
        }
      }
      .option("checkpointLocation", new java.io.File(work, "ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .start()
      .awaitTermination()
    val (_, finalDir) = latestVersionDir(work)
      .getOrElse(sys.error(s"no history produced under $work"))
    spark.read.parquet(finalDir.toString)
  }
}
