package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming-checkpoint I/O configuration for every gate's stream
  * session (guide §1 measure-first + §6 I/O, applied to the st_* drain
  * floor). Two measured Spark 4.1 defaults dominate the per-micro-batch
  * state-store commit on a local filesystem:
  *
  *  1. `FileContextBasedCheckpointFileManager` (the default manager)
  *     constructs a fresh Hadoop FileContext — UGI lookup included — for
  *     checkpoint file operations instead of using the cached
  *     FileSystem. Interleaved single-JVM A/B (DevStateCommit, 8 reps,
  *     4-batch drain, 8 partitions): summed StateOperatorProgress
  *     commitTimeMs 788-1020 ms with the default vs 6-16 ms with
  *     `FileSystemBasedCheckpointFileManager`; drain wall 1.14 s → 0.68 s.
  *     On a local fs the FileSystem manager's rename IS atomic, so
  *     nothing is given up. On HDFS leave the default (FileContext
  *     rename has the stronger no-overwrite guarantee) — override via
  *     `SPARK_GRAFT_CKPT_FM` (set to empty to keep Spark's default).
  *
  *  2. `spark.sql.streaming.checkpoint.fileChecksum.enabled` (new in
  *     4.x, default on) writes a checksum sidecar per checkpoint file
  *     through a thread-pool future the committing task awaits: same
  *     harness measured commitTimeMs min 1281 ms → 795 ms from this
  *     flag alone. The sidecars guard against storage-level corruption
  *     of checkpoint files — a real concern on object stores, none on
  *     ephemeral local drains; `SPARK_GRAFT_CKPT_CHECKSUM=true` turns
  *     them back on for deployments that want the integrity check.
  *
  * Results are unaffected either way: both knobs change only how
  * checkpoint files are written, not what any micro-batch computes —
  * batch counts, watermarks and sink contents are byte-identical
  * (oracle-checked), which is what makes this a legitimate I/O
  * optimization rather than a semantics change.
  */
object CheckpointIo {
  val confs: Seq[(String, String)] = Seq(
    "spark.sql.streaming.checkpointFileManagerClass" ->
      sys.env.getOrElse("SPARK_GRAFT_CKPT_FM",
        "org.apache.spark.sql.execution.streaming.checkpointing." +
          "FileSystemBasedCheckpointFileManager"),
    "spark.sql.streaming.checkpoint.fileChecksum.enabled" ->
      sys.env.getOrElse("SPARK_GRAFT_CKPT_CHECKSUM", "false"))

  /** The tuned defaults are measured for LOCAL checkpoints (the gates
    * all use temp checkpoint locations under java.io.tmpdir). If a
    * deployment points the session's default checkpoint location at a
    * remote store (hdfs://, s3a://, ...), the safety trade flips —
    * FileContext's no-overwrite rename and the checksum sidecars are
    * worth their cost there — so the defaults only apply when the
    * location is local; an EXPLICIT env override always wins (the
    * operator has read the trade). */
  private def localCheckpoints(ss: SparkSession): Boolean =
    ss.conf.getOption("spark.sql.streaming.checkpointLocation") match {
      case None => true // Spark uses a local temp dir
      case Some(loc) =>
        val scheme = java.net.URI.create(loc).getScheme
        scheme == null || scheme == "file"
    }

  /** Applies the knobs to a freshly created stream session. Empty env
    * override = leave Spark's own default for that key. */
  def tune(ss: SparkSession): SparkSession = {
    val applyDefaults = localCheckpoints(ss)
    confs.zip(Seq("SPARK_GRAFT_CKPT_FM", "SPARK_GRAFT_CKPT_CHECKSUM"))
      .foreach { case ((k, v), env) =>
        if (v.nonEmpty && (applyDefaults || sys.env.contains(env)))
          ss.conf.set(k, v)
      }
    ss
  }
}
