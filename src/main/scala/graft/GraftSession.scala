package graft

import org.apache.spark.sql.SparkSession

/** Deployment defaults for running this library at scale — the session
  * knobs SCALE.md's shuffle accounting assumes, in one place instead of
  * scattered through a submit script.
  *
  * Sizing rules (100 TB target):
  *  - shuffle partitions ~ 2-3x total executor cores, so a partition of
  *    a 100 TB-input shuffle stays in the low-GB range and sorts spill
  *    rarely; AQE coalesces the small stages back down.
  *  - files.maxPartitionBytes 256m: scan tasks big enough to amortize
  *    footer/open cost, small enough that a task retry is cheap.
  *  - AQE + skew-join on: runtime re-planning splits skewed join
  *    partitions (the salting in ScaleOps covers the aggregate-side
  *    skew AQE does not).
  *  - broadcast threshold 64m: every dimension table in this library is
  *    far below it; fact-fact joins still sort-merge (or bucket away
  *    the exchange entirely, see ScaleOps.writeBucketed).
  */
object GraftSession {

  def configure(builder: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    builder
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "268435456")
      .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
      // Let bucketed-table sortBy metadata reach the scan's
      // outputOrdering (off by default since Spark 3.0 because the
      // single-file-per-bucket precondition rarely held and checking
      // it lists files at planning time): every ScaleOps bucketed CTAS
      // writes exactly one file per bucket by construction, so the
      // check always passes and each sort-merge probe of a persisted
      // state skips its state-side Sort — at 100× the triangle closes
      // alone were re-sorting 2 × 33M rows per refresh without this.
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.session.timeZone", "UTC")

  /** Local harness shape: `local[cores]` with partitions = cores (the
    * bench/verify configuration). */
  def local(cores: Int, appName: String = "graft"): SparkSession =
    configure(SparkSession.builder().master(s"local[$cores]").appName(appName), cores)
      .getOrCreate()
}
