package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry]] takes an `sfDir` and reads through here so
  * the scan is a plain parquet V1 relation — Catalyst pushes filters and
  * prunes columns into the scan (verify with `.explain`: `PushedFilters`,
  * `ReadSchema`). At cluster scale the same call reads a partitioned
  * directory tree; nothing here assumes single-file layout.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.parquet` stores `ts` as a parquet INT64 TIMESTAMP whose time
    * UNIT has varied across driver data generations (NANOS, then MICROS).
    * Spark rejects TIMESTAMP(NANOS) outright (PARQUET_TYPE_ILLEGAL), and
    * silently misreading one unit as another compresses/stretches every
    * timestamp 1000×, so the loader NEVER assumes: it sniffs the unit from
    * the parquet footer once per (path, fingerprint) and picks the matching
    * conversion. Requesting an explicit read schema with `ts BIGINT` makes
    * the reader surface the raw int64 WITHOUT the session-global
    * `nanosAsLong` legacy conf — a per-read fix, so concurrent queries
    * never see a mutated session. Nanos are truncated to microseconds —
    * the same truncation DuckDB applies natively, so oracle comparisons
    * agree. */
  val eventsRawSchema: String =
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING"

  private val tsUnitCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Footer-sniffed time unit of the raw `ts` column: "NANOS", "MICROS" or
    * "MILLIS". Cached keyed by (path, size:mtime) so a regenerated source
    * file re-sniffs instead of serving a stale unit. Accepts a single file
    * or a directory of part files (first parquet wins — a mixed-unit tree
    * would be a generator bug, not a reader concern). */
  def eventsTsUnit(s: SparkSession, d: String): String = {
    val path = s"$d/events.parquet"
    val conf = s.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val st = fs.getFileStatus(p)
    val key = s"$path:${st.getLen}:${st.getModificationTime}"
    tsUnitCache.computeIfAbsent(key, _ => {
      val file =
        if (st.isDirectory)
          fs.listStatus(p).map(_.getPath)
            .filter(_.getName.endsWith(".parquet")).minBy(_.getName).toString
        else path
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(file), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import org.apache.parquet.schema.LogicalTypeAnnotation
        val schema = reader.getFooter.getFileMetaData.getSchema
        schema.getType(schema.getFieldIndex("ts"))
          .asPrimitiveType().getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit.name()
          case _ => "MICROS" // plain int64 epoch: treat as micros
        }
      } finally reader.close()
    })
  }

  /** Unit-matched SQL conversion from raw int64 `ts` to TimestampType.
    * Shared by the batch loader and the streaming readers (a stream's
    * up-front schema must be the raw one; the conversion column follows). */
  def eventsTsExpr(s: SparkSession, d: String): String =
    eventsTsUnit(s, d) match {
      case "NANOS"  => "timestamp_micros(ts div 1000)"
      case "MILLIS" => "timestamp_millis(ts)"
      case _        => "timestamp_micros(ts)"
    }

  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    s.read.schema(eventsRawSchema).parquet(s"$d/events.parquet")
      .withColumn("ts", expr(eventsTsExpr(s, d)))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
