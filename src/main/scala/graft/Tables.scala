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

  /** First parquet data file under `p` (lexicographic, recursing into
    * partition subdirectories) — the file whose footer speaks for the
    * tree. A mixed-unit tree would be a generator bug, not a reader
    * concern. */
  private def firstParquetFile(fs: org.apache.hadoop.fs.FileSystem,
                               p: org.apache.hadoop.fs.Path)
      : Option[org.apache.hadoop.fs.Path] = {
    val st = fs.getFileStatus(p)
    if (!st.isDirectory) Some(p)
    else fs.listStatus(p).sortBy(_.getPath.getName).iterator
      .filterNot(_.getPath.getName.startsWith("_"))
      .flatMap { c =>
        if (c.isDirectory) firstParquetFile(fs, c.getPath)
        else if (c.getPath.getName.endsWith(".parquet")) Some(c.getPath)
        else None
      }.nextOption()
  }

  /** Footer-sniffed time unit of the raw `ts` column: "NANOS", "MICROS" or
    * "MILLIS". Works on a single file or a (possibly partitioned)
    * directory tree — the unit comes from the first part file's footer,
    * and the cache key is THAT FILE's (path, size:mtime), so an
    * in-place regen of part files re-sniffs instead of serving a stale
    * unit (a directory's own mtime does not change on content
    * overwrite). A `ts` column with no timestamp annotation at all
    * (legacy raw-int64 writers) is resolved from the footer's OWN
    * column statistics by epoch magnitude — never assumed. */
  def eventsTsUnit(s: SparkSession, d: String): String = {
    val path = s"$d/events.parquet"
    val conf = s.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val file = firstParquetFile(fs, p).getOrElse(
      throw new IllegalStateException(s"no parquet data file under $path"))
    val fst = fs.getFileStatus(file)
    val key = s"$file:${fst.getLen}:${fst.getModificationTime}"
    tsUnitCache.computeIfAbsent(key, _ => {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(file, conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import org.apache.parquet.schema.LogicalTypeAnnotation
        val footer = reader.getFooter
        val schema = footer.getFileMetaData.getSchema
        schema.getType(schema.getFieldIndex("ts"))
          .asPrimitiveType().getLogicalTypeAnnotation match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit.name()
          case _ =>
            // Unannotated INT64: decide by epoch magnitude from the
            // first row group's ts column stats. For any instant in
            // 1971..2100 the unit bands are three orders of magnitude
            // apart (millis ~1e11..4.1e12, micros ~1e14..4.1e15, nanos
            // ~1e17..4.1e18), so the max statistic is unambiguous.
            import scala.jdk.CollectionConverters._
            val stats = footer.getBlocks.asScala.headOption
              .flatMap(_.getColumns.asScala.find(
                _.getPath.toDotString == "ts"))
              .map(_.getStatistics)
              // hasNonNullValue: an all-null first row group has stats
              // but no min/max; genericGetMax would be null — fall into
              // the explicit diagnostic below instead of NPEing.
              .filter(st0 => st0 != null && !st0.isEmpty && st0.hasNonNullValue)
              .getOrElse(throw new IllegalStateException(
                s"events ts column is unannotated INT64 and $file carries no " +
                  "column statistics — cannot determine the time unit"))
            val mx = stats.genericGetMax.asInstanceOf[Number].longValue()
            if (mx >= 100000000000000000L) "NANOS"        // >= 1e17
            else if (mx >= 100000000000000L) "MICROS"     // >= 1e14
            else if (mx >= 100000000000L) "MILLIS"        // >= 1e11
            else throw new IllegalStateException(
              s"events ts max statistic $mx is below the millis epoch band — " +
                "seconds-precision or corrupt data; refusing to guess")
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
