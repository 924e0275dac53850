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
  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark
    * rejects by default (PARQUET_TYPE_ILLEGAL). Requesting an explicit
    * read schema with `ts BIGINT` makes the reader surface the raw nanos
    * WITHOUT the session-global `nanosAsLong` legacy conf — a per-read
    * fix, so concurrent queries never see a mutated session. Nanos are
    * truncated to microseconds — the same truncation DuckDB applies
    * natively, so oracle comparisons agree. */
  val eventsRawSchema: String =
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING"

  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    s.read.schema(eventsRawSchema).parquet(s"$d/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
