package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming front gate of incremental entity resolution (the
  * [[LshProbe]] shape for STRUCTURED records): arriving customer rows
  * stream through per-row dirty-variant derivation + blocking-key
  * construction — all NARROW (an explode of a 4-element array per
  * input row: 2 dirty copies × 2 blocking passes), so the stream
  * carries ZERO aggregation state — and probe the persisted bucketed
  * blocking-key state with a stateless stream-static join. Collisions
  * append as they arrive; the settled distinct equals the batch
  * cross-candidate set at any arrival order or micro-batch cut, and
  * the downstream batch job (verify + incrementalClusters merge —
  * er_incremental_clusters' tail) consumes them from the sink. */
object ErProbe {

  private val customerSchema =
    "c_custkey BIGINT, c_name STRING, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment STRING"

  /** One AvailableNow drain of the customer increment (custkey % 3 = 2;
    * both dirty copies of an entity derive in-stream) against
    * `stateTable` ((rid, bkey) bucketed on bkey — written by
    * EntityQueries.prepareErState). Returns the settled DISTINCT
    * candidate pairs (state_rid, inc_rid). `blockCap` is the same
    * collision budget as the batch blocking pass and st_lsh_probe's
    * bandBucketCap: a state bucket above the cap is degenerate dirt
    * density, and every arriving record landing in it would fan out
    * cap+-fold into the sink — the static side drops such buckets
    * once, before the stream ever joins (windowed count keyed on the
    * bucketed column, no exchange). Without it, a 30-copy-density
    * fixture floods the sink with tens of millions of candidates. */
  def candidatesOnce(spark: SparkSession, sfDir: String,
                     stateTable: String,
                     blockCap: Option[Int] = None): DataFrame = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")

    // The same dirty-variant surgery and composite pass keys as the
    // batch path (EntityQueries) — the sketch parameters are one unit;
    // a drifting key format would find zero collisions and silently
    // accept every record.
    val name2 = when(col("c_custkey") % 3 === 0, lower(col("c_name")))
      .when(col("c_custkey") % 3 === 1,
        concat(expr("substring(c_name, 1, 8)"), lit("-"), expr("substring(c_name, 10)")))
      .otherwise(expr("substring(c_name, 1, length(c_name) - 1)"))
    def keysOf(rid: org.apache.spark.sql.Column, nm: org.apache.spark.sql.Column) = {
      val digits = regexp_replace(nm, "[^0-9]", "")
      Seq(
        struct(rid.as("inc_rid"), concat(lit("0:"), digits).as("bkey")),
        struct(rid.as("inc_rid"),
          concat(lit("1:"), col("c_nationkey").cast("string"), lit(":"),
            substring(digits, 1, 8)).as("bkey")))
    }

    val stream = ss.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(customerSchema))
      .option("pathGlobFilter", "customer.parquet")
      .parquet(sfDir)
      .filter(col("c_custkey") % 3 === 2)
      .select(explode(array(
        keysOf(col("c_custkey") * 2, col("c_name")) ++
          keysOf(col("c_custkey") * 2 + 1, name2): _*)).as("k"))
      .select(col("k.inc_rid"), col("k.bkey"))
      .join({
        val st = ss.table(stateTable)
          .select(col("rid").as("state_rid"), col("bkey"))
        blockCap.fold(st) { cap =>
          val w = org.apache.spark.sql.expressions.Window.partitionBy("bkey")
          st.withColumn("_bsz", count(lit(1)).over(w))
            .filter(col("_bsz") <= cap).drop("_bsz")
        }
      }, Seq("bkey"))
      .select(col("state_rid"), col("inc_rid"))

    val qname = "graft_stream_er_probe"
    val query = stream.writeStream
      .format("memory")
      .queryName(qname)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    ss.table(qname).distinct()
  }
}
