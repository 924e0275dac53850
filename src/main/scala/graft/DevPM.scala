package graft
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratchpad — phase-timing harness for whatever operator is under
  * the knife this round; rewritten freely, never part of the library
  * surface. Currently: st_lsh_probe slope decomposition (sketch vs
  * probe-join vs streaming overhead) across the 10x/30x fixtures. */
object DevPM {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[pm] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dirs = Seq("/root/testdata/sf0.1", "/tmp/graft_sf1b", "/tmp/graft_sf3b")
    dirs.foreach { d =>
      import graft.queries.CorpusQueries.prepareLshState
      t(s"$d prep lsh")(prepareLshState(spark, d))
      val tag = d.replaceAll("[^A-Za-z0-9]+", "_").stripPrefix("_")
      val lshTable = s"graft_dd_lshstate_$tag"
      // batch twin of the stream's NARROW per-row sketch
      val shingles = graft.dedup.Dedup.distinctShingles(col("text"), 2)
      def w1(s: Column) = conv(substring(md5(s), 1, 8), 16, 10).cast("long")
      def w2(s: Column) = conv(substring(md5(s), 9, 8), 16, 10).cast("long")
      val ws = transform(shingles, s => struct(w1(s).as("w1"), w2(s).as("w2")))
      def sig(i: Int): Column = array_min(transform(col("_ws"),
        w => (w.getField("w1") + lit(i.toLong) * w.getField("w2")) %
          lit(4294967296L)))
      val bandCols = (0 until 8).map { b =>
        concat(lit(s"$b:"), concat_ws("|",
          (b * 4 until (b + 1) * 4).map(sig): _*))
      }
      val sketch = spark.read.parquet(s"$d/documents.parquet")
        .filter(col("doc_id") % 3 === 2)
        .withColumn("_ws", ws)
        .select(col("doc_id"), explode(array(bandCols: _*)).as("band_key"))
      (1 to 2).foreach { r =>
        t(s"$d sketch-only rep $r")(println("  bands=" + sketch.count()))
      }
      val st = spark.table(lshTable)
        .select(col("doc_id").as("state_id"), col("band_key"))
      val capped = {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("band_key")
        st.withColumn("_bsz", count(lit(1)).over(w))
          .filter(col("_bsz") <= 16).drop("_bsz")
      }
      val joined = sketch.join(capped, Seq("band_key"))
        .select(col("state_id"), col("doc_id").as("inc_id"))
      (1 to 2).foreach { r =>
        t(s"$d sketch+join rep $r")(println("  collisions=" + joined.count()))
      }
      t(s"$d distinct")(println("  pairs=" + joined.distinct().count()))
      (1 to 2).foreach { r =>
        t(s"$d streaming candidatesOnce rep $r")(println("  pairs=" +
          graft.streaming.LshProbe.candidatesOnce(spark, d, lshTable,
            bandBucketCap = Some(16)).count()))
      }
    }
    spark.stop()
  }
}
