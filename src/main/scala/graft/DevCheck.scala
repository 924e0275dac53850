package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch dev main for one-off distributional checks (kept tiny; not a
  * registered query). Current body: is the verbatim-span match set
  * duplicate-free before its distinct? */
object DevCheck {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, d)
    val (k, shingleN) = (3, 3)
    def shingles(df: org.apache.spark.sql.DataFrame) = df
      .filter(graft.text.TextFunctions.tokenCount(col("text")) >= k)
      .select(col("doc_id"), posexplode(
        graft.functions.ShingleFunctions.shingles(col("text"), k)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("shingle"))
    val tr = shingles(docs.filter(col("doc_id") % 2 === 0))
      .select(col("doc_id").as("train_id"), col("pos").as("tpos"), col("shingle"))
    val te = shingles(docs.filter(col("doc_id") % 2 === 1))
      .select(col("doc_id").as("test_id"), col("pos").as("qpos"), col("shingle"))
    val m = tr.join(te, Seq("shingle"))
      .select("train_id", "test_id", "tpos", "qpos")
    val n = m.count()
    val nd = m.distinct().count()
    println(s"CHECK matches=$n distinct=$nd identical=${n == nd}")
    // and (id,pos) uniqueness per side
    val dupPos = tr.groupBy("train_id", "tpos").count().filter(col("count") > 1).count()
    println(s"CHECK dup (id,pos) on train side: $dupPos")
    spark.stop()
  }
}
