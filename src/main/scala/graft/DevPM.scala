package graft
import org.apache.spark.sql.SparkSession
object DevPM {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[pm] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    val emb = graft.text.CorpusStats.hashedBowEmbedding(docs, "doc_id", "text", 32)
    t("emb.count cold")(println(emb.count()))
    t("emb.count warm")(println(emb.count()))
    import org.apache.spark.sql.functions._
    val cached = graft.ops.CacheOnce.swap("bow", emb)
    t("persist materialize")(println(cached.count()))
    val ivf = graft.similarity.Similarity.ivfTopK(cached, "doc_id", "embedding", 3,
      numCells = 32, nprobe = 4, queryPred = Some(col("doc_id") < 200))
    t("ivf on cached")(println(ivf.count()))
    t("ivf on cached again")(println(ivf.count()))
    spark.stop()
  }
}
