package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad — phase-timing harness for whatever operator is under
  * the knife this round; rewritten freely, never part of the library
  * surface. Currently: the incremental-clusters pair feed. */
object DevPM {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[pm] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    import graft.queries.CorpusQueries.{prepareClusterState, prepareLshState}
    t("prep cluster state")(prepareClusterState(spark, d))
    t("prep lsh state")(prepareLshState(spark, d))
    (1 to 2).foreach { rep =>
      val fn = SparkEntry.queries("dd_incremental_clusters")
      t(s"rep $rep dd_incremental_clusters")(println(fn(spark, d).count()))
    }
    spark.stop()
  }
}
