package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan dump for the incremental-triangle refresh: rebuilds the
  * registered query's frame verbatim and prints every root→bucketed-scan
  * path segment below its consuming join, marking exchanges — the
  * diagnostic requireExchangeFreeBucketedProbe fails on without saying
  * WHERE. `runMain graft.DevTriPlan [sfDir]` from a scratch cwd (fresh
  * warehouse reproduces the first-build shape). */
object DevTriPlan {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.CorpusQueries
    CorpusQueries.prepareTriangleState(spark, d)
    CorpusQueries.prepareLshState(spark, d)
    val docs = Tables.documents(spark, d)
    val stateAdj = spark.table(CorpusQueries.pgEdgeStateTable(d))
    val tag = d.replaceAll("[^A-Za-z0-9]+", "_").stripPrefix("_")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val stateCounts = spark.read.parquet(
      new java.io.File(wh, s"graft_pg_tris_$tag").toString)
    val incPairs = graft.dedup.Dedup.incrementalNearDupPairs(
      docs.filter(col("doc_id") % 3 === 2),
      docs.filter(col("doc_id") % 3 =!= 2),
      spark.table(CorpusQueries.lshStateTable(d)),
      "doc_id", "text", numHashes = 32, rowsPerBand = 4,
      shingleN = 2, threshold = 0.5, bandBucketCap = None)
    val out = graft.graph.Triangles.incrementalPerNodeCounts(
        stateAdj, incPairs, stateCounts)
      .select(col("id").as("doc_id"), col("triangles"))
    val plan = out.queryExecution.executedPlan
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def kids(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: ReusedSubqueryExec => Seq(r.child)
      case _ => p.children
    }
    def walk(p: SparkPlan, path: List[SparkPlan]): Unit = p match {
      case f: FileSourceScanExec if f.relation.bucketSpec.isDefined =>
        val full = (f :: path).reverse  // root .. scan
        val joinIdx = full.lastIndexWhere(_.isInstanceOf[BaseJoinExec])
        val below = full.drop(joinIdx + 1)
        val bad = below.exists(_.isInstanceOf[ShuffleExchangeLike])
        println(s"== bucketed scan ${f.relation.location.rootPaths.mkString(",")} " +
          s"bucketedScan=${f.bucketedScan} badExchangeBelowJoin=$bad")
        println("   below-join segment: " +
          below.map(_.getClass.getSimpleName).mkString(" <- "))
        if (joinIdx >= 0)
          println("   consuming join: " + full(joinIdx).getClass.getSimpleName +
            " " + full(joinIdx).asInstanceOf[BaseJoinExec].leftKeys.mkString(","))
      case other => kids(other).foreach(c => walk(c, other :: path))
    }
    walk(plan, Nil)
    println(plan.toString.take(8000))
    spark.stop()
  }
}
