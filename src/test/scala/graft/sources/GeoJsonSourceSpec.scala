package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.io.Sinks

/** The graft-geojson DataSource V2: sink -> source round trip, schema
  * inference, column pruning pushdown, per-file partitioning. */
class GeoJsonSourceSpec extends SparkSpec {
  import spark.implicits._

  private def sitesDf = df(
    "site STRING, pop BIGINT, ring ARRAY<STRUCT<lon DOUBLE, lat DOUBLE>>")(Seq(
    Row("a", 10L, Seq(Row(0.0, 0.0), Row(1.0, 0.0), Row(1.0, 1.0), Row(0.0, 0.0))),
    Row("b", 20L, Seq(Row(5.0, 5.0), Row(6.0, 5.0), Row(6.0, 6.0), Row(5.0, 5.0)))))

  private def writeTmp(): String = {
    val dir = Files.createTempDirectory("geojson_spec").toString
    val path = s"$dir/sites.geojson"
    Sinks.writeGeoJson(sitesDf, "ring", Seq("site", "pop"), path)
    path
  }

  test("sink -> source round trip preserves properties and rings") {
    val path = writeTmp()
    val back = spark.read.format("graft-geojson").load(path)
    assert(back.schema.fieldNames.toSeq ==
      Seq("site", "pop", "geometry_type", "ring"))
    val got = back
      .select(col("site"), col("pop"), col("geometry_type"),
        size(col("ring")).as("n"), element_at(col("ring"), 2).getField("lon").as("x2"))
      .orderBy("site")
      .as[(String, Long, String, Int, Double)].collect().toSeq
    assert(got == Seq(("a", 10L, "Polygon", 4, 1.0), ("b", 20L, "Polygon", 4, 6.0)))
  }

  test("column pruning reaches the scan (properties-only read drops ring)") {
    val path = writeTmp()
    val q = spark.read.format("graft-geojson").load(path).select("site")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("ReadSchema: struct<site:string>"),
      s"ring not pruned from scan: $scan")
    assert(q.as[String].collect().sorted.toSeq == Seq("a", "b"))
  }

  test("unsupported geometry types fail loudly instead of parsing as zeros") {
    val dir = Files.createTempDirectory("geojson_bad").toString
    val path = s"$dir/bad.geojson"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      """{"type":"FeatureCollection","features":[{"type":"Feature",
        |"geometry":{"type":"MultiPolygon","coordinates":[[[[0,0],[1,0],[1,1],[0,0]]]]},
        |"properties":{"site":"m"}}]}""".stripMargin.replace("\n", ""))
    val e = intercept[Exception] {
      spark.read.format("graft-geojson").load(path).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m => m != null && m.contains("unsupported geometry")))
  }

  test("a directory of feature files reads as one table, one partition per file") {
    val dir = Files.createTempDirectory("geojson_dir").toString
    Sinks.writeGeoJson(sitesDf.filter($"site" === "a"), "ring", Seq("site", "pop"),
      s"$dir/part1.geojson")
    Sinks.writeGeoJson(sitesDf.filter($"site" === "b"), "ring", Seq("site", "pop"),
      s"$dir/part2.geojson")
    val back = spark.read.format("graft-geojson").load(dir)
    assert(back.rdd.getNumPartitions == 2)
    assert(back.select("site").as[String].collect().sorted.toSeq == Seq("a", "b"))
  }
}
