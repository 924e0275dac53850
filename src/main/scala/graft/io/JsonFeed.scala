package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.spatial.Poly

/** Semi-structured feed parsing (SURVEY.md §2.8 N1/N3, §2.1 S4/S5): the
  * Google-Fusion-Tables response shape `{columns: [...], rows: [[...]]}`
  * with positional column-name splice and regex name sanitation
  * (turtle-tracks.Rmd:24-43; app.R:79-99), and GeoJSON polygon literals
  * (turtle-tracks.Rmd:261-270).
  */
object JsonFeed {

  /** Column-name sanitation: `-` -> `_`, strip `*` (turtle-tracks.Rmd:38-39). */
  def sanitizeName(s: String): String = s.replace("-", "_").replace("*", "")

  /** O4: splice a replacement list into a name vector at the position of
    * `at` (the GeoPoint 5-way flatten, turtle-tracks.Rmd:32-37). */
  def spliceAt(names: Seq[String], at: String, replacement: Seq[String]): Seq[String] = {
    val i = names.indexOf(at)
    require(i >= 0, s"spliceAt: '$at' not present")
    names.take(i) ++ replacement ++ names.drop(i + 1)
  }

  /** N1: parse a GFT-shaped JSON body into a typed DataFrame. The column
    * list is tiny metadata (read once on the driver, like any schema
    * discovery); the rows explode distributed. `splice` optionally
    * replaces one raw column name with several (the GeoPoint flatten) —
    * row arity must already match the spliced width, as in the feed. */
  def parseGft(spark: SparkSession, body: String,
               splice: Option[(String, Seq[String])] = None): DataFrame = {
    import spark.implicits._
    val raw = spark.read.json(Seq(body).toDS())
    val rawNames = raw.select("columns").head().getSeq[String](0)
    val names = (splice match {
      case Some((at, repl)) => spliceAt(rawNames, at, repl)
      case None => rawNames
    }).map(sanitizeName)
    raw.select(explode(col("rows")).as("r"))
      .select(names.zipWithIndex.map { case (n, i) =>
        col("r").getItem(i).as(n)
      }: _*)
  }

  /** N3: GeoJSON polygon literal -> [[Poly]] (outer ring only), parsed with
    * Jackson (already on the Spark classpath). Accepts either a bare
    * coordinates array or a full `{"type":"Polygon","coordinates":...}`. */
  def parseGeoJsonPolygon(json: String): Poly = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    val coords = if (root.has("coordinates")) root.get("coordinates") else root
    val ring = coords.get(0)
    val pts = (0 until ring.size()).map { i =>
      (ring.get(i).get(0).asDouble(), ring.get(i).get(1).asDouble())
    }
    Poly(pts)
  }
}
