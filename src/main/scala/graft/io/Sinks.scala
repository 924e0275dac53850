package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Sinks (SURVEY.md §2.2): header CSV products, timestamped snapshots,
  * GeoJSON feature collections, parquet checkpoints, CKAN
  * resource_update upload.
  *
  * Scale note: the CSV products in the reference are small analytic
  * outputs (summaries, QA frames), so `coalesce(1)` mirrors R's
  * single-file `write.csv`; for large outputs call with
  * `singleFile = false` and let every partition write its own part file.
  */
object Sinks {

  /** K1: `write.csv(x, file, row.names = F)` (ningaloo-etl.Rmd:86-368). */
  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", true).csv(path)
  }

  /** K2: snapshot CSV whose filename embeds a sanitized timestamp
    * (turtle-tracks.Rmd:89-90: `str_replace_all(Sys.time(), " |:", "-")`). */
  def writeCsvTimestamped(df: DataFrame, dir: String, prefix: String,
                          timestamp: java.time.Instant): String = {
    val tag = timestamp.toString.replaceAll("[ :]", "-")
    val path = s"$dir/${prefix}_$tag"
    writeCsv(df, path)
    path
  }

  /** K5: parquet checkpoint (`save(d, file=...)`, track_analysis.R:45). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** GeoJSON Feature per row: geometry from a polygon-ring column
    * (array<struct<lon,lat>>), properties from the named columns.
    * Pure column expression — usable in distributed writes too. */
  def geoJsonFeature(ring: Column, propCols: Seq[String]): Column =
    to_json(struct(
      lit("Feature").as("type"),
      struct(
        lit("Polygon").as("type"),
        array(transform(ring, p => array(p("lon"), p("lat")))).as("coordinates"))
        .as("geometry"),
      struct(propCols.map(col): _*).as("properties")))

  /** K3: GeoJSON FeatureCollection writer (`writeOGR(..., "GeoJSON")`,
    * ningaloo-etl.Rmd:141). Feature JSON is built distributed; only the
    * final concatenation collects — geometry products here are dimension
    * data (dozens of polygons). The collection carries its RFC 7946
    * `bbox` member ([west, south, east, north]) BEFORE the features, so
    * the graft-geojson source's file-level bbox pruning can skip the
    * file from header tokens alone. */
  def writeGeoJson(df: DataFrame, ringCol: String, propCols: Seq[String],
                   path: String): Unit =
    writeFeatureCollection(df,
      geoJsonFeature(col(ringCol), propCols),
      transform(col(ringCol), _("lon")),
      transform(col(ringCol), _("lat")), path)

  /** MultiPolygon Feature per row from a polygons column
    * `array<array<array<struct<lon,lat>>>>` (polygons → rings →
    * positions; ring 0 of each polygon is its outer ring, the rest are
    * holes) — the multi-ring geometry class the graft-geojson source
    * reads back into its `rings` column. */
  def geoJsonMultiPolygonFeature(polys: Column, propCols: Seq[String]): Column =
    to_json(struct(
      lit("Feature").as("type"),
      struct(
        lit("MultiPolygon").as("type"),
        transform(polys, poly => transform(poly, ring =>
          transform(ring, p => array(p("lon"), p("lat"))))).as("coordinates"))
        .as("geometry"),
      struct(propCols.map(col): _*).as("properties")))

  /** K3, multi-ring twin of [[writeGeoJson]]: MultiPolygon features
    * (outers + holes) with the same header-bbox contract — the bbox
    * spans every ring of every polygon (holes lie inside their outers,
    * so including them never widens it). */
  def writeGeoJsonMulti(df: DataFrame, polysCol: String, propCols: Seq[String],
                        path: String): Unit = {
    val rings = flatten(col(polysCol))
    writeFeatureCollection(df,
      geoJsonMultiPolygonFeature(col(polysCol), propCols),
      flatten(transform(rings, ring => transform(ring, _("lon")))),
      flatten(transform(rings, ring => transform(ring, _("lat")))), path)
  }

  /** Shared FeatureCollection assembly: feature JSON and per-row
    * extents ride the SAME collect — one job over the (possibly
    * joined/aggregated) input, not two. Rows with empty geometry (null
    * extents) contribute features but not bbox, mirroring the source's
    * null-bbox reading of empty rings. */
  private def writeFeatureCollection(df: DataFrame, feature: Column,
                                     lons: Column, lats: Column,
                                     path: String): Unit = {
    val rows = df.select(
      feature.as("f"),
      array_min(lons).as("w"), array_min(lats).as("s"),
      array_max(lons).as("e"), array_max(lats).as("n")).collect()
    val features = rows.map(_.getString(0))
    val withExtent = rows.filterNot(_.isNullAt(1))
    val bbox = if (withExtent.isEmpty) "" // empty collection: no bbox
      else s""""bbox":[${withExtent.map(_.getDouble(1)).min},${withExtent.map(_.getDouble(2)).min},""" +
        s"""${withExtent.map(_.getDouble(3)).max},${withExtent.map(_.getDouble(4)).max}],"""
    val doc = features.mkString(
      s"""{"type":"FeatureCollection",$bbox"features":[""", ",", "]}")
    Files.write(Paths.get(path), doc.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
  }

  /** K4: CKAN `resource_update` (ningaloo-etl.Rmd:429-438;
    * upload_workbooks.R:2-4) — the out-of-engine LOAD step: POST a
    * written product file to CKAN's action API as a multipart/form-data
    * upload, mirroring `ckanr::resource_update(id, path)` (form field
    * `id`, file part `upload`, the API key as the `Authorization`
    * header). Driver-side I/O over a small analytic output — never
    * executor work; plain JDK HttpURLConnection, no HTTP library.
    * Returns the response body (CKAN's action JSON). Unit-covered
    * against a loopback server (egress is blocked in this
    * environment); any reachable CKAN endpoint works the same way. */
  def ckanResourceUpdate(path: String, resourceId: String, apiUrl: String,
                         apiKey: String = ""): String = {
    val boundary = "----graft" + java.util.UUID.randomUUID().toString.replace("-", "")
    val target = java.net.URI.create(
      s"${apiUrl.stripSuffix("/")}/api/3/action/resource_update").toURL
    val conn = target.openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    if (apiKey.nonEmpty) conn.setRequestProperty("Authorization", apiKey)
    conn.setRequestProperty("Content-Type",
      s"multipart/form-data; boundary=$boundary")
    val p = Paths.get(path)
    val crlf = "\r\n"
    val head =
      (s"--$boundary$crlf" +
        s"""Content-Disposition: form-data; name="id"$crlf$crlf""" +
        s"$resourceId$crlf" +
        s"--$boundary$crlf" +
        s"""Content-Disposition: form-data; name="upload"; filename="${p.getFileName}"$crlf""" +
        s"Content-Type: application/octet-stream$crlf$crlf").getBytes("UTF-8")
    val tail = s"$crlf--$boundary--$crlf".getBytes("UTF-8")
    val out = conn.getOutputStream
    try {
      out.write(head)
      Files.copy(p, out)
      out.write(tail)
    } finally out.close()
    val code = conn.getResponseCode
    val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body =
      if (in == null) ""
      else try new String(in.readAllBytes(), "UTF-8") finally in.close()
    if (code >= 400)
      throw new java.io.IOException(s"resource_update $resourceId -> HTTP $code: $body")
    body
  }
}
