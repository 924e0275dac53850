package graft.spatial

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial operators (SURVEY.md §2.5 J10, §2.7 R4): bbox polygons,
  * reverse-geocode-by-containment.
  *
  * Scale design: polygons are dimension data (dozens), points are the
  * 100 TB fact side. Each polygon is a plan-time constant inside a
  * codegen'd [[PointInPolygon]] expression, so geocoding is a single
  * narrow map over the fact table — no join, no shuffle. A bbox
  * short-circuit inside the expression handles the overwhelmingly common
  * miss case.
  */
object Spatial {

  /** Great-circle (haversine) distance in kilometres between two
    * lon/lat points (mean Earth radius 6371.0088 km). The reference's
    * `dist(xy)` treats degrees as planar coordinates
    * (spatial_modelling.Rmd:217) — adequate over a 100 km coastline,
    * increasingly wrong with latitude; this is the geodesic a
    * wildlife-monitoring engine should also offer. Pure column math,
    * fully inside WholeStageCodegen, SQL-expressible for the oracle. */
  def haversineKm(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val r = lit(6371.0088)
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val h = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2) * r * asin(sqrt(h))
  }

  /** Closed 5-point rectangle ring from bbox corners, the reference's
    * polygon construction (ningaloo-etl.Rmd:96-120: SW,SE,NE,NW,SW). */
  def bboxPoly(xMin: Double, yMin: Double, xMax: Double, yMax: Double): Poly =
    Poly(Seq((xMin, yMin), (xMax, yMin), (xMax, yMax), (xMin, yMax), (xMin, yMin)))

  /** Polygon ring as an array-of-structs column (the GeoJSON-shaped
    * representation, ningaloo-etl.Rmd:96-129). */
  def polyColumn(p: Poly): Column =
    array(p.xs.indices.map(i =>
      struct(lit(p.xs(i)).as("lon"), lit(p.ys(i)).as("lat"))): _*)

  /** Column-level variant of the ring construction: closed SW,SE,NE,NW,SW
    * ring from bbox corner columns (ningaloo-etl.Rmd:96-103), as an
    * array-of-structs. */
  def bboxRing(xMin: Column, yMin: Column, xMax: Column, yMax: Column): Column =
    array(
      struct(xMin.as("lon"), yMin.as("lat")),
      struct(xMax.as("lon"), yMin.as("lat")),
      struct(xMax.as("lon"), yMax.as("lat")),
      struct(xMin.as("lon"), yMax.as("lat")),
      struct(xMin.as("lon"), yMin.as("lat")))

  def pointInPolygon(lon: Column, lat: Column, poly: Region): Column =
    PointInPolygon(lon, lat, poly)

  /** Reverse geocode by containment (turtle-tracks.Rmd:80-87): first
    * containing area's label wins, else the default ("WA",
    * turtle-tracks.Rmd:60). A when-chain over constant polygons —
    * stays fully inside whole-stage codegen. Areas may be single rings
    * ([[Poly]]) or holed/multi-part regions ([[MultiPoly]]). */
  def geocode(lon: Column, lat: Column, areas: Seq[(String, Region)],
              default: String): Column =
    areas.foldRight(lit(default)) { case ((name, poly), elseCol) =>
      when(PointInPolygon(lon, lat, poly), lit(name)).otherwise(elseCol)
    }

  /** [[MultiPoly]] from the graft-geojson source's `rings` column value
    * (one collected Row's ARRAY<ARRAY<STRUCT<lon,lat>>> — dimension
    * data): the driver-side bridge from a feature file to a plan-time
    * geofence constant. */
  def regionFromRings(
      rings: collection.Seq[collection.Seq[org.apache.spark.sql.Row]]): MultiPoly =
    MultiPoly(rings.toSeq.map(_.toSeq.map(p => (p.getDouble(0), p.getDouble(1)))))
}
