package graft.sources

import java.util.{Map => JMap}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.core.{JsonParser, JsonToken}
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for GeoJSON FeatureCollections — the other half
  * of the K3 sink ([[graft.io.Sinks.writeGeoJson]]): the reference both
  * writes sites.geojson (ningaloo-etl.Rmd:141) and consumes polygon
  * GeoJSON (turtle-tracks.Rmd:261-270), so the engine exposes GeoJSON as
  * a first-class `spark.read.format("graft-geojson")` table, not a
  * driver-side parse helper.
  *
  * Schema: one column per property seen across ALL features of ALL
  * files (text -> STRING, integral -> BIGINT, number -> DOUBLE, boolean
  * -> BOOLEAN; integral+fractional widens to DOUBLE, any other
  * disagreement FAILS loudly instead of silently coercing), plus
  * `geometry_type STRING`, the first outer ring as
  * `ring ARRAY<STRUCT<lon DOUBLE, lat DOUBLE>>` (Polygon: ring 0;
  * Point: a 1-element ring), ALL rings as `rings ARRAY<ARRAY<STRUCT<
  * lon DOUBLE, lat DOUBLE>>>` (Polygon: outer + interior/hole rings;
  * MultiPolygon: every member polygon's rings — the input
  * [[graft.spatial.MultiPoly]] even-odd containment consumes), and the
  * feature's bounding box as four DOUBLE columns `lon_min, lat_min,
  * lon_max, lat_max` — the spatial predicate surface. A feature whose
  * coordinate arrays are empty carries zero rings and null bbox columns.
  *
  * Scale shape: one [[InputPartition]] per file — a path can be a single
  * FeatureCollection or a directory of them, so a sharded corpus of
  * feature files parallelizes by file exactly like the JSON source.
  * Paths go through the Hadoop FileSystem API (hdfs://, s3a:// work,
  * not just local files). Column pruning is pushed down
  * ([[SupportsPushDownRequiredColumns]]): a query touching only
  * properties never materializes ring arrays. Range/equality filters on
  * the bbox columns are pushed down ([[SupportsPushDownFilters]]) and
  * prune WHOLE FILES: a file whose RFC 7946 top-level `bbox` member
  * (the sink writes one) proves no feature can match is never opened —
  * a thousand-file feature corpus answers a windowed spatial query by
  * reading the window's files. Features stream through Jackson's
  * incremental JsonParser one at a time; a file is never materialized
  * whole in task memory. Full-corpus schema inference reads every
  * feature once on the driver — pass an explicit schema (the source
  * `supportsExternalMetadata`) to skip that pass on large corpora.
  */
class GeoJsonDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-geojson"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GeoJsonTable.inferSchema(GeoJsonTable.files(options.get("path")))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new GeoJsonTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = true
}

object GeoJsonTable {
  val ringType: ArrayType =
    ArrayType(StructType(Seq(
      StructField("lon", DoubleType), StructField("lat", DoubleType))))

  /** All rings of the geometry: Polygon = outer ring then interior
    * (hole) rings; MultiPolygon = every polygon's rings in order —
    * the multi-ring surface `sp::over`-style even-odd containment
    * ([[graft.spatial.MultiPoly]]) consumes. */
  val ringsType: ArrayType = ArrayType(ringType)

  /** The geometry-derived columns appended after the property columns. */
  val geomFields: Seq[StructField] = Seq(
    StructField("geometry_type", StringType), StructField("ring", ringType),
    StructField("rings", ringsType),
    StructField("lon_min", DoubleType), StructField("lat_min", DoubleType),
    StructField("lon_max", DoubleType), StructField("lat_max", DoubleType))

  val bboxColumns: Set[String] = Set("lon_min", "lat_min", "lon_max", "lat_max")

  // The active session's hadoop conf carries spark.hadoop.* credentials
  // and endpoints (how s3a/hdfs are normally configured); it is present
  // on the driver for every planning call (files/inferSchema/fileBbox).
  // Executor-side reads fall back to classpath defaults — sufficient for
  // default-FS paths; a credentialed object store wants the conf
  // broadcast, which this dimension-sized source does not carry.
  private def hadoopConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def fs(path: String) = new Path(path).getFileSystem(hadoopConf())

  /** Files under `path` (a .geojson/.json file, or a directory of them),
    * via the Hadoop FileSystem API, sorted for deterministic partition
    * order. */
  def files(path: String): Seq[String] = {
    val p = new Path(path)
    val filesystem = fs(path)
    require(filesystem.exists(p), s"graft-geojson: path not found: $path")
    if (filesystem.getFileStatus(p).isFile) Seq(p.toString)
    else filesystem.listStatus(p).toSeq.map(_.getPath)
      .filter(q => q.getName.endsWith(".geojson") || q.getName.endsWith(".json"))
      .map(_.toString).sorted
  }

  // Typed as InputStream: FSDataInputStream is also a DataInput, which
  // makes Jackson's createParser overload ambiguous.
  private[sources] def open(file: String): java.io.InputStream =
    fs(file).open(new Path(file))

  /** Advances `p` past the top-level fields to the START_ARRAY of
    * "features", skipping other members (type, bbox, ...) without
    * materializing them. */
  private[sources] def seekFeatures(p: JsonParser, file: String): Unit = {
    require(p.nextToken() == JsonToken.START_OBJECT,
      s"graft-geojson: $file is not a JSON object")
    var found = false
    while (!found) {
      val t = p.nextToken()
      require(t != null && t != JsonToken.END_OBJECT,
        s"graft-geojson: $file is not a FeatureCollection (no features array)")
      val name = p.currentName()
      p.nextToken()
      if (name == "features") {
        require(p.currentToken() == JsonToken.START_ARRAY,
          s"graft-geojson: $file: features is not an array")
        found = true
      } else p.skipChildren()
    }
  }

  /** The file's top-level RFC 7946 `bbox` member as (w, s, e, n), read
    * from the header tokens only — parsing stops at the first of `bbox`
    * or `features`, so planning never scans feature data. Files without
    * a leading bbox return None (and are never pruned). */
  def fileBbox(file: String): Option[(Double, Double, Double, Double)] = {
    val p = new ObjectMapper().getFactory.createParser(open(file))
    try {
      if (p.nextToken() != JsonToken.START_OBJECT) return None
      while (true) {
        val t = p.nextToken()
        if (t == null || t == JsonToken.END_OBJECT) return None
        val name = p.currentName()
        p.nextToken()
        name match {
          case "bbox" =>
            if (p.currentToken() != JsonToken.START_ARRAY) return None
            val buf = mutable.ArrayBuffer.empty[Double]
            while (p.nextToken() != JsonToken.END_ARRAY) buf += p.getDoubleValue
            return if (buf.size >= 4) Some((buf(0), buf(1), buf(2), buf(3))) else None
          case "features" => return None
          case _ => p.skipChildren()
        }
      }
      None
    } finally p.close()
  }

  /** Streams every feature of `file` through `f` — the shared iteration
    * for inference and a (driver-side) validation pass; the partition
    * reader inlines the same token walk. */
  private def forEachFeature(file: String)(f: JsonNode => Unit): Unit = {
    val mapper = new ObjectMapper()
    val p = mapper.getFactory.createParser(open(file))
    try {
      seekFeatures(p, file)
      while (p.nextToken() != JsonToken.END_ARRAY) f(mapper.readTree[JsonNode](p))
    } finally p.close()
  }

  private def jsonType(v: JsonNode): Option[DataType] = v match {
    case n if n.isNull => None // carries no type information
    case n if n.isTextual => Some(StringType)
    case n if n.isIntegralNumber => Some(LongType)
    case n if n.isNumber => Some(DoubleType)
    case n if n.isBoolean => Some(BooleanType)
    case _ => Some(StringType) // nested containers surface as JSON text
  }

  /** Infers property columns from ALL features of ALL files — a value
    * that is integral in one feature and fractional in another widens to
    * DOUBLE; any other cross-feature type disagreement fails loudly
    * (silent asLong/asText coercion truncates 2.7 to 2). */
  def inferSchema(paths: Seq[String]): StructType = {
    require(paths.nonEmpty, "graft-geojson: no .geojson/.json files under path")
    val reserved = geomFields.map(_.name).toSet
    val inferred = mutable.LinkedHashMap.empty[String, DataType]
    paths.foreach { file =>
      forEachFeature(file) { feat =>
        val props = feat.get("properties")
        if (props != null && !props.isNull) props.properties().asScala.foreach { e =>
          // A property named like a geometry-derived column would be
          // silently shadowed (duplicate column name; the reader returns
          // the geometry value, and a pushed filter on it would prune as
          // if it were a bbox bound) — fail loudly instead.
          if (reserved(e.getKey)) throw new IllegalArgumentException(
            s"graft-geojson: property '${e.getKey}' in $file collides with the " +
              s"reserved geometry column of the same name (${reserved.mkString(", ")}) " +
              "— rename the property or read it with an explicit schema that omits it")
          jsonType(e.getValue).foreach { t =>
            inferred.get(e.getKey) match {
              case None | Some(`t`) => inferred(e.getKey) = t
              case Some(prev) if Set(prev, t) == Set[DataType](LongType, DoubleType) =>
                inferred(e.getKey) = DoubleType
              case Some(prev) => throw new IllegalArgumentException(
                s"graft-geojson: property '${e.getKey}' is $prev elsewhere but " +
                  s"${t} in $file — pass an explicit schema to force a type")
            }
          }
        }
      }
    }
    StructType(inferred.map { case (k, t) => StructField(k, t) }.toSeq ++ geomFields)
  }
}

class GeoJsonTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-geojson:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GeoJsonScanBuilder(path, tableSchema)
}

class GeoJsonScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Accepts range/equality filters on the bbox columns for FILE-level
    * skipping. Every filter is also returned (Spark re-evaluates them
    * per row): the pushdown prunes which files open, it does not claim
    * row-exact evaluation. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(GeoJsonScan.isBboxFilter)
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new GeoJsonScan(path, required, pushed)
}

case class GeoJsonInputPartition(file: String) extends InputPartition

object GeoJsonScan {
  import GeoJsonTable.bboxColumns

  def isBboxFilter(f: Filter): Boolean = f match {
    case GreaterThan(a, v: Number) => bboxColumns(a) && v != null
    case GreaterThanOrEqual(a, v: Number) => bboxColumns(a) && v != null
    case LessThan(a, v: Number) => bboxColumns(a) && v != null
    case LessThanOrEqual(a, v: Number) => bboxColumns(a) && v != null
    case EqualTo(a, v: Number) => bboxColumns(a) && v != null
    case _ => false
  }

  /** Can ANY value of bbox column `a` inside this file satisfy `f`?
    * Every bbox column's value range within a file is bounded by the
    * file-level bbox: lon_min/lon_max lie in [w, e], lat_min/lat_max in
    * [s, n] — so an interval check per conjunct is sound. */
  def satisfiable(f: Filter, w: Double, s: Double, e: Double, n: Double): Boolean = {
    def interval(a: String): (Double, Double) =
      if (a == "lon_min" || a == "lon_max") (w, e) else (s, n)
    f match {
      case GreaterThan(a, v: Number) => interval(a)._2 > v.doubleValue()
      case GreaterThanOrEqual(a, v: Number) => interval(a)._2 >= v.doubleValue()
      case LessThan(a, v: Number) => interval(a)._1 < v.doubleValue()
      case LessThanOrEqual(a, v: Number) => interval(a)._1 <= v.doubleValue()
      case EqualTo(a, v: Number) =>
        interval(a)._1 <= v.doubleValue() && v.doubleValue() <= interval(a)._2
      case _ => true
    }
  }
}

class GeoJsonScan(path: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-geojson $path, ReadSchema: ${required.simpleString}" +
      (if (pushed.nonEmpty) s", PushedBboxFilters: ${pushed.mkString("[", ", ", "]")}" else "")

  /** One partition per file that SURVIVES bbox pruning: a file whose
    * header bbox proves every pushed conjunct unsatisfiable is skipped
    * without being opened for data. */
  override def planInputPartitions(): Array[InputPartition] =
    GeoJsonTable.files(path).filter { f =>
      pushed.isEmpty || (GeoJsonTable.fileBbox(f) match {
        case Some((w, s, e, n)) =>
          pushed.forall(GeoJsonScan.satisfiable(_, w, s, e, n))
        case None => true // no header bbox: never prune
      })
    }.map(GeoJsonInputPartition(_)).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GeoJsonReaderFactory(required)
}

class GeoJsonReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GeoJsonPartitionReader(p.asInstanceOf[GeoJsonInputPartition].file, required)
}

/** Streams one FeatureCollection file's features as InternalRows of the
  * pruned schema — Jackson's incremental parser reads one feature tree
  * at a time, so task memory is bounded by the largest FEATURE, not the
  * file. */
class GeoJsonPartitionReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val parser: JsonParser = {
    val p = mapper.getFactory.createParser(GeoJsonTable.open(file))
    GeoJsonTable.seekFeatures(p, file)
    p
  }
  private var current: InternalRow = _
  private val needsGeometry =
    required.fields.exists(f => GeoJsonTable.geomFields.exists(_.name == f.name))
  // Inference rejects properties named like geometry-derived columns;
  // a USER-supplied schema skips inference, so the same collision is
  // re-checked per feature here — otherwise a property named e.g.
  // lon_min would be silently shadowed by the geometry value.
  private val requestedReserved: Array[String] = {
    val reserved = GeoJsonTable.geomFields.map(_.name).toSet
    required.fields.map(_.name).filter(reserved)
  }

  /** One coordinate array [lon, lat, ...] as a pair; anything else must
    * FAIL, not silently parse nested arrays as 0.0 (Jackson's asDouble
    * on an array node). */
  private def point(pt: JsonNode): (Double, Double) = {
    if (pt == null || !pt.isArray || pt.size() < 2)
      throw new IllegalArgumentException(
        s"graft-geojson: $file: coordinate position is not a [lon, lat] array: $pt")
    (pt.get(0).asDouble(), pt.get(1).asDouble())
  }

  private def parseRing(r: JsonNode): Array[(Double, Double)] =
    (0 until r.size()).map(i => point(r.get(i))).toArray

  /** Asserts a coordinates-level node is an ARRAY — a scalar there is
    * malformed GeoJSON and must FAIL (Jackson's size() == 0 on scalars
    * would otherwise make garbage indistinguishable from the
    * deliberately-tolerated empty arrays). */
  private def coordArray(c: JsonNode, what: String): JsonNode = {
    if (c == null || !c.isArray) throw new IllegalArgumentException(
      s"graft-geojson: $file: $what coordinates is not an array: $c")
    c
  }

  /** ALL rings of the geometry as (lon, lat) pair arrays: Polygon =
    * outer then holes; MultiPolygon = every member polygon's rings in
    * order; Point/LineString/MultiPoint = one ring. An EMPTY coordinate
    * ARRAY (RFC 7946 allows it) yields zero rings — the bbox columns
    * surface as null (mirroring the sink, which excludes the feature
    * from the file bbox) rather than throwing from min/max; any
    * NON-array node at a coordinates level still fails loudly. */
  private def ringsOf(geom: JsonNode): Array[Array[(Double, Double)]] = {
    val coords = geom.get("coordinates")
    geom.get("type").asText() match {
      case "Point" =>
        if (coordArray(coords, "Point").size() == 0) Array.empty
        else Array(Array(point(coords)))
      case t @ ("LineString" | "MultiPoint") =>
        if (coordArray(coords, t).size() == 0) Array.empty
        else Array(parseRing(coords))
      case "Polygon" =>
        (0 until coordArray(coords, "Polygon").size())
          .map(i => parseRing(coordArray(coords.get(i), "Polygon ring")))
          .filter(_.nonEmpty).toArray
      case "MultiPolygon" =>
        (0 until coordArray(coords, "MultiPolygon").size()).flatMap { p =>
          val poly = coordArray(coords.get(p), "MultiPolygon member")
          (0 until poly.size())
            .map(i => parseRing(coordArray(poly.get(i), "MultiPolygon ring")))
        }.filter(_.nonEmpty).toArray
      case other => throw new IllegalArgumentException(
        s"graft-geojson: unsupported geometry type '$other' " +
          "(Point/Polygon/MultiPolygon/LineString/MultiPoint)")
    }
  }

  private def toRingData(ring: Array[(Double, Double)]): ArrayData =
    new GenericArrayData(ring.map { case (lon, lat) =>
      new GenericInternalRow(Array[Any](lon, lat))
    }.toArray[Any])

  private def propValue(feat: JsonNode, f: StructField): Any = {
    // A feature with NO properties member is legal (inference tolerates
    // it); all its property columns are null, same as absent keys.
    val props = feat.get("properties")
    val v = if (props == null || props.isNull) null else props.get(f.name)
    if (v == null || v.isNull) null
    else f.dataType match {
      case StringType => UTF8String.fromString(v.asText())
      case LongType if v.isIntegralNumber => v.asLong()
      case DoubleType if v.isNumber => v.asDouble()
      case BooleanType if v.isBoolean => v.asBoolean()
      case t => throw new IllegalArgumentException(
        s"graft-geojson: $file: property '${f.name}' is declared $t but " +
          s"holds ${v.getNodeType} '$v' — refusing to coerce")
    }
  }

  override def next(): Boolean =
    if (parser.nextToken() == JsonToken.END_ARRAY) false
    else {
      val feat = mapper.readTree[JsonNode](parser)
      if (requestedReserved.nonEmpty) {
        val props = feat.get("properties")
        if (props != null && !props.isNull) requestedReserved.foreach { name =>
          if (props.has(name)) throw new IllegalArgumentException(
            s"graft-geojson: $file: property '$name' collides with the " +
              "reserved geometry column of the same name — the reader would " +
              "silently return the geometry-derived value; rename the " +
              "property or omit the column from the schema")
        }
      }
      val geom = feat.get("geometry")
      if (needsGeometry && (geom == null || geom.isNull))
        throw new IllegalArgumentException(
          s"graft-geojson: $file: feature has null geometry (RFC 7946 allows " +
            "it, but the requested columns need one)")
      lazy val rings = ringsOf(geom)
      // Feature bbox over ALL rings (holes lie inside their outer ring,
      // so including them never widens it); zero rings -> null bounds.
      lazy val pts = rings.flatten
      def bound(sel: ((Double, Double)) => Double, max: Boolean): Any =
        if (pts.isEmpty) null
        else if (max) pts.iterator.map(sel).max
        else pts.iterator.map(sel).min
      current = new GenericInternalRow(required.fields.map { f =>
        f.name match {
          case "geometry_type" => UTF8String.fromString(geom.get("type").asText())
          case "ring" => toRingData(rings.headOption.getOrElse(Array.empty))
          case "rings" => new GenericArrayData(rings.map(toRingData).toArray[Any])
          case "lon_min" => bound(_._1, max = false)
          case "lat_min" => bound(_._2, max = false)
          case "lon_max" => bound(_._1, max = true)
          case "lat_max" => bound(_._2, max = true)
          case _ => propValue(feat, f)
        }
      }.toArray[Any])
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = parser.close()
}
