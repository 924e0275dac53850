package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
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
  * Schema: one column per property of the first feature (types from the
  * JSON node: text -> STRING, integral -> BIGINT, number -> DOUBLE,
  * boolean -> BOOLEAN), plus `geometry_type STRING` and the outer ring
  * as `ring ARRAY<STRUCT<lon DOUBLE, lat DOUBLE>>` (Polygon: ring 0;
  * Point: a 1-element ring).
  *
  * Scale shape: one [[InputPartition]] per file — a path can be a single
  * FeatureCollection or a directory of them, so a sharded corpus of
  * feature files parallelizes by file exactly like the JSON source.
  * Column pruning is pushed down ([[SupportsPushDownRequiredColumns]]):
  * a query touching only properties never materializes ring arrays.
  * Feature objects stream through Jackson one file at a time per task;
  * nothing collects on the driver.
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

  /** Files under `path` (a .geojson/.json file, or a directory of them),
    * sorted for deterministic partition order. */
  def files(path: String): Seq[String] = {
    val f = new java.io.File(path)
    require(f.exists(), s"graft-geojson: path not found: $path")
    if (f.isFile) Seq(f.getPath)
    else f.listFiles().toSeq.map(_.getPath)
      .filter(p => p.endsWith(".geojson") || p.endsWith(".json")).sorted
  }

  def inferSchema(paths: Seq[String]): StructType = {
    require(paths.nonEmpty, "graft-geojson: no .geojson/.json files under path")
    val root = new ObjectMapper().readTree(new java.io.File(paths.head))
    val feats = root.get("features")
    require(feats != null && feats.isArray,
      s"graft-geojson: ${paths.head} is not a FeatureCollection")
    val propFields =
      if (feats.size() == 0) Seq.empty
      else {
        val props = feats.get(0).get("properties")
        props.properties().asScala.toSeq.map { e =>
          val t = e.getValue match {
            case v if v.isTextual => StringType
            case v if v.isIntegralNumber => LongType
            case v if v.isNumber => DoubleType
            case v if v.isBoolean => BooleanType
            case _ => StringType
          }
          StructField(e.getKey, t)
        }
      }
    StructType(propFields ++ Seq(
      StructField("geometry_type", StringType), StructField("ring", ringType)))
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
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GeoJsonScan(path, required)
}

case class GeoJsonInputPartition(file: String) extends InputPartition

class GeoJsonScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-geojson $path, ReadSchema: ${required.simpleString}"
  override def planInputPartitions(): Array[InputPartition] =
    GeoJsonTable.files(path).map(GeoJsonInputPartition(_)).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new GeoJsonReaderFactory(required)
}

class GeoJsonReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GeoJsonPartitionReader(p.asInstanceOf[GeoJsonInputPartition].file, required)
}

/** Streams one FeatureCollection file's features as InternalRows of the
  * pruned schema. */
class GeoJsonPartitionReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {
  private val feats: java.util.Iterator[JsonNode] = {
    val root = new ObjectMapper().readTree(new java.io.File(file))
    val f = root.get("features")
    require(f != null && f.isArray, s"graft-geojson: $file is not a FeatureCollection")
    f.elements()
  }
  private var current: InternalRow = _

  private def ringOf(geom: JsonNode): ArrayData = {
    val coords = geom.get("coordinates")
    // Only geometries whose outer ring is unambiguous are supported —
    // anything else must FAIL, not silently parse nested arrays as 0.0
    // (Jackson's asDouble on an array node).
    val ring = geom.get("type").asText() match {
      case "Point" => Seq(coords)
      case "Polygon" | "LineString" | "MultiPoint" =>
        val r = if (geom.get("type").asText() == "Polygon") coords.get(0) else coords
        (0 until r.size()).map(r.get(_))
      case other => throw new IllegalArgumentException(
        s"graft-geojson: unsupported geometry type '$other' (Point/Polygon/LineString/MultiPoint)")
    }
    new GenericArrayData(ring.map { pt =>
      new GenericInternalRow(Array[Any](pt.get(0).asDouble(), pt.get(1).asDouble()))
    }.toArray[Any])
  }

  private def fieldValue(feat: JsonNode, f: StructField): Any = f.name match {
    case "geometry_type" => UTF8String.fromString(feat.get("geometry").get("type").asText())
    case "ring" => ringOf(feat.get("geometry"))
    case prop =>
      val v = feat.get("properties").get(prop)
      if (v == null || v.isNull) null
      else f.dataType match {
        case StringType => UTF8String.fromString(v.asText())
        case LongType => v.asLong()
        case DoubleType => v.asDouble()
        case BooleanType => v.asBoolean()
        case other => throw new IllegalStateException(
          s"graft-geojson: unsupported type $other for property $prop")
      }
  }

  override def next(): Boolean =
    if (!feats.hasNext) false
    else {
      val feat = feats.next()
      current = new GenericInternalRow(
        required.fields.map(fieldValue(feat, _)).toArray[Any])
      true
    }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
