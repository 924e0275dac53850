package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipInputStream

/** Sources (SURVEY.md §2.1). The reference's scans are MS Access dumps,
  * ODBC `select *`, REST CSV/JSON and binary snapshots; here each maps to
  * the Spark reader that keeps pushdown and pruning intact.
  *
  * Scale notes:
  *  - parquet/csv readers take explicit schemas where the caller knows
  *    them (no inference pass over 100 TB).
  *  - the JDBC reader exposes partitioned parallel reads — a single-task
  *    JDBC scan is the classic ingest bottleneck; with (column, lower,
  *    upper, numPartitions) Spark issues range-partitioned queries and
  *    pushes filters down to the database (the opposite of the
  *    reference's client-side-everything anti-pattern,
  *    tagging-etl.Rmd:64-66).
  */
object Sources {

  /** S1/S8: parquet scan / checkpoint load. */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S6/S7: header CSV scan, schema optional (inferred when absent —
    * fine for dimension-sized files, pass a schema for big ones). */
  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", true)
    schema.fold(r.option("inferSchema", true))(r.schema).csv(path)
  }

  /** S3: JDBC table scan with optional range partitioning. */
  def jdbc(spark: SparkSession, url: String, table: String,
           props: java.util.Properties = new java.util.Properties(),
           partitioning: Option[(String, Long, Long, Int)] = None): DataFrame =
    partitioning match {
      case Some((column, lower, upper, n)) =>
        spark.read.jdbc(url, table, column, lower, upper, n, props)
      case None => spark.read.jdbc(url, table, props)
    }

  /** S3 on the DSv2 path: registers (idempotently) a JDBC catalog and
    * returns the table through it. Unlike the V1 `spark.read.jdbc`
    * scan — which pushes only filters — the V2 catalog scan pushes
    * AGGREGATES, LIMITs, and sorts into the database, so a tally over
    * a remote table ships back one row per group instead of the table:
    * at a 100 TB-warehouse's dimension store that is the difference
    * between a metadata query and an export job. */
  def jdbcCatalogTable(spark: SparkSession, catalog: String, url: String,
                       driver: String, table: String): DataFrame = {
    spark.conf.set(s"spark.sql.catalog.$catalog",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$catalog.url", url)
    spark.conf.set(s"spark.sql.catalog.$catalog.driver", driver)
    spark.conf.set(s"spark.sql.catalog.$catalog.pushDownAggregate", "true")
    spark.conf.set(s"spark.sql.catalog.$catalog.pushDownLimit", "true")
    spark.table(s"$catalog.$table")
  }

  /** S2: snapshot staging — unzip a fetched archive into a staging dir
    * (ningaloo-etl.Rmd:47-53's download+unzip, minus the HTTP fetch which
    * is environment I/O). Returns the extracted file paths. */
  def stageZip(zipPath: String, stagingDir: String): Seq[String] = {
    // Normalize to an absolute base so the zip-slip check below compares
    // clean paths (a staging dir spelled with ".." would otherwise make
    // legitimate entries fail the startsWith test).
    val dir = Paths.get(stagingDir).toAbsolutePath.normalize()
    Files.createDirectories(dir)
    val zin = new ZipInputStream(Files.newInputStream(Paths.get(zipPath)))
    try {
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null).flatMap { e =>
        if (e.isDirectory) None
        else {
          val target = dir.resolve(e.getName).normalize()
          require(target.startsWith(dir), s"zip entry escapes staging dir: ${e.getName}")
          Files.createDirectories(target.getParent)
          val out = new BufferedOutputStream(new FileOutputStream(target.toFile))
          try {
            val buf = new Array[Byte](8192)
            Iterator.continually(zin.read(buf)).takeWhile(_ >= 0)
              .foreach(n => out.write(buf, 0, n))
          } finally out.close()
          Some(target.toString)
        }
      }.toList
    } finally zin.close()
  }
}
