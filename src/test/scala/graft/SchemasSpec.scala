package graft

/** The declared schemas must conform to the driver's actual testdata, and
  * the typed Dataset views must decode. */
class SchemasSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("testdata tables conform to declared schemas") {
    assert(Schemas.conformance(Schemas.documents,
      Tables.documents(spark, sf).schema).isEmpty)
    assert(Schemas.conformance(Schemas.embeddings,
      Tables.embeddings(spark, sf).schema).isEmpty)
    assert(Schemas.conformance(Schemas.events,
      Tables.events(spark, sf).schema).isEmpty)
  }

  test("typed Dataset views decode and filter with compile-time fields") {
    val docs = Schemas.documentsDs(spark, sf)
    val longDocs = docs.filter(_.n_chars > 100).count()
    assert(longDocs > 0 && longDocs <= docs.count())
    val emb = Schemas.embeddingsDs(spark, sf).head()
    assert(emb.embedding.length == 64)
    val ev = Schemas.eventsDs(spark, sf).head()
    assert(ev.event_id >= 0)
  }

  test("testdata timestamp columns decode to plausible instants") {
    // The r9 data regen changed events.ts's parquet time unit and the
    // loader silently compressed 30 days into 43 minutes — schema
    // conformance alone cannot catch a unit misread, so pin VALUE
    // plausibility for every timestamp the queries derive dates from.
    import org.apache.spark.sql.functions._
    def span(df: org.apache.spark.sql.DataFrame, c: String): (Int, Int) = {
      val r = df.agg(year(min(col(c))), year(max(col(c)))).head()
      (r.getInt(0), r.getInt(1))
    }
    val (oLo, oHi) = span(Tables.orders(spark, sf), "o_orderdate")
    assert(oLo >= 1990 && oHi <= 2030 && oHi > oLo,
      s"o_orderdate span [$oLo,$oHi] implausible — unit/type misread?")
    val (lLo, lHi) = span(Tables.lineitem(spark, sf), "l_shipdate")
    assert(lLo >= 1990 && lHi <= 2030 && lHi > lLo,
      s"l_shipdate span [$lLo,$lHi] implausible — unit/type misread?")
    val (eLo, eHi) = span(Tables.events(spark, sf), "ts")
    assert(eLo >= 2000 && eHi <= 2100,
      s"events.ts span [$eLo,$eHi] implausible — unit/type misread?")
  }

  test("conformance reports missing and mistyped columns") {
    import org.apache.spark.sql.types._
    val actual = StructType(Seq(StructField("doc_id", StringType)))
    val diffs = Schemas.conformance(Schemas.documents, actual)
    assert(diffs.exists(_.contains("doc_id")) && diffs.exists(_.startsWith("missing")))
  }
}
