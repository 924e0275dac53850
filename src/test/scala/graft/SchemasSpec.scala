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

  test("conformance reports missing and mistyped columns") {
    import org.apache.spark.sql.types._
    val actual = StructType(Seq(StructField("doc_id", StringType)))
    val diffs = Schemas.conformance(Schemas.documents, actual)
    assert(diffs.exists(_.contains("doc_id")) && diffs.exists(_.startsWith("missing")))
  }
}
