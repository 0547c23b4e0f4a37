package graft

import graft.ops.Ingest

/** DataSource V2 paginated connector: partition-per-page planning,
  * truncation cap, null/missing-key parsing, and end-to-end
  * equivalence with the from_json pipeline. */
class PagedSourceSpec extends SparkSpec {

  private def read(pageSize: Int, maxRecords: Int) =
    spark.read.format("graft.sources.PagedJsonSource")
      .option("page_size", pageSize).option("max_records", maxRecords).load()

  test("reads the full fixture with the declared explicit schema") {
    val df = read(3, 500)
    assert(df.count() == Ingest.fixture.size)
    assert(df.schema == Ingest.samSchema)
  }

  test("partition count = ceil(records/page_size) (parallel page fetch)") {
    assert(read(3, 500).rdd.getNumPartitions == 3) // 9 records / 3 per page
    assert(read(4, 500).rdd.getNumPartitions == 3)
    assert(read(100, 500).rdd.getNumPartitions == 1)
  }

  test("max_records truncation (reference MAX_RECORDS cap, :54)") {
    assert(read(2, 5).count() == 5)
    assert(read(2, 5).rdd.getNumPartitions == 3) // 2+2+1
  }

  test("JSON null and missing keys surface as SQL NULL") {
    val df = read(100, 500)
    val n4 = df.filter(df("noticeId") === "N004").collect().head
    assert(n4.isNullAt(n4.fieldIndex("typeOfSetAsideDescription")))
    val n7 = df.filter(df("noticeId") === "N007").collect().head
    assert(n7.isNullAt(n7.fieldIndex("officeAddress")))
    assert(n7.isNullAt(n7.fieldIndex("naicsCode")))
  }

  test("source -> transform chain == from_json pipeline output") {
    val viaSource = SparkEntry.queries("q_rest_ingest")(spark, "")
      .collect().map(_.toSeq).toSeq
    val viaJson = Ingest.pipeline(spark).collect().map(_.toSeq).toSeq
    assert(viaSource == viaJson)
    assert(viaSource.size == 5)
  }
}
