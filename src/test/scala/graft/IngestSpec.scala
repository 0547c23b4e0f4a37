package graft

import graft.ops.Ingest

/** Golden test: the SAM fixture through the full E1/E2 chain
  * (SURVEY.md §5 item 4) — pins every FIXTURES.md §A1 edge row. */
class IngestSpec extends SparkSpec {

  lazy val rows = Ingest.pipeline(spark).collect()
  private def byId(id: String) = rows.find(_.getAs[String]("noticeId") == id).get

  test("survivors and global order (filter -> dropna -> score -> sort)") {
    assert(rows.map(_.getAs[String]("noticeId")).toSeq ==
      Seq("N007", "N001", "N008", "N002", "N006"))
  }

  test("N003 (non-veteran) and N004 (null set-aside) filtered out; N005 (null title) and N009 (null postedDate) dropped") {
    val ids = rows.map(_.getAs[String]("noticeId")).toSet
    assert(Seq("N003", "N004", "N005", "N009").forall(!ids.contains(_)))
  }

  test("N007: same-day post scores 5; absent officeAddress/naics default empty") {
    val r = byId("N007")
    assert(r.getAs[Long]("recencyScore") == 5L)
    assert(r.getAs[Long]("daysSincePosted") == 0L)
    assert(r.getAs[String]("city") == "")
    assert(r.getAs[String]("state") == "")
    assert(r.getAs[String]("naicsCode") == "")
    assert(!r.getAs[Boolean]("hasNAICS"))
    assert(r.getAs[String]("naicsDescription") == "Other")
  }

  test("N006: malformed date kept with null timestamp, score 1, not recent; blank naics -> Other") {
    val r = byId("N006")
    assert(r.isNullAt(r.fieldIndex("postedDate")))
    assert(r.isNullAt(r.fieldIndex("daysSincePosted")))
    assert(r.getAs[Long]("recencyScore") == 1L)
    assert(!r.getAs[Boolean]("isRecent"))
    assert(!r.getAs[Boolean]("hasNAICS"))
    assert(r.getAs[String]("naicsDescription") == "Other")
  }

  test("N001: trim + dim join + upper(state)") {
    val r = byId("N001")
    assert(r.getAs[String]("solicitationNumber") == "S-001") // trimmed
    assert(r.getAs[String]("state") == "TX")                 // uppercased
    assert(r.getAs[String]("naicsDescription") == "Custom Computer Programming")
    assert(r.getAs[Long]("recencyScore") == 4L)              // 2 days
    assert(r.getAs[Boolean]("isRecent"))
    assert(r.getAs[Boolean]("hasNAICS"))
  }

  test("N002: unmapped naics -> Other; 6 days -> score 2, still recent") {
    val r = byId("N002")
    assert(r.getAs[String]("naicsDescription") == "Other")
    assert(r.getAs[Long]("recencyScore") == 2L)
    assert(r.getAs[Boolean]("isRecent"))
  }

  test("N008: mapped 561730 -> Landscaping Services; 4 days -> score 3") {
    val r = byId("N008")
    assert(r.getAs[String]("naicsDescription") == "Landscaping Services")
    assert(r.getAs[Long]("recencyScore") == 3L)
    assert(r.getAs[String]("state") == "CA")
  }
}
