package graft

import java.sql.Timestamp
import graft.ops.AsOfJoin

/** As-of join semantics on a hand-computed fixture: inclusive ties,
  * latest-prior selection, left-outer nulls, key isolation. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("picks latest right row at-or-before each left time, per key") {
    val left = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 12:00:00")),
      (3L, 8L, ts("2024-01-01 11:00:00")), // user 8 has no prior click
      (4L, 7L, ts("2024-01-01 09:00:00"))  // before any click
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts("2024-01-01 09:30:00"), 10.0),
      (7L, ts("2024-01-01 10:00:00"), 20.0), // exactly simultaneous with event 1 -> visible
      (7L, ts("2024-01-01 11:30:00"), 30.0),
      (8L, ts("2024-01-01 12:00:00"), 99.0)  // after user 8's event
    ).toDF("user_id", "ts", "value")
    val got = AsOfJoin.asofJoinLast(left, right, Seq("user_id"), "ts", Seq("value"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(1L) == Some(20.0)) // inclusive tie
    assert(got(2L) == Some(30.0)) // latest prior
    assert(got(3L) == None)       // nothing at-or-before for user 8
    assert(got(4L) == None)       // before any right row
  }

  test("matches DuckDB ASOF semantics shape on the real events table (smoke)") {
    val df = SparkEntry.queries("q_asof_join")(spark, sf001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // purchases with a prior click have non-null values; output keyed once per purchase
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }
}
