package graft

import java.sql.Timestamp
import graft.llm.Events

/** Transition-matrix semantics on a hand-computed event stream. */
class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Int) = new Timestamp(s * 1000L)

  test("transitions pair consecutive events per user, permille sums per source") {
    // user 1: view -> click -> view   user 2: view -> click
    // pairs: (view,click) x2, (click,view) x1
    val events = Seq(
      (1L, ts(10), 1L, "view"),
      (2L, ts(20), 1L, "click"),
      (3L, ts(30), 1L, "view"),
      (4L, ts(15), 2L, "view"),
      (5L, ts(25), 2L, "click")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.transitionsOf(events)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSet == Set(
      ("click", "view", 1L, 1000L),
      ("view", "click", 2L, 1000L)))
  }

  test("ties on ts break on event_id, users never cross") {
    // same timestamp: event_id order decides the sequence
    val events = Seq(
      (2L, ts(10), 1L, "b"),
      (1L, ts(10), 1L, "a"),
      (3L, ts(10), 2L, "c") // lone event, no pair
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.transitionsOf(events)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", "b", 1L)))
  }

  test("date spine: dense day coverage, gaps zero-filled and flagged") {
    val out = Events.dateSpine.fn(spark, sf001).collect()
    val days = out.map(_.getAs[java.sql.Date]("day").toLocalDate)
    // dense: consecutive days, no holes, spanning the table's range
    days.sliding(2).foreach { case Array(a, b) =>
      assert(b == a.plusDays(1), s"spine hole between $a and $b")
    }
    out.foreach { r =>
      if (r.getAs[Boolean]("is_gap")) {
        assert(r.getAs[Long]("n_purchases") == 0L)
        assert(r.getAs[Long]("revenue_cents") == 0L)
      } else assert(r.getAs[Long]("n_purchases") > 0L)
    }
    // the sf0.001 series is entirely below the threshold: every day
    // is a gap, the degenerate all-zero spine must still be dense
    assert(out.nonEmpty)
  }
}
