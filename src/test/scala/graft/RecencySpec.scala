package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.ops.Recency

/** Pins the null/edge semantics SURVEY.md §2 documents for the
  * F5-F8 scalar family (pandas NaN-comparison parity). */
class RecencySpec extends SparkSpec {
  import spark.implicits._

  private def scoreOf(days: java.lang.Integer): Int = {
    Seq(Tuple1(days)).toDF("d")
      .select(Recency.score(col("d"), Seq(1, 3, 5, 7)).as("s"))
      .collect().head.getInt(0)
  }

  test("recency ladder boundaries (reference :102-112)") {
    assert(scoreOf(0) == 5)
    assert(scoreOf(1) == 5)
    assert(scoreOf(2) == 4)
    assert(scoreOf(3) == 4)
    assert(scoreOf(4) == 3)
    assert(scoreOf(5) == 3)
    assert(scoreOf(6) == 2)
    assert(scoreOf(7) == 2)
    assert(scoreOf(8) == 1)
    assert(scoreOf(10000) == 1)
  }

  test("null days -> bottom score 1 (pandas NaT => else-branch)") {
    assert(scoreOf(null) == 1)
  }

  test("ladder is monotone non-increasing in days") {
    val scores = (0 to 30).map(d => scoreOf(d))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("isRecent: null-safe false on null days (pandas NaN<=x is False)") {
    val rows = Seq[(java.lang.Integer)](3, 8, null).map(Tuple1(_)).toDF("d")
      .select(Recency.isRecent(col("d"), 7).as("r")).collect().map(_.getBoolean(0))
    assert(rows.toSeq == Seq(true, false, false))
  }

  test("nonBlank: blank/whitespace/null all false, text true (reference :90)") {
    val rows = Seq("x", "  ", "", null).map(Tuple1(_)).toDF("s")
      .select(Recency.nonBlank(col("s")).as("b")).collect().map(_.getBoolean(0))
    assert(rows.toSeq == Seq(true, false, false, false))
  }

  test("daysSince day granularity") {
    val d = Seq(Tuple1("2001-08-01")).toDF("s")
      .select(Recency.daysSince(lit("2001-08-05"), col("s").cast("timestamp")).as("d"))
      .collect().head.getInt(0)
    assert(d == 4)
  }
}
