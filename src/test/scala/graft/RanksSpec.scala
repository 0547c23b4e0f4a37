package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed total-order primitive (ops.Ranks.globalOrder) must
  * be bit-identical to the single-task unpartitioned-window spelling
  * it replaces — including under heavy ties, descending keys, and
  * fewer rows than partitions. */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  test("globalOrder rank ≡ row_number over an unpartitioned window (heavy ties)") {
    // 2000 rows, only 7 distinct sort values -> every range boundary
    // falls inside a tie run; the unique id breaks ties
    val df = (0 until 2000).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "v")
    val w = Window.orderBy(col("v").asc, col("id").asc)
    val expected = df.withColumn("r", row_number().over(w).cast("long"))
      .select("id", "r").as[(Long, Long)].collect().toMap
    val got = ops.Ranks.globalOrder(df, Seq(col("v").asc, col("id").asc), "r")
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("globalOrder running sum ≡ windowed cumulative sum, descending key") {
    val df = (0 until 500).map(i => (i.toLong, ((i * 37) % 11 + 1).toLong))
      .toDF("id", "v")
    val w = Window.orderBy(col("v").desc, col("id").asc)
    val expected = df
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("c", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "r", "c").as[(Long, Long, Long)].collect().toSet
    val got = ops.Ranks.globalOrder(df, Seq(col("v").desc, col("id").asc), "r",
        runningSum = Some((col("v"), "c")))
      .select("id", "r", "c").as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("globalOrder handles fewer rows than shuffle partitions") {
    val df = Seq((3L, 30L), (1L, 10L), (2L, 20L)).toDF("id", "v")
    val got = ops.Ranks.globalOrder(df, Seq(col("v").asc, col("id").asc), "r")
      .select("id", "r").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 2L), (3L, 3L)))
  }
}
