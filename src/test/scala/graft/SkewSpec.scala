package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

/** Salted two-phase aggregation equals the direct aggregation on a
  * pathologically skewed frame (one key holds 90% of rows). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted count+sum == direct groupBy on 90%-skewed keys") {
    val rows = (0 until 9000).map(i => ("hot", i.toLong, 1.0)) ++
      (0 until 1000).map(i => (s"k${i % 50}", 9000L + i, 2.0))
    val df = rows.toDF("key", "id", "v").repartition(8)
    val salted = Skew.saltedCountSum(df, "key", "id", "v")
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val direct = df.groupBy("key")
      .agg(count(lit(1)).as("cnt"), sum("v").as("total"))
      .orderBy("key").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(salted == direct)
    assert(salted.exists { case (k, c, _) => k == "hot" && c == 9000L })
  }

  test("phase-1 spreads the hot key across all salt buckets") {
    val rows = (0 until 8000).map(i => ("hot", i.toLong, 1.0))
    val df = rows.toDF("key", "id", "v")
    val buckets = df.withColumn("s", Skew.salt(col("id"), 16))
      .groupBy("s").count().select("count").as[Long].collect()
    assert(buckets.length == 16)
    // roughly even: no bucket more than 3x the mean
    assert(buckets.max < 3 * (8000 / 16))
  }
}
