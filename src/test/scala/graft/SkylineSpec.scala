package graft

import org.apache.spark.sql.functions._

/** Skyline operator: hand-built frontier cases (ties, duplicates,
  * dominated columns) plus equivalence with the definitional
  * quadratic dominance anti-join at sf0.001. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  test("skyline2d keeps exactly the undominated set, duplicates included") {
    // frontier: (1,9), (3,4), (7,1) and BOTH copies of (3,4).
    // (3,9) is dominated by (1,9) on x (tie on y ⇒ strict on x);
    // (3,5) is dominated in-group by (3,4); (8,1) by (7,1).
    val pts = Seq(
      (1L, 1L, 9L), (2L, 3L, 4L), (3L, 3L, 4L), (4L, 3L, 5L),
      (5L, 3L, 9L), (6L, 7L, 1L), (7L, 8L, 1L), (8L, 9L, 9L))
      .toDF("id", "x", "y")
    val got = ops.Skyline.skyline2d(pts, "x", "y")
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 6L))
  }

  test("skyline2d on a single point and on an empty frame") {
    val one = Seq((1L, 5L, 5L)).toDF("id", "x", "y")
    assert(ops.Skyline.skyline2d(one, "x", "y").count() == 1)
    assert(ops.Skyline.skyline2d(one.limit(0), "x", "y").count() == 0)
  }

  test("q_skyline == quadratic dominance anti-join at sf0.001") {
    val p = Tables.load(spark, sf001, "part").select(
      col("p_partkey"),
      round(col("p_retailprice") * 100, 0).cast("long").as("pc"),
      col("p_size").cast("long").as("sz"))
    val brute = p.as("a").join(p.as("b"),
        col("b.pc") <= col("a.pc") && col("b.sz") <= col("a.sz") &&
          (col("b.pc") < col("a.pc") || col("b.sz") < col("a.sz")),
        "left_anti")
      .select(col("a.p_partkey"), col("a.pc"), col("a.sz"))
      .as[(Long, Long, Long)].collect().toSet
    val got = SparkEntry.queries("q_skyline")(spark, sf001)
      .as[(Long, Long, Long)].collect()
    assert(got.toSet == brute)
    assert(got.nonEmpty)
    // frontier is strictly decreasing in y as x grows (per distinct x)
    val byX = got.groupBy(_._2).map { case (x, rows) => (x, rows.map(_._3).min) }
      .toSeq.sortBy(_._1)
    assert(byX.map(_._2) == byX.map(_._2).scanLeft(Long.MaxValue)(math.min).tail)
  }
}
