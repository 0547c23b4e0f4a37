package graft

import org.apache.spark.sql.functions._

/** Range-join equivalence and plan-shape guards (ops.RangeJoin). */
class RangeJoinSpec extends SparkSpec {

  test("binned range join ≡ naive quadratic join") {
    val ev = Tables.load(spark, sf001, "events")
      .select("user_id", "event_id", "ts")
    val fast = ops.RangeJoin.pairsWithin(ev, 1800)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = ev.as("a")
    val b = ev.select(col("user_id").as("u2"), col("event_id").as("e2"),
      col("ts").as("t2"))
    val naive = a.join(b,
        col("user_id") === col("u2") && col("event_id") < col("e2") &&
          abs(unix_timestamp(col("ts")) - unix_timestamp(col("t2"))) <= 1800)
      .select(col("event_id"), col("e2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "the sf0.001 corpus has in-window pairs")
    assert(fast == naive)
  }

  test("binned range join ≡ naive join on random frames (property)") {
    import org.scalacheck.Prop.forAll
    import org.scalacheck.{Gen, Test => SCTest}
    import spark.implicits._
    // events clustered tightly in time so window boundaries (dt
    // exactly == window, same-second ties, same-user bursts) are hit
    val gen = Gen.listOfN(60, for {
      user <- Gen.chooseNum(1L, 4L)
      sec <- Gen.chooseNum(0L, 400L)
    } yield (user, sec))
    val p = forAll(gen) { evs =>
      val df = evs.zipWithIndex
        .map { case ((u, sec), i) => (u, i.toLong, new java.sql.Timestamp(sec * 1000)) }
        .toDF("user_id", "event_id", "ts")
      val fast = ops.RangeJoin.pairsWithin(df, 100)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val naive = evs.zipWithIndex.flatMap { case ((u1, s1), i1) =>
        evs.zipWithIndex.collect {
          case ((u2, s2), i2) if u1 == u2 && i1 < i2 && math.abs(s1 - s2) <= 100 =>
            (i1.toLong, i2.toLong)
        }
      }.toSet
      fast == naive
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), p)
    assert(r.passed, r.status.toString)
  }

  test("binned range join never plans a nested-loop or cartesian join") {
    val df = SparkEntry.queries("q_range_join")(spark, sf001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("BinnedRangeJoinRule rewrites a naive range join and preserves its result") {
    val ev = Tables.load(spark, sf001, "events")
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"))
    val b = ev.select(col("user_id").as("u2"), col("event_id").as("e2"),
      col("sec").as("s2"))
    def naive() = ev.join(b,
      col("user_id") === col("u2") && col("event_id") < col("e2") &&
        abs(col("sec") - col("s2")) <= lit(1800L))
      .select(col("event_id"), col("e2"))
    // rule off: baseline rows
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      before.filterNot(_ == plans.BinnedRangeJoinRule)
    val expected = naive().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ plans.BinnedRangeJoinRule
      val df = naive()
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, "rule-on rows == rule-off rows")
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains(plans.BinnedRangeJoinRule.ProbeBinName),
        s"rewrite did not fire:\n$opt")
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("Generate"), p)
    } finally {
      spark.experimental.extraOptimizations = before
    }
  }

  /** Shared harness for the new conjunct spellings: build the naive
    * join under `cond`, check rule-off rows == rule-on rows AND that
    * the rewrite fired (probe-bin attribute + Generate in the plan). */
  private def checkRewrite(mkCond: (
      org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column): Unit = {
    val ev = Tables.load(spark, sf001, "events")
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"))
    val b = ev.select(col("user_id").as("u2"), col("event_id").as("e2"),
      col("sec").as("s2"))
    def naive() = ev.join(b,
      col("user_id") === col("u2") && col("event_id") < col("e2") &&
        mkCond(col("sec"), col("s2")))
      .select(col("event_id"), col("e2"))
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      before.filterNot(_ == plans.BinnedRangeJoinRule)
    val expected = naive().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ plans.BinnedRangeJoinRule
      val df = naive()
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, "rule-on rows == rule-off rows")
      assert(expected.nonEmpty, "fixture must produce in-window pairs")
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains(plans.BinnedRangeJoinRule.ProbeBinName),
        s"rewrite did not fire:\n$opt")
    } finally spark.experimental.extraOptimizations = before
  }

  test("rule fires on the BETWEEN form") {
    checkRewrite((a, b) => a.between(b - lit(1800L), b + lit(1800L)))
  }

  test("rule fires on the paired-inequality form") {
    checkRewrite((a, b) => a >= b - lit(1800L) && a <= b + lit(1800L))
  }

  test("rule fires on the subtraction-pair form") {
    checkRewrite((a, b) => a - b <= lit(1800L) && b - a <= lit(1800L))
  }

  test("rule fires on strict inequalities, tightened by one") {
    checkRewrite((a, b) => a < b + lit(1801L) && a > b - lit(1801L))
  }

  test("rule fires on an asymmetric window (bins at the wider bound)") {
    checkRewrite((a, b) => a - b <= lit(600L) && b - a <= lit(1800L))
  }

  test("rule fires on the mirrored strict side-window x < y − k") {
    // window [y−1800, y−600): LessThan(x, Subtract(y, k)) is the
    // mirror of the handled GreaterThan spelling
    checkRewrite((a, b) => a < b - lit(600L) && a > b - lit(1800L))
  }

  test("rule fires on the mirrored strict side-window x > y + k") {
    // roles swapped so the window agrees with the harness's
    // event_id < e2 orientation (ids correlate with time): the
    // conjuncts still parse as GreaterThan(x, Add(y, k)) /
    // LessThan(x, Add(y, k)) with x = the right side's seconds
    checkRewrite((a, b) => b > a + lit(600L) && b < a + lit(1800L))
  }

  test("rule fires on strict literal-on-left spellings") {
    checkRewrite((a, b) => lit(1800L) > a - b && lit(1800L) > b - a)
  }

  test("rule does NOT fire on a one-sided bound (unbounded range)") {
    val ev = Tables.load(spark, sf001, "events")
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("sec"))
    val b = ev.select(col("user_id").as("u2"), col("event_id").as("e2"),
      col("sec").as("s2"))
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      before.filterNot(_ == plans.BinnedRangeJoinRule) :+ plans.BinnedRangeJoinRule
    try {
      val df = ev.join(b,
        col("user_id") === col("u2") && col("sec") <= col("s2") + lit(1800L))
      val opt = df.queryExecution.optimizedPlan.toString
      assert(!opt.contains(plans.BinnedRangeJoinRule.ProbeBinName),
        s"one-sided bound must not be binned:\n$opt")
    } finally spark.experimental.extraOptimizations = before
  }

  test("q_range_join_between ≡ hand-built q_range_join output, rewrite fires") {
    val between = SparkEntry.queries("q_range_join_between")(spark, sf001)
    val hand = SparkEntry.queries("q_range_join")(spark, sf001).collect()
    assert(between.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      hand.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    assert(between.queryExecution.optimizedPlan.toString
      .contains(plans.BinnedRangeJoinRule.ProbeBinName))
  }

  test("q_range_join_auto rewrite ≡ hand-built q_range_join output") {
    val auto = SparkEntry.queries("q_range_join_auto")(spark, sf001).collect()
    val hand = SparkEntry.queries("q_range_join")(spark, sf001).collect()
    assert(auto.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      hand.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }
}
