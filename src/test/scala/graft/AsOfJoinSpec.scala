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

  test("property: equals brute force on random frames (simultaneous rows, duplicate right times, empty right)") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    // tiny key/time domains force the boundary conditions: exact
    // left≡right ties, multiple right rows at one (key, time), keys
    // present on only one side, and (at n=0) an empty right side
    val key = Gen.chooseNum(0L, 2L)
    val time = Gen.chooseNum(0, 8)
    def rows[A](g: Gen[A]) = Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, g))
    val leftGen = rows(Gen.zip(key, time))
    val rightGen = rows(Gen.zip(key, time, Gen.chooseNum(0, 4)))
    val prop = forAll(leftGen, rightGen) { (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, new Timestamp(t * 1000L)) }
        .toDF("event_id", "user_id", "ts")
      val right = rs.map { case (k, t, v) => (k, new Timestamp(t * 1000L), v.toDouble) }
        .toDF("user_id", "ts", "value")
      val got = AsOfJoin.asofJoinLast(left, right, Seq("user_id"), "ts", Seq("value"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      // one output row per left row, and each value is SOME right row
      // at the max time ≤ the left time for that key (duplicate right
      // times make the survivor ambiguous — as in DuckDB ASOF — so
      // membership in the max-time value set is the checkable law)
      got.size == ls.length && ls.zipWithIndex.forall { case ((k, t), i) =>
        val cand = rs.filter { case (rk, rt, _) => rk == k && rt <= t }
        if (cand.isEmpty) got(i.toLong).isEmpty
        else {
          val maxT = cand.map(_._2).max
          val valid = cand.collect { case (_, rt, v) if rt == maxT => v.toDouble }.toSet
          got(i.toLong).exists(valid.contains)
        }
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(r.passed, r.status.toString)
  }

  test("property: forward as-of equals brute force on random frames") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val key = Gen.chooseNum(0L, 2L)
    val time = Gen.chooseNum(0, 8)
    def rows[A](g: Gen[A]) = Gen.chooseNum(0, 10).flatMap(n => Gen.listOfN(n, g))
    val leftGen = rows(Gen.zip(key, time))
    val rightGen = rows(Gen.zip(key, time, Gen.chooseNum(0, 4)))
    val prop = forAll(leftGen, rightGen) { (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, new Timestamp(t * 1000L)) }
        .toDF("event_id", "user_id", "ts")
      val right = rs.map { case (k, t, v) => (k, new Timestamp(t * 1000L), v.toDouble) }
        .toDF("user_id", "ts", "value")
      val got = AsOfJoin.asofJoinLast(left, right, Seq("user_id"), "ts", Seq("value"),
        forward = true)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      // mirror law: each value is some right row at the MIN time >=
      // the left time for that key
      got.size == ls.length && ls.zipWithIndex.forall { case ((k, t), i) =>
        val cand = rs.filter { case (rk, rt, _) => rk == k && rt >= t }
        if (cand.isEmpty) got(i.toLong).isEmpty
        else {
          val minT = cand.map(_._2).min
          val valid = cand.collect { case (_, rt, v) if rt == minT => v.toDouble }.toSet
          got(i.toLong).exists(valid.contains)
        }
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(r.passed, r.status.toString)
  }

  test("empty right side yields all-null as-of values (left outer)") {
    val left = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq.empty[(Long, Timestamp, Double)].toDF("user_id", "ts", "value")
    val got = AsOfJoin.asofJoinLast(left, right, Seq("user_id"), "ts", Seq("value")).collect()
    assert(got.length == 1 && got(0).isNullAt(3))
  }

  test("matches DuckDB ASOF semantics shape on the real events table (smoke)") {
    val df = SparkEntry.queries("q_asof_join")(spark, sf001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // purchases with a prior click have non-null values; output keyed once per purchase
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }

  // --- custom physical operator (graft.plans.AsofJoinExec) -------------

  test("custom exec == window composition on the fixture, both directions") {
    val left = Seq(
      (1L, 7L, ts("2024-01-01 10:00:00")),
      (2L, 7L, ts("2024-01-01 12:00:00")),
      (3L, 8L, ts("2024-01-01 11:00:00")),
      (4L, 7L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts("2024-01-01 09:30:00"), 10.0),
      (7L, ts("2024-01-01 10:00:00"), 20.0),
      (7L, ts("2024-01-01 11:30:00"), 30.0),
      (8L, ts("2024-01-01 12:00:00"), 99.0)
    ).toDF("user_id", "ts", "value")
    for (fwd <- Seq(false, true)) {
      val a = graft.plans.AsofJoinPlan
        .join(left, right, Seq("user_id"), "ts", Seq("value"), forward = fwd)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      val b = AsOfJoin.asofJoinLast(left, right, Seq("user_id"), "ts",
          Seq("value"), forward = fwd)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
      assert(a == b, s"forward=$fwd: $a vs $b")
    }
    // inclusive tie pinned explicitly on the exec path
    val backward = graft.plans.AsofJoinPlan
      .join(left, right, Seq("user_id"), "ts", Seq("value"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(backward(1L) == Some(20.0) && backward(3L).isEmpty)
  }

  test("custom exec == window composition on the events table; plan has the exec, no window") {
    val events = Tables.load(spark, sf001, "events")
    val purchases = events.filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val clicks = events.filter(org.apache.spark.sql.functions.col("event_type") === "click")
      .select("user_id", "ts", "value")
    val exec = graft.plans.AsofJoinPlan
      .join(purchases, clicks, Seq("user_id"), "ts", Seq("value"))
    val p = exec.queryExecution.executedPlan.toString
    assert(p.contains("AsofJoin"), p.take(500))
    assert(!p.contains("Window"), "the exec path must not fall back to a window")
    val a = exec.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .sortBy(_._1).toSeq
    val b = AsOfJoin.asofJoinLast(purchases, clicks, Seq("user_id"), "ts", Seq("value"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .sortBy(_._1).toSeq
    assert(a == b)
  }

  test("custom exec: empty right side yields all-null left outer") {
    val left = Seq((1L, 7L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq.empty[(Long, Timestamp, Double)].toDF("user_id", "ts", "value")
    val rows = graft.plans.AsofJoinPlan
      .join(left, right, Seq("user_id"), "ts", Seq("value")).collect()
    assert(rows.length == 1 && rows.head.isNullAt(3))
  }

  test("custom exec property: equals the window form on random frames") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val gen = for {
      nl <- Gen.choose(0, 30); nr <- Gen.choose(0, 30)
      ls <- Gen.listOfN(nl, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 8L)))
      rs <- Gen.listOfN(nr, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 8L), Gen.choose(0L, 99L)))
    } yield (ls, rs)
    val prop = forAll(gen) { case (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t * 1000L) }
        .toDF("event_id", "user_id", "t")
      val right = rs.map { case (k, t, v) => (k, t * 1000L, v) }
        .toDF("user_id", "t", "value")
      val a = graft.plans.AsofJoinPlan
        .join(left, right, Seq("user_id"), "t", Seq("value"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      val b = AsOfJoin.asofJoinLast(left, right, Seq("user_id"), "t", Seq("value"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
      a == b
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
