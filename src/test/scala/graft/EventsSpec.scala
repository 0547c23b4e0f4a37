package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
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

  test("interval merge == brute-force coverage on seeded random intervals") {
    // the running-max sweep must agree with per-second brute force on
    // arbitrary overlap patterns (nesting, chains, duplicates, gaps)
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(7)
    val span = 50L
    val rows = (0 until 300).map { i =>
      (i.toLong, (i % 5).toLong, rnd.nextInt(2000).toLong)
    } // (event_id, user_id, start-second)
    val order = Window.partitionBy("user_id").orderBy(col("s0").asc, col("event_id").asc)
    val prevMax = max(col("e0")).over(order.rowsBetween(Window.unboundedPreceding, -1))
    val got = rows.toDF("event_id", "user_id", "s0")
      .withColumn("e0", col("s0") + span)
      .withColumn("ni", when(col("s0") > coalesce(prevMax, lit(Long.MinValue)), 1L).otherwise(0L))
      .withColumn("island", sum(col("ni")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "island")
      .agg(min(col("s0")).as("s"), max(col("e0")).as("e"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("e") - col("s")).as("covered"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.groupBy(_._2).foreach { case (user, rs) =>
      val secs = rs.flatMap { case (_, _, s) => s until (s + span) }.toSet
      val (n, covered) = got(user)
      assert(covered == secs.size.toLong, s"user $user covered")
      // islands == number of maximal runs in the covered-second set
      val runs = secs.toSeq.sorted.foldLeft((0, Long.MinValue)) {
        case ((k, prev), s) => (if (s == prev + 1) k else k + 1, s)
      }._1
      assert(n == runs.toLong, s"user $user islands")
    }
  }

  test("A/B significance: integer decision matches the double z-test") {
    val out = Events.abTest.fn(spark, sf001).head()
    val (n1, c1, n2, c2) = (out.getAs[Long]("n1"), out.getAs[Long]("c1"),
      out.getAs[Long]("n2"), out.getAs[Long]("c2"))
    assert(n1 > 0 && n2 > 0 && c1 <= n1 && c2 <= n2)
    val p1 = c1.toDouble / n1; val p2 = c2.toDouble / n2
    val p = (c1 + c2).toDouble / (n1 + n2)
    val z2 = math.pow(p1 - p2, 2) / (p * (1 - p) * (1.0 / n1 + 1.0 / n2))
    assert(out.getAs[Boolean]("significant_95") == (z2 > 3.8416),
      s"integer test disagrees with double z² = $z2")
  }

  test("variant extraction == get_json_object on every event") {
    val ev = Tables.load(spark, sf001, "events")
    val mismatch = ev.select(
        expr("try_cast(get_json_object(props, '$.k') AS BIGINT)").as("a"),
        variant_get(parse_json(col("props")), "$.k", "bigint").as("b"))
      .filter(!(col("a") <=> col("b"))).count()
    assert(mismatch == 0L)
  }

  test("sliding window: every event lands in exactly two windows") {
    val n = Tables.load(spark, sf001, "events").count()
    val windowed = Events.slidingWindow.fn(spark, sf001)
      .agg(sum(col("cnt"))).head().getLong(0)
    assert(windowed == 2 * n, s"expected 2x$n memberships, got $windowed")
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

  test("attribution: every model's credit sums to exactly 1000 per conversion") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q_attribution")(spark, sf001)
    val row = df.agg(sum("first_permille"), sum("last_permille"),
      sum("linear_permille")).head()
    val (f, l, lin) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(f == l, s"first/last totals differ: $f vs $l")
    assert(f == lin, s"first/linear totals differ: $f vs $lin")
    assert(f > 0 && f % 1000 == 0, s"total credit is 1000 per conversion, got $f")
  }

  test("CUPED removes the pre-period bias the raw uplift carries") {
    import spark.implicits._
    // post = 3*pre exactly, plus a true effect of 7 cents on variant 1;
    // variant 1 also has shifted pre (the imbalance CUPED corrects)
    val users = Seq(
      (1L, 0L, 10L, 30L), (2L, 0L, 20L, 60L), (3L, 0L, 30L, 90L),
      (4L, 1L, 20L, 67L), (5L, 1L, 30L, 97L), (6L, 1L, 40L, 127L))
      .toDF("user_id", "variant", "pre", "post")
    val r = graft.llm.Events.cupedOf(users).head()
    val thetaNum = r.getAs[Long]("theta_num")
    val thetaDen = r.getAs[Long]("theta_den")
    assert(thetaNum == 10530L && thetaDen == 3300L, s"moments: $thetaNum/$thetaDen")
    val adj = r.getAs[Long]("adjusted_uplift_micro")
    val raw = r.getAs[Long]("raw_uplift_micro")
    assert(raw == 37000000L, s"raw uplift: $raw")
    val expect = math.round((37.0 - 10530.0 / 3300.0 * 10.0) * 1e6)
    assert(adj == expect, s"adjusted uplift: $adj vs $expect")
    // pooled theta over-corrects here (variant correlates with pre),
    // but adjusted must still land closer to the true effect of 7
    assert(math.abs(adj - 7000000L) < math.abs(raw - 7000000L))
  }

  test("Poisson bootstrap CI: ordered bounds that bracket the point estimate") {
    val out = llm.Events.bootstrapCi.fn(spark, sf001).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (typ, n, point, lo, med, hi) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(lo <= med && med <= hi, s"$typ: unordered CI ($lo, $med, $hi)")
      assert(lo <= point && point <= hi,
        s"$typ: point $point outside 95% CI [$lo, $hi]")
      // CI width scales like σ/√n — sanity-bound it: nonzero (the
      // resamples genuinely vary) and far below the data range
      assert(hi > lo, s"$typ: degenerate interval")
      assert(hi - lo < 40000L * 1000000L / math.max(1L, math.round(math.sqrt(n.toDouble))),
        s"$typ: CI width ${hi - lo} implausibly wide for n=$n")
    }
  }

  test("CUSUM change point lands on the last pre-shift day with the exact peak") {
    import java.sql.Timestamp
    // level 100 for days 1-5, level 200 for days 6-10: CUSUM walks to
    // -2500 at day 5 (S=1500, N=10, dev=±500) and back to 0
    def day(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val daily = (1 to 10).map(d =>
      ("x", day(d), if (d <= 5) 100L else 200L, 1L))
      .toDF("event_type", "day", "sd", "nd")
    val got = llm.Events.cusumDetect(daily).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(1) == 10L)
    assert(r.getTimestamp(2) == day(5), s"change day ${r.getTimestamp(2)}")
    assert(r.getLong(3) == 2500L, s"peak ${r.getLong(3)}")
    // a flat series peaks at zero: no spurious change signal
    val flat = (1 to 10).map(d => ("y", day(d), 100L, 1L))
      .toDF("event_type", "day", "sd", "nd")
    assert(llm.Events.cusumDetect(flat).head().getLong(3) == 0L)
  }

  test("Welch t-test matches the textbook hand computation") {
    // arms {10,12,14} vs {20,22,24}: equal sample variances 4,
    // v_i = 4/3 each, t = -10/sqrt(8/3) = -6.1237, Welch df = 4
    val users = Seq((true, 10L), (true, 12L), (true, 14L),
      (false, 20L), (false, 22L), (false, 24L)).toDF("arm_a", "spend")
    val r = llm.Events.welchOf(users).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getLong(2) == -6124L, s"t_milli ${r.getLong(2)}")
    assert(r.getLong(3) == 4000L, s"df_milli ${r.getLong(3)}")
  }

  test("EWMA: hand-checked integer recursion, per-group isolation, step response") {
    import java.sql.Timestamp
    def day(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val daily = Seq(
      ("a", day(1), 10L), ("a", day(2), 20L), ("a", day(3), 30L),
      ("b", day(1), 100L), ("b", day(2), 100L)
    ).toDF("event_type", "day", "x")
    val got = llm.Events.ewmaOf(daily).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10)) -> r.getLong(3)).toMap
    // e1 = 10·1000; e2 = (2·20000 + 8·10000) div 10; e3 = (2·30000 + 8·12000) div 10
    assert(got(("a", "2024-01-01")) == 10000L)
    assert(got(("a", "2024-01-02")) == 12000L)
    assert(got(("a", "2024-01-03")) == 15600L)
    // groups fold independently: a's values never leak into b's seed
    assert(got(("b", "2024-01-01")) == 100000L)
    assert(got(("b", "2024-01-02")) == 100000L)
    // a constant series is a fixpoint; a step converges toward the new
    // level without overshoot
    val step = ((1 to 5).map(d => ("s", day(d), 100L)) ++
      (6 to 15).map(d => ("s", day(d), 200L))).toDF("event_type", "day", "x")
    val es = llm.Events.ewmaOf(step).collect().map(_.getLong(3))
    assert(es.take(5).forall(_ == 100000L))
    assert(es.drop(5).zip(es.drop(6)).forall { case (p, n) => n >= p },
      "monotone approach to the step level")
    // ten steps close 1 - 0.8^10 ≈ 89.3% of the gap (floors shave a few milli)
    assert(es.last <= 200000L && es.last > 185000L,
      s"converged near the new level, got ${es.last}")
  }

  test("Holt: hand-checked level/trend recursion incl. negative-trend truncation") {
    import java.sql.Timestamp
    def day(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val daily = Seq(
      ("a", day(1), 10L), ("a", day(2), 20L), ("a", day(3), 30L),
      ("n", day(1), 7L), ("n", day(2), 3L), ("n", day(3), 3L)
    ).toDF("event_type", "day", "x")
    val got = llm.Events.holtOf(daily).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // rising series: l2=(2·20000+8·10000)/10, b2=(2·2000)/10, ...
    assert(got(("a", "2024-01-01")) == ((10000L, 0L, 10000L)))
    assert(got(("a", "2024-01-02")) == ((12000L, 400L, 12400L)))
    assert(got(("a", "2024-01-03")) == ((15920L, 1104L, 17024L)))
    // falling series pins TRUNCATION on negatives: at t3,
    // b = -2816/10 = -281 (floor would give -282) — Spark div and
    // DuckDB // both truncate toward zero, so the fold must too
    assert(got(("n", "2024-01-02")) == ((6200L, -160L, 6040L)))
    assert(got(("n", "2024-01-03"))._2 == -281L,
      s"negative trend must truncate toward zero, got ${got(("n", "2024-01-03"))}")
  }

  test("Holt tracks a linear ramp where EWMA lags behind it") {
    import java.sql.Timestamp
    def day(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val ramp = (1 to 28).map(d => ("r", day(d), 100L * d)).toDF("event_type", "day", "x")
    val holtLast = llm.Events.holtOf(ramp).collect().last
    val ewmaLast = llm.Events.ewmaOf(ramp).collect().last
    val next = 100L * 29 * 1000L // the true next value, in milli-cents
    val holtErr = math.abs(holtLast.getLong(5) - next)
    val ewmaErr = math.abs(ewmaLast.getLong(3) - next)
    // the trend accumulator closes the slope lag the single smoother
    // structurally cannot: EWMA trails a ramp by ~(1-α)/α = 4 slopes
    assert(holtErr * 4 < ewmaErr,
      s"Holt forecast err $holtErr must be well under EWMA err $ewmaErr")
  }

  test("Holt-Winters: seed semantics, hand-checked step, short-series edge") {
    import java.sql.Timestamp
    def day(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // 8 days: first 7 seed (m = mean), day 8 exercises one recursion step
    val xs = Seq(10L, 20L, 30L, 40L, 50L, 60L, 70L, 44L)
    val daily = xs.zipWithIndex.map { case (x, i) => ("a", day(i + 1), x) }
      .toDF("event_type", "day", "x")
    val got = llm.Events.holtWintersOf(daily).collect()
      .map(r => r.getTimestamp(1).toString.take(10) ->
        (r.getLong(3), r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getLong(6)))).toMap
    val m = xs.take(7).map(_ * 1000L).sum / 7 // 40000
    assert(got("2024-01-01") == ((m, 0L, 10000L - m, None)))
    // day 7 closes the first period: forecast = m + 0 + s_1
    assert(got("2024-01-07") == ((m, 0L, 70000L - m, Some(m + (10000L - m)))))
    // day 8 recursion: l = (2*(44000-s_1) + 8*m)/10, then b, s
    val s1 = 10000L - m
    val l8 = (2L * (44000L - s1) + 8L * m) / 10L
    val b8 = (2L * (l8 - m)) / 10L
    val s8 = (2L * (44000L - l8) + 8L * s1) / 10L
    val s2 = 20000L - m
    assert(got("2024-01-08") == ((l8, b8, s8, Some(l8 + b8 + s2))),
      s"got ${got("2024-01-08")}")
    // a series shorter than one period: seeds only, no forecast
    val short = (1 to 4).map(d => ("s", day(d), 100L * d)).toDF("event_type", "day", "x")
    val shortGot = llm.Events.holtWintersOf(short).collect()
    assert(shortGot.forall(_.isNullAt(6)))
    val ms = (1 to 4).map(_ * 100000L).sum / 4
    assert(shortGot.map(_.getLong(3)).forall(_ == ms))
  }

  test("Holt-Winters beats Holt on a weekly-periodic series") {
    import java.sql.Timestamp
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def day(d: Int) = new Timestamp(base + (d - 1) * 86400000L)
    // strong period-7 shape + mild trend, 8 full weeks
    val series = (1 to 56).map(d => ("w", day(d), 1000L + 10L * d +
      Seq(0L, 400L, 800L, 200L, -300L, -600L, -500L)((d - 1) % 7)))
    val daily = series.toDF("event_type", "day", "x")
    val hw = llm.Events.holtWintersOf(daily).collect()
    val h = llm.Events.holtOf(daily).collect()
    // compare one-step forecast errors over the last 3 weeks
    val actual = series.map(_._3 * 1000L)
    def err(fcAt: Int => Option[Long]): Long =
      (35 until 55).flatMap(i => fcAt(i).map(f => math.abs(f - actual(i + 1)))).sum
    val hwErr = err(i => if (hw(i).isNullAt(6)) None else Some(hw(i).getLong(6)))
    val hErr = err(i => Some(h(i).getLong(5)))
    assert(hwErr * 2 < hErr,
      s"seasonal model must at least halve the periodic forecast error: hw=$hwErr h=$hErr")
  }

  test("ACF finds planted weekly seasonality: r(7) near 1000, r(1) well below") {
    import java.sql.Timestamp
    def day(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // period-7 sawtooth over four weeks: identical value every 7th day
    val season = (1 to 28).map(d => ("x", day(d), 1000L + 300L * (d % 7)))
      .toDF("event_type", "day", "m")
    val got = llm.Events.acfOf(season).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got(7L) == 1000L, s"perfect period-7 series must have r(7)=1000, got ${got(7L)}")
    assert(got(1L) < 500L, s"lag-1 of a sawtooth is weak, got ${got(1L)}")
  }

  test("markov attribution: hand-solvable chain gives exact removal effects") {
    // user 1: click → purchase; user 2: view → (no purchase);
    // user 3: purchase with no prior channel touch.
    // Chain: START → {click ⅓, view ⅓, CONV ⅓}; click → CONV; view → DROP.
    // P = ⅔. Removing click: P₋ = ⅓ → effect ½. Removing view: P₋ = ⅔ → 0.
    val ev = Seq(
      (1L, ts(10), 100L, "click"), (1L, ts(20), 101L, "purchase"),
      (2L, ts(10), 200L, "view"),
      (3L, ts(10), 300L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Events.markovRemoval(ev, Seq("click", "view")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("click") == ((500000L, 1000L, 666667L)), got("click"))
    assert(got("view") == ((0L, 0L, 666667L)), got("view"))
  }

  test("markov attribution: post-conversion touches are excluded from the journey") {
    // the click AFTER the purchase must not count
    val ev = Seq(
      (1L, ts(10), 100L, "view"), (1L, ts(20), 101L, "purchase"),
      (1L, ts(30), 102L, "click")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Events.markovRemoval(ev, Seq("click", "view")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("view") == 1000000L, s"view carried the whole conversion: $got")
    assert(got("click") == 0L, s"post-conversion click must get nothing: $got")
  }

  test("declared query: q_markov_attribution shares sum to ~1000, P in (0,1]") {
    val rows = Events.markovAttribution.fn(spark, sf001).collect()
    assert(rows.length == 4)
    val shares = rows.map(_.getLong(2)).sum
    assert(shares >= 996 && shares <= 1000, s"shares sum $shares")
    val p = rows.head.getLong(3)
    assert(p > 0 && p <= 1000000)
  }

  test("SPRT walk matches a hand fold; planted signals stop on the right side") {
    // cohort 0: pure successes -> LLR climbs 223144/event, crosses
    // +2944439 at cum_s = 14 (13*223144 = 2900872 < A <= 14*223144).
    // cohort 1: pure failures -> LLR falls 64539/event, crosses
    // -2944439 at cum_n = 46 (ceil(2944439/64539)).
    val daily = (
      (1 to 20).map(d => (0L, ts(d * 86400), 1L, 1L)) ++   // 1 success/day
      (1 to 60).map(d => (1L, ts(d * 86400), 1L, 0L))      // 1 failure/day
    ).toDF("cohort", "day", "n_d", "s_d")
    val got = Events.sprtOf(daily).collect().map(r =>
      (r.getLong(0), r.getTimestamp(1), r.getLong(6), r.getString(7),
        Option(r.getTimestamp(8)), r.getBoolean(9)))
    val c0 = got.filter(_._1 == 0L)
    val c1 = got.filter(_._1 == 1L)
    // hand fold of the same walk
    c0.zipWithIndex.foreach { case ((_, _, llr, _, _, _), i) =>
      assert(llr == (i + 1) * 223144L, s"c0 day ${i + 1}") }
    c1.zipWithIndex.foreach { case ((_, _, llr, _, _, _), i) =>
      assert(llr == -(i + 1) * 64539L, s"c1 day ${i + 1}") }
    // first crossings exactly where the integer arithmetic says
    assert(c0.indexWhere(_._4 == "accept_h1") == 13, "c0 crossing day")
    assert(c1.indexWhere(_._4 == "accept_h0") == 45, "c1 crossing day")
    // stop_day = that first crossing everywhere in the cohort;
    // post_stop marks exactly the rows after it
    assert(c0.forall(_._5.contains(ts(14 * 86400))), "c0 stop_day")
    assert(c1.forall(_._5.contains(ts(46 * 86400))), "c1 stop_day")
    assert(c0.count(_._6) == 6 && c1.count(_._6) == 14, "post_stop counts")
  }

  test("shapley: hand game — symmetric channels split, dummies get zero, efficiency holds") {
    // u1: click->purchase (mask 1), u2: view->purchase (mask 2),
    // u3: click+view->purchase (mask 3), u4: click only NO purchase
    // (excluded), u5: purchase untouched (mask 0).
    // click/view are symmetric -> equal credit; signup/error are
    // dummy channels -> exactly 0.
    val ev = Seq(
      (1L, ts(10), 100L, "click"), (1L, ts(20), 101L, "purchase"),
      (2L, ts(10), 200L, "view"), (2L, ts(20), 201L, "purchase"),
      (3L, ts(10), 300L, "click"), (3L, ts(15), 301L, "view"),
      (3L, ts(20), 302L, "purchase"),
      (4L, ts(10), 400L, "click"),
      (5L, ts(10), 500L, "purchase")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Events.shapleyOf(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("click") == ((36L, 500L)), got("click").toString)
    assert(got("view") == ((36L, 500L)), got("view").toString)
    assert(got("signup") == ((0L, 0L)), got("signup").toString)
    assert(got("error") == ((0L, 0L)), got("error").toString)
  }

  test("shapley == permutation-average brute force on seeded random mask games") {
    // reference: phi(i) = avg over all 4! channel orderings of the
    // marginal v(pred(i) + i) - v(pred(i)) — the DEFINITION, distinct
    // from the subset-weight formula the query uses
    val bits = Seq(1L, 2L, 4L, 8L)
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 3) {
      val masks = Seq.fill(40)(rnd.nextInt(16).toLong)
      def v(sMask: Long): Long = masks.count(m => (m & sMask) == m).toLong
      val perms = bits.permutations.toSeq
      val want = bits.map { b =>
        val sum24 = perms.map { p =>
          val pred = p.takeWhile(_ != b).foldLeft(0L)(_ | _)
          v(pred | b) - v(pred)
        }.sum
        b -> sum24 // 4! = 24 permutations: sum IS phi24
      }.toMap
      // feed the same masks through events: user k touches mask bits
      // then purchases
      val names = Map(1L -> "click", 2L -> "view", 4L -> "signup", 8L -> "error")
      val ev = masks.zipWithIndex.flatMap { case (m, u) =>
        val touches = bits.filter(b => (m & b) != 0).zipWithIndex.map {
          case (b, i) => (u.toLong, ts(10 + i), u * 10L + i, names(b))
        }
        touches :+ ((u.toLong, ts(20), u * 10L + 9, "purchase"))
      }.toDF("user_id", "ts", "event_id", "event_type")
      val got = Events.shapleyOf(ev).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      bits.foreach { b =>
        assert(got(names(b)) == want(b), s"${names(b)}: ${got(names(b))} vs ${want(b)}")
      }
      // efficiency: total credit = 24 * (v(full) - v(empty))
      assert(got.values.sum == 24L * (v(15L) - v(0L)), "efficiency identity")
    }
  }

  test("SPRT: a walk that never crosses keeps stop_day null, all continue") {
    // alternate success/failure: per pair LLR moves 223144 - 64539 =
    // +158605, needs 19 pairs to cross -- give it only 5
    val daily = (1 to 10).map(d =>
      (0L, ts(d * 86400), 1L, if (d % 2 == 1) 1L else 0L))
      .toDF("cohort", "day", "n_d", "s_d")
    val got = Events.sprtOf(daily).collect()
    assert(got.forall(_.getString(7) == "continue"))
    assert(got.forall(_.isNullAt(8)), "stop_day must stay null")
    assert(got.forall(!_.getBoolean(9)), "post_stop must stay false")
  }

  test("shared-text normal tail matches reference values to the A&S error bound") {
    import spark.implicits._
    // two-sided p for |z| = 0, 1.6449, 1.96, 2.5758, 3.2905
    val want = Map(0.0 -> 1.0, 1.6449 -> 0.10, 1.96 -> 0.05,
      2.5758 -> 0.01, 3.2905 -> 0.001)
    val got = want.keys.toSeq.toDF("z")
      .select(col("z"), expr(Events.pTailSql("z") + " * 1.0").as("p"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    want.foreach { case (z, p) =>
      assert(math.abs(got(z) - p) < 3e-4, s"z=$z: ${got(z)} vs $p")
    }
  }

  test("BH rejections form an exact rank prefix; uniform types survive screening") {
    val rows = Events.fdrBh.fn(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5),
        r.getBoolean(6)))
    assert(rows.nonEmpty)
    val rejected = rows.filter(_._5).map(_._4)
    val accepted = rows.filterNot(_._5).map(_._4)
    if (rejected.nonEmpty && accepted.nonEmpty)
      assert(rejected.max < accepted.min,
        "BH rejections must be a prefix of the p-value ranking")
    // p-values are valid probabilities in micro units
    rows.foreach { r => assert(r._3 >= 0 && r._3 <= 1000000, r.toString) }
  }

  test("cross-correlation finds a planted lead-lag relationship at the right lag") {
    import spark.implicits._
    // purchase series = click series shifted by 3 days (plus offset):
    // CCF must peak at lag +3 with r == 1000 exactly
    val base = (1 to 40).map(d => d.toLong * 13 % 97)
    val ev = (1 to 40).flatMap { d =>
      val ts0 = new java.sql.Timestamp(d * 86400000L)
      val ts3 = new java.sql.Timestamp((d + 3) * 86400000L)
      Seq(("click", ts0, base(d - 1).toDouble),
          ("purchase", ts3, base(d - 1).toDouble + 5.0))
    }.toDF("event_type", "ts", "value")
    // splice the hand frame through the same aggregation the query does
    val daily = ev
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(expr("(sum(cast(round(value * 100) as bigint)) * 1000) div count(1)").as("m"))
    val a = daily.filter(col("event_type") === "click")
      .select(to_date(col("day")).as("da"), col("m").as("x"))
    val b = daily.filter(col("event_type") === "purchase")
      .select(to_date(col("day")).as("db"), col("m").as("y"))
    val lags = spark.range(-7, 8).select(col("id").as("lag"))
    val r = a.crossJoin(broadcast(lags))
      .join(b, expr("date_add(da, cast(lag as int)) = db"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("lag"),
        expr("""cast(round(1000.0 * (n * sxy - sx * sy) /
                nullif(sqrt(cast(n * sxx - sx * sx as double) *
                            cast(n * syy - sy * sy as double)), 0.0))
                as bigint)""").as("r"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(3L) == 1000L, s"planted lag-3 must be perfect: ${r(3L)}")
    assert(r.filter(_._1 != 3L).values.forall(v => math.abs(v) < 900),
      s"no other lag should approach the planted one: $r")
  }

  test("forecast backtest: HW beats the seasonal naive on a ramp, not on a pure cycle") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    def backtest(daily: org.apache.spark.sql.DataFrame) = {
      val w = Window.partitionBy("event_type").orderBy("day")
      Events.holtWintersOf(daily)
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("y7", lag(col("cents"), 7).over(w))
        .withColumn("fprev", lag(col("forecast_milli"), 1).over(w))
        .filter(col("rn") >= 8)
        .groupBy("event_type")
        .agg(sum(abs(col("cents") * 1000L - col("y7") * 1000L)).as("sn"),
          sum(abs(col("cents") * 1000L - col("fprev"))).as("sh"))
        .head()
    }
    def series(f: Int => Long) = (1 to 60).map(d =>
      ("t", new java.sql.Timestamp(d * 86400000L), f(d))).toDF("event_type", "day", "x")
    // steady ramp: naive is off by a constant 7 units/day, HW tracks it
    val ramp = backtest(series(d => 1000L + 10L * d))
    assert(ramp.getLong(2) < ramp.getLong(1),
      s"HW must beat naive on a ramp: hw=${ramp.getLong(2)} naive=${ramp.getLong(1)}")
    // pure weekly cycle: the naive predictor is PERFECT (error 0)
    val cyc = backtest(series(d => 1000L + 100L * (d % 7)))
    assert(cyc.getLong(1) == 0L, s"naive must be exact on a pure cycle: ${cyc.getLong(1)}")
  }

  test("UCB replay: optimistic opening plays every arm once, state bookkeeping is exact") {
    val rows = Events.ucbReplay.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1L to rows.length.toLong), "one row per round")
    // unplayed arms score +inf with alphabetical tie-break: the first
    // |arms| rounds are the arms in order, each ending at n_arm = 1
    val opening = rows.take(Events.UcbArms.length)
    assert(opening.map(_._2).toSeq == Events.UcbArms, opening.mkString(", "))
    assert(opening.forall(_._4 == 1L))
    // replay the bookkeeping: n increments by one per pick, sum by
    // the emitted reward, rewards stay in [0, 1000]
    val n = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val s = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    rows.foreach { case (t, arm, r, nA, sA) =>
      assert(r >= 0L && r <= 1000L, s"round $t reward $r")
      n(arm) += 1L; s(arm) += r
      assert(nA == n(arm) && sA == s(arm), s"round $t state drifted")
    }
    // every arm got explored, total plays = horizon
    assert(n.keySet == Events.UcbArms.toSet)
    assert(n.values.sum == rows.length.toLong)
  }

  test("burst detection: backtracked Viterbi path recovers a planted burst window") {
    // 40 quiet days at 10/day, days 15..24 burst at 25/day
    val series = (1L to 40L).map(t => (t, if (t >= 15 && t <= 24) 25L else 10L))
    val trellis = Events.burstTrellis(series)
    assert(trellis.map(_._1) == (1L to 40L))
    // backtrack: final state = argmin, then follow choice bits
    val byT = trellis.map(r => r._1 -> r).toMap
    var state = if (trellis.last._3 <= trellis.last._4) 0L else 1L
    val path = (40L to 1L by -1L).map { tt =>
      val row = byT(tt)
      val s = state
      state = if (s == 0L) row._5 else row._6
      tt -> s
    }.reverse.toMap
    val burstDays = (1L to 40L).filter(path(_) == 1L)
    assert(burstDays.nonEmpty, "planted burst not detected")
    assert(burstDays.forall(t => t >= 15L && t <= 24L),
      s"burst leaked outside the planted window: $burstDays")
    assert(burstDays.length >= 8, s"burst window under-covered: $burstDays")
    // a flat series never enters the burst state
    val flat = Events.burstTrellis((1L to 40L).map(t => (t, 10L)))
    assert(flat.last._3 <= flat.last._4, "flat series must end in base state")
    val byTf = flat.map(r => r._1 -> r).toMap
    var st = 0L
    val anyBurst = (40L to 1L by -1L).exists { tt =>
      val row = byTf(tt); val s = st
      st = if (s == 0L) row._5 else row._6
      s == 1L
    }
    assert(!anyBurst, "flat series path entered burst")
  }

  test("IPS value: the argmax policy and both estimators recompute from raw cells") {
    import org.apache.spark.sql.functions._
    val ev = Tables.load(spark, sf001, "events").select(
      (dayofmonth(col("ts")) % 7).cast("long").as("x"),
      col("event_type").as("a"),
      round(col("value") * 100, 0).cast("long").as("rc"))
    val cells = ev.groupBy("x", "a")
      .agg(count(lit(1)).as("n"), sum(col("rc")).as("s")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val nx = ev.groupBy("x").agg(count(lit(1))).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Events.ipsValue.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.map(_._1).toSeq == (0L to 6L))
    got.foreach { case (x, piA, nX, nM, ips, dm, gap) =>
      // pi is the floored-micro-mean argmax with alphabetical ties
      val best = cells.collect { case ((cx, a), (n, s)) if cx == x =>
        (a, 1000000L * s / n) }.toSeq
        .minBy { case (a, m) => (-m, a) }._1
      assert(piA == best, s"x=$x policy $piA != $best")
      val (nPi, sPi) = cells((x, piA))
      assert(nX == nx(x) && nM == nPi)
      assert(ips == 5L * 1000000L * sPi / nx(x), s"x=$x ips")
      assert(dm == 1000000L * sPi / nPi, s"x=$x dm")
      assert(gap == math.abs(ips - dm))
    }
  }

  test("drOf: DR equals DM exactly under a perfect model") {
    // constant rewards per (x, a) cell make every train cell mean
    // exact, so eval(=train) matched sums equal the model's
    // predictions and the two residual floors cancel term-for-term
    val cells = for {
      x <- 0L to 1L
      (a, rc) <- Seq(("click", 100L), ("view", 40L))
      _ <- 1 to 3
    } yield (x, a, rc)
    val f = cells.toDF("x", "a", "rc")
    val same = Events.drOf(f, f).collect()
    assert(same.nonEmpty)
    same.foreach { r =>
      assert(r.getAs[Long]("dr_micro") == r.getAs[Long]("dm_micro"),
        s"x=${r.getAs[Long]("x")}: DR != DM under a perfect model")
      assert(r.getAs[String]("pi_a") == "click") // higher-mean arm
    }
  }

  test("drOf: DR collapses to IPS under a zero model") {
    val hold = (for {
      x <- 0L to 1L
      (a, rc) <- Seq(("click", 100L), ("view", 40L))
      _ <- 1 to 3
    } yield (x, a, rc)).toDF("x", "a", "rc")
    // all-zero train rewards: q_mu = 0 and the model-correction term
    // vanishes, leaving exactly the IPS estimate
    val z = Events.drOf(hold.withColumn("rc", lit(0L)), hold).collect()
    assert(z.nonEmpty)
    z.foreach { r =>
      assert(r.getAs[Long]("dm_micro") == 0L)
      assert(r.getAs[Long]("dr_micro") == r.getAs[Long]("ips_micro"),
        s"x=${r.getAs[Long]("x")}: DR != IPS under a zero model")
    }
  }

  test("BC bootstrap: index table is sane and collapses to the plain percentile at c = 50") {
    // median-unbiased replicas mean zero correction: exactly the
    // plain percentile interval's nearest ranks
    assert(Events.bcIdx(50) == (3, 98), Events.bcIdx(50).toString)
    // clamp convention at the degenerate counts
    assert(Events.bcIdx(0) == Events.bcIdx(1))
    assert(Events.bcIdx(100) == Events.bcIdx(99))
    // more replicas below the point estimate = distribution biased
    // low = the corrected interval shifts UP: indices monotone in c
    val los = Events.bcIdx.map(_._1); val his = Events.bcIdx.map(_._2)
    assert(los.zip(los.tail).forall { case (a, b) => a <= b }, "lo monotone")
    assert(his.zip(his.tail).forall { case (a, b) => a <= b }, "hi monotone")
    // live tie: on any event type where n_below lands at 50, the BC
    // bounds must equal q_bootstrap_ci's 3rd/98th order statistics
    val ci = Events.bootstrapCi.fn(spark, sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    Events.bootstrapBc.fn(spark, sf001).collect().foreach { r =>
      val (lo, hi) = (r.getAs[Long]("i_lo"), r.getAs[Long]("i_hi"))
      assert(lo >= 1L && lo <= 100L && hi >= 1L && hi <= 100L && lo < hi)
      if (r.getAs[Long]("n_below") == 50L) {
        val p = ci(r.getString(0))
        assert(r.getAs[Long]("bc_lo_micro") == p.getAs[Long]("ci_lo_micro"))
        assert(r.getAs[Long]("bc_hi_micro") == p.getAs[Long]("ci_hi_micro"))
      }
    }
  }

  test("drPolicy: regret is nonnegative and the DM arm's DR value ties q_dr_value") {
    val pol = Events.drPolicy.fn(spark, sf001).collect()
      .map(r => r.getAs[Long]("x") -> r).toMap
    val value = Events.drValue.fn(spark, sf001).collect()
      .map(r => r.getAs[Long]("x") -> r).toMap
    assert(pol.keySet == (0L to 6L).toSet, s"contexts: ${pol.keySet}")
    pol.foreach { case (x, r) =>
      // argmax ranges over a set containing the DM arm, so switching
      // to the learned policy can never look worse under DR
      assert(r.getAs[Long]("regret_vs_dm_micro") >= 0L, s"x=$x regret < 0")
      assert(r.getAs[Long]("dr_best_micro") ==
        r.getAs[Long]("dr_of_dm_micro") + r.getAs[Long]("regret_vs_dm_micro"))
      // the sanity band vs q_dr_value: same split, same formula, so
      // the DM policy's DR value must be exactly the dr_micro the
      // evaluation query reports for this context
      val v = value(x)
      assert(r.getAs[String]("dm_pi_a") == v.getAs[String]("pi_a"),
        s"x=$x DM policy diverged from q_dr_value's")
      assert(r.getAs[Long]("dr_of_dm_micro") == v.getAs[Long]("dr_micro"),
        s"x=$x DR(DM arm) != q_dr_value dr_micro")
      assert(r.getAs[Long]("dm_mu_micro") == v.getAs[Long]("dm_micro"),
        s"x=$x q-model mean diverged")
    }
  }

  test("contextual UCB: per-context openings are distinct arms and the state replays") {
    val rows = SparkEntry.queries("q_ucb_contextual")(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val byX = rows.groupBy(_._1)
    assert(byX.keySet == (0L to 6L).toSet, s"contexts: ${byX.keySet}")
    byX.foreach { case (x, tr) =>
      val sorted = tr.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length))
      // the play-each-arm-once opening falls out of the +inf rule
      val open = sorted.take(5).map(_._3)
      assert(open.distinct.length == open.length, s"x=$x opening $open")
      // replay the state columns from the picks and rewards
      val n = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      val s = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      sorted.foreach { case (_, t, arm, r, nArm, sArm) =>
        n(arm) += 1L; s(arm) += r
        assert(r >= 0L && r <= 1000L, s"x=$x t=$t reward $r out of [0,1000]")
        assert(nArm == n(arm) && sArm == s(arm), s"x=$x t=$t state mismatch")
      }
    }
  }

  test("qini curve: cumulative cells tile the population, endpoint = overall uplift") {
    val rows = Events.qiniCurve.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(rows.map(_._1).toSeq == (1L to 10L), "exactly ten deciles in order")
    // cumulative counts and sums are non-decreasing
    def mono(xs: Seq[Long]) = xs.zip(xs.tail).forall { case (a, b) => a <= b }
    assert(mono(rows.map(_._2).toSeq) && mono(rows.map(_._3).toSeq))
    // endpoint cells == raw per-user recomputation from the events table
    val hex = md5(col("user_id").cast("string").cast("binary"))
    val treated = ((ascii(substring(hex, 7, 1)) * 256 +
      ascii(substring(hex, 8, 1))) % 2).cast("long")
    val users = Tables.load(spark, sf001, "events").select(
        col("user_id"), treated.as("g"),
        when(to_date(col("ts")) >= lit("2024-01-16"),
          round(col("value") * 100, 0).cast("long")).otherwise(0L).as("y"))
      .groupBy("user_id", "g").agg(sum(col("y")).as("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val (last) = rows.last
    assert(last._2 == users.count(_._1 == 1L), "endpoint treated count")
    assert(last._3 == users.count(_._1 == 0L), "endpoint control count")
    assert(last._4 == users.filter(_._1 == 1L).map(_._2).sum, "endpoint treated outcome")
    assert(last._5 == users.filter(_._1 == 0L).map(_._2).sum, "endpoint control outcome")
    val wantQ = last._4 - (last._5 * last._2) / last._3
    assert(last._6.contains(wantQ), s"endpoint qini: ${last._6} vs $wantQ")
  }

  test("perceptron replay: margins, updates, and mistake rule are internally consistent") {
    import org.apache.spark.sql.expressions.Window
    val feats = Tables.load(spark, sf001, "events")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(
        least(lit(1000L),
          expr("(1000 * sum(CAST(round(value * 100) AS BIGINT))) div (100 * count(1))")).as("x1"),
        least(lit(1000L), count(lit(1))).as("x2"))
      .withColumn("t", row_number().over(Window.orderBy("d")).cast("long"))
      .select("t", "x1", "x2")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val trace = Events.perceptronReplay.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    var (w0, w1, w2) = (0L, 0L, 0L)
    trace.foreach { case (t, y, margin, mistake, a0, a1, a2) =>
      val (x1, x2) = feats(t)
      assert(margin == w0 + w1 * x1 + w2 * x2, s"round $t margin")
      val pred = if (margin > 0) 1L else -1L
      assert(mistake == (pred != y), s"round $t mistake rule")
      if (mistake) { w0 += y; w1 += y * x1; w2 += y * x2 }
      assert((a0, a1, a2) == ((w0, w1, w2)), s"round $t update")
    }
    assert(trace.exists(_._4), "a nontrivial stream must force at least one mistake")
  }

  test("power analysis: MDE scaling law holds (quartering the effect ~ 25x the n)") {
    val r = Events.powerAnalysis.fn(spark, sf001).head()
    val (n5, n2, n1) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(n5 > 0 && n2 > n5 && n1 > n2, s"power must grow as MDE shrinks: $r")
    // n scales with 1/mde^2: 5% -> 1% is exactly x25 up to the two ceils
    assert(math.abs(n1 - 25L * n5) <= 25L, s"inverse-square law: n1=$n1 n5=$n5")
    assert(math.abs(n1 - 4L * n2) <= 4L, s"halving MDE quadruples n: $n2 $n1")
  }

  test("matching ATT == driver-side blocked nearest-neighbor recomputation") {
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val users = Tables.load(spark, sf001, "events")
      .select(col("user_id"), to_date(col("ts")).as("d"),
        round(col("value") * 100, 0).cast("long").as("vc"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1).map { case (uid, rs) =>
        val pre = rs.filter(_._2 < "2024-01-16")
        val post = rs.filter(_._2 >= "2024-01-16")
        val hex = md5hex(uid.toString)
        val g = (hex(6).toLong * 256 + hex(7).toLong) % 2
        (uid, g, pre.map(_._3).sum, pre.length.toLong, post.map(_._3).sum)
      }.toSeq
    val tr = users.filter(_._2 == 1L); val ctl = users.filter(_._2 == 0L)
    val byBlk = ctl.groupBy(_._3 / 10000)
    val gaps = tr.flatMap { case (tid, _, tps, tpn, ty) =>
      byBlk.get(tps / 10000).map { cands =>
        val (c, _) = cands.map { case (cid, _, cps, cpn, cy) =>
          ((cid, cy), (tps - cps) * (tps - cps) +
            (1000L * (tpn - cpn)) * (1000L * (tpn - cpn)))
        }.minBy { case ((cid, _), d) => (d, cid) }
        ty - c._2
      }
    }
    def sdiv(a: Long, b: Long) = if (a >= 0) a / b else -((-a) / b)
    val r = Events.matchingAtt.fn(spark, sf001).head()
    assert(r.getLong(0) == tr.length.toLong && r.getLong(1) == ctl.length.toLong)
    assert(r.getLong(2) == gaps.length.toLong, s"n_matched: $r")
    assert(r.getLong(4) == sdiv(gaps.sum, gaps.length.toLong), s"ATT: $r")
  }

  test("successive halving bracket: 8/4/2/1 alive, nested budgets, exact winner") {
    val rows = Events.successiveHalving.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val byRound = rows.groupBy(_._1)
    assert(byRound(1L).length == 8 && byRound(2L).length == 4 &&
      byRound(3L).length == 2 && byRound(4L).length == 1, "bracket widths")
    assert(byRound(1L).count(_._5) == 4 && byRound(2L).count(_._5) == 2 &&
      byRound(3L).count(_._5) == 1 && byRound(4L).count(_._5) == 1, "kept counts")
    // survivors of round r are exactly round r+1's contestants
    for (r <- 1L to 3L)
      assert(byRound(r).filter(_._5).map(_._2).toSet ==
        byRound(r + 1).map(_._2).toSet, s"round $r handoff")
    // budgets nest: every round's n_eval strictly grows
    val budgets = (1L to 4L).map(r => byRound(r).head._3)
    assert(budgets.zip(budgets.tail).forall { case (a, b) => a < b }, s"$budgets")
  }

  test("value iteration == driver-side Bellman backups on the same reward grid") {
    val arms = Seq("click", "error", "purchase", "signup", "view")
    val cells = Tables.load(spark, sf001, "events")
      .filter(col("event_type").isin(arms: _*))
      .groupBy((dayofweek(col("ts")) - 1).cast("long").as("st"),
        col("event_type").as("a"))
      .agg(least(lit(1000L),
        expr("(1000 * sum(CAST(round(value * 100) AS BIGINT))) div (100 * count(1))"))
        .as("r"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    def rOf(st: Long, a: String) = cells.getOrElse((st, a), 0L)
    var v = (0L to 6L).map(_ => 0L).toArray
    val hist = (1 to 3).map { _ =>
      val nv = (0L to 6L).map(st =>
        arms.map(a => rOf(st, a) + 900L * v(((st + 1) % 7).toInt) / 1000L).max).toArray
      val out = nv.clone(); v = nv; out
    }
    val greedy = (0L to 6L).map { st =>
      arms.map(a => (a, rOf(st, a) + 900L * hist(1)(((st + 1) % 7).toInt) / 1000L))
        .maxBy { case (a, q) => (q, -a.head.toInt) } // q desc; resolve ties below
    }
    val got = Events.valueIteration.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    got.foreach { case (st, v1, v2, v3, best) =>
      val i = st.toInt
      assert((v1, v2, v3) == ((hist(0)(i), hist(1)(i), hist(2)(i))), s"state $st values")
      val qs = arms.map(a => (a, rOf(st, a) + 900L * hist(1)(((st + 1) % 7).toInt) / 1000L))
      val want = qs.sortBy { case (a, q) => (-q, a) }.head._1
      assert(best == want, s"state $st greedy action")
    }
  }

  test("synthetic control: winner is the grid optimum and the gap math is exact") {
    val panel = Tables.load(spark, sf001, "events")
      .filter(col("event_type").isin("purchase", "click", "signup", "view"))
      .select(datediff(to_date(col("ts")), lit(java.sql.Date.valueOf("2024-01-01")))
        .cast("long").as("d"), col("event_type").as("a"),
        round(col("value") * 100, 0).cast("long").as("vc"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def cell(d: Long, a: String) = panel.filter(p => p._1 == d && p._2 == a).map(_._3).sum
    val days = (0L to 30L)
    val grid = for (i <- 0 to 20; j <- 0 to 20 if i * 50 + j * 50 <= 1000)
      yield (i * 50L, j * 50L, 1000L - i * 50 - j * 50)
    def synth(d: Long, w: (Long, Long, Long)) =
      (w._1 * cell(d, "click") + w._2 * cell(d, "signup") + w._3 * cell(d, "view")) / 1000L
    val sse = grid.map(w => w ->
      days.filter(_ <= 14).map(d => { val g = cell(d, "purchase") - synth(d, w); g * g }).sum)
    val best = sse.minBy { case ((a, b, _), e) => (e, a, b) }
    val rows = Events.syntheticControl.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.map(_._1).toSeq == (15L to 30L), "post window")
    rows.foreach { case (d, y, sy, gap, w1, w2, w3, ssePre) =>
      assert((w1, w2, w3) == best._1, s"weights: ($w1,$w2,$w3) vs ${best._1}")
      assert(ssePre == best._2, "pre-period SSE")
      assert(y == cell(d, "purchase") && sy == synth(d, best._1) && gap == y - sy,
        s"day $d gap arithmetic")
    }
  }

  test("croston: state updates only on demand days, forecast = z/p exactly") {
    val rows = Events.croston.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty, "the sparse slice must have at least one demand day")
    assert(rows.forall(_._2 > 0L), "only demand days appear in the trace")
    // replay the recurrence from the emitted (demand, interval) inputs
    var z = rows.head._2 * 1000L; var p = rows.head._3 * 1000L
    rows.zipWithIndex.foreach { case ((d, q, gap, ze, pe, f), i) =>
      if (i > 0) {
        z = z + 200L * (q * 1000L - z) / 1000L
        p = p + 200L * (gap * 1000L - p) / 1000L
      }
      assert(ze == z && pe == p, s"day $d state")
      assert(f == 1000L * z / p, s"day $d forecast ratio")
    }
    // intervals tile the calendar: first gap anchors at day -1
    val days = rows.map(_._1)
    assert(rows.head._3 == days.head + 1, "first interval anchors at day -1")
    days.zip(days.tail).zip(rows.tail.map(_._3)).foreach { case ((a, b), g) =>
      assert(g == b - a, s"gap between $a and $b")
    }
  }

  test("dispersion: Poisson-flat planted series reads ~1, bursty reads >1") {
    // validate the cross-multiplied predicate arithmetic driver-side
    // against the emitted frame on real data
    val rows = Events.dispersion.fn(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.length == 5 && rows.forall(_._2 == 31L), "five arms x 31 days")
    rows.foreach { case (a, n, tot, d, over) =>
      assert(over == (d > 1000L) || d == 1000L && !over, s"$a flag vs index")
      assert(d >= 0L, s"$a dispersion nonnegative")
    }
    // planted: constant series var=0 -> D=0; one-burst series -> D>1
    import spark.implicits._
    def dOf(xs: Seq[Long]): (Long, Boolean) = {
      val n = xs.length.toLong; val sx = xs.sum; val sxx = xs.map(x => x * x).sum
      (1000L * (n * sxx - sx * sx) / ((n - 1) * sx),
        n * sxx - sx * sx > (n - 1) * sx)
    }
    assert(dOf(Seq.fill(31)(7L)) == ((0L, false)), "constant series")
    val burst = Seq.fill(30)(1L) :+ 100L
    assert(dOf(burst)._2, "a burst must overdisperse")
  }

  test("qte: quartile picks are the exact order statistics of each arm") {
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val users = Tables.load(spark, sf001, "events")
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .map { case (u, x) =>
        val hex = md5hex(u.toString)
        ((hex(6).toLong * 256 + hex(7).toLong) % 2, x, u)
      }
    def pick(g: Long, q: Long): Long = {
      val arm = users.filter(_._1 == g).sortBy(t => (t._2, t._3)).map(_._2)
      arm(((q * (arm.length - 1)) / 100).toInt)
    }
    val got = Events.qte.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(25L, 50L, 75L))
    got.foreach { case (q, t, c, d) =>
      assert(t == pick(1L, q) && c == pick(0L, q) && d == t - c, s"quantile $q")
    }
  }
}
