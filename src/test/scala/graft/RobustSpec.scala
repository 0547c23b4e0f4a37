package graft

import org.apache.spark.sql.functions._
import graft.ops.Robust

/** Robust series statistics pinned against independent driver-side
  * recomputations from the same day/user aggregates. */
class RobustSpec extends SparkSpec {

  private def dailyRows(dir: String): Seq[(Long, Long, Long)] =
    Tables.load(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"),
        count(lit(1)).as("n_ev"))
      .select(datediff(col("day"),
          lit(java.sql.Date.valueOf("2024-01-01"))).cast("long"),
        col("cents"), col("n_ev"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  private def medianOf(v: Seq[Double]): Double = {
    val s = v.sorted
    val p = v.size
    (s(((p + 1) / 2 - 1).toInt) + s((p / 2 + 1 - 1).toInt)) / 2
  }

  test("q_theil_sen equals a driver-side pairwise-median recomputation") {
    val dd = dailyRows(sf001)
    val slopes = for {
      (da, ca, _) <- dd; (db, cb, _) <- dd if da < db
    } yield (cb - ca).toDouble / (db - da).toDouble
    val slope = medianOf(slopes)
    val icept = medianOf(dd.map { case (d, c, _) => c.toDouble - slope * d })
    val r = Robust.theilSen.fn(spark, sf001).head()
    assert(r.getAs[Long]("n_days") == dd.size)
    assert(r.getAs[Long]("n_pairs") == slopes.size)
    assert(math.abs(r.getAs[Long]("slope_micro") - math.round(slope * 1e6)) <= 1)
    assert(math.abs(r.getAs[Long]("icept_micro") - math.round(icept * 1e6)) <= 1)
  }

  test("q_kendall counts match brute force; tau in [-1000, 1000]") {
    val dd = dailyRows(sf001)
    val pairs = for {
      (da, xa, ya) <- dd; (db, xb, yb) <- dd if da < db
    } yield (xa, ya, xb, yb)
    val nc = pairs.count { case (xa, ya, xb, yb) =>
      (xa < xb && ya < yb) || (xa > xb && ya > yb) }
    val nd = pairs.count { case (xa, ya, xb, yb) =>
      (xa < xb && ya > yb) || (xa > xb && ya < yb) }
    val r = Robust.kendall.fn(spark, sf001).head()
    assert(r.getAs[Long]("n0") == pairs.size)
    assert(r.getAs[Long]("nc") == nc && r.getAs[Long]("nd") == nd)
    val tau = r.getAs[Long]("tau_milli")
    assert(tau >= -1000 && tau <= 1000)
  }

  test("q_ab_sequential look table matches brute force; boundary math exact") {
    val users = Tables.load(spark, sf001, "events")
      .filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(min(datediff(to_date(col("ts")),
          lit(java.sql.Date.valueOf("2024-01-01")))).as("fd"),
        min(when(col("event_type") === "purchase",
          datediff(to_date(col("ts")),
            lit(java.sql.Date.valueOf("2024-01-01"))))).as("fp"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        Option(r.get(2)).map(_.asInstanceOf[Int].toLong)))
    val rows = Robust.abSequential.fn(spark, sf001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val cut = r.getAs[Long]("cut")
      val k = r.getAs[Long]("k")
      val in = users.filter(_._2 < cut)
      def side(c: Long) = in.filter(_._1 % 2 == c)
      def conv(c: Long) = side(c).count(_._3.exists(_ < cut)).toLong
      assert(r.getAs[Long]("n1") == side(0).size, s"n1 at look $k")
      assert(r.getAs[Long]("c1") == conv(0), s"c1 at look $k")
      assert(r.getAs[Long]("n2") == side(1).size, s"n2 at look $k")
      assert(r.getAs[Long]("c2") == conv(1), s"c2 at look $k")
      // the integer inequality is exactly z² > C²K/k
      val (n1, c1, n2, c2) = (r.getAs[Long]("n1"), r.getAs[Long]("c1"),
        r.getAs[Long]("n2"), r.getAs[Long]("c2"))
      val (n, c) = (n1 + n2, c1 + c2)
      val num = (c1 * n2 - c2 * n1).toDouble
      val z2 = num * num * n / (n1.toDouble * n2 * c * (n - c))
      val want = z2 * k > 20.808
      assert(r.getAs[Boolean]("cross_obf") == want, s"boundary at look $k")
    }
  }

  test("q_mann_whitney equals a driver-side tie-averaged rank recomputation") {
    val vals = Tables.load(spark, sf001, "events")
      .filter(col("user_id").isNotNull)
      .select(round(col("value") * 100, 0).cast("long"), col("user_id") % 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val sorted = vals.map(_._1).sorted
    val rankOf = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> (xs.map(_._2 + 1).sum.toDouble / xs.size) }
    val a = vals.filter(_._2 == 0).map(_._1)
    val b = vals.filter(_._2 == 1).map(_._1)
    val ra = a.map(rankOf).sum
    val u = ra - a.size.toLong * (a.size + 1) / 2.0
    val n = vals.size.toDouble
    val ties = vals.groupBy(_._1).values.map(_.size.toLong)
      .map(t => t * t * t - t).sum
    val sigma = math.sqrt(a.size * b.size / 12.0 *
      ((n + 1) - ties / (n * (n - 1))))
    val z = (u - a.size.toDouble * b.size / 2) / sigma
    val r = graft.ops.Robust.mannWhitney.fn(spark, sf001).head()
    assert(r.getAs[Long]("na") == a.size && r.getAs[Long]("nb") == b.size)
    assert(r.getAs[Long]("u2") == math.round(2 * u),
      s"2U ${r.getAs[Long]("u2")} vs ${2 * u}")
    assert(math.abs(r.getAs[Long]("z_milli") - math.round(z * 1000)) <= 1,
      s"z ${r.getAs[Long]("z_milli")} vs ${z * 1000}")
  }

  test("q_chi_square equals a brute-force contingency recomputation") {
    val cells = Tables.load(spark, sf001, "events")
      .filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id") % 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val n = cells.size.toDouble
    val rt = cells.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
    val ct = cells.groupBy(_._2).map { case (k, v) => k -> v.size.toDouble }
    val chi2 = cells.groupBy(identity).map { case ((ty, co), xs) =>
      val o = xs.size.toDouble
      val term = (o * n - rt(ty) * ct(co)) * (o * n - rt(ty) * ct(co)) /
        (n * rt(ty) * ct(co))
      math.round(term * 1e6) // the per-cell micro rounding the query does
    }.sum
    val r = graft.ops.Robust.chiSquare.fn(spark, sf001).head()
    assert(r.getAs[Long]("n") == cells.size)
    assert(r.getAs[Long]("chi2_micro") == chi2,
      s"chi2 ${r.getAs[Long]("chi2_micro")} vs $chi2")
    val v = math.sqrt(chi2 / 1e6 / n)
    assert(math.abs(r.getAs[Long]("cramers_v_micro") - math.round(v * 1e6)) <= 1)
  }

  test("periodogram: a planted pure sinusoid lights exactly its own bin") {
    import spark.implicits._
    val n = 30; val f = 3; val amp = 100000.0
    val dd = (0 until n).map(t =>
      (t.toLong, math.round(amp * math.cos(2 * math.Pi * f * t / n))))
      .toDF("d", "cents")
    val rows = graft.ops.Robust.periodogramOf(dd, n).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("amp_cents")).toMap
    // DFT of A·cos(2πft/N) has |X_f| = A·N/2 → amp_cents = A/2
    assert(math.abs(rows(f.toLong) - amp / 2) <= amp / 200,
      s"bin $f: ${rows(f.toLong)} vs ${amp / 2}")
    rows.filterNot(_._1 == f.toLong).foreach { case (k, a) =>
      assert(a <= amp / 200, s"phantom power at bin $k: $a")
    }
  }

  test("q_seasonal_decomp: components reconcile and seasonals are centered") {
    val rows = graft.ops.Robust.seasonalDecomp.fn(spark, sf001).collect()
    assert(rows.length == 30)
    val interior = rows.filter(!_.isNullAt(2))
    assert(interior.length == 24, "3-day edges on each side carry null trend")
    // exact reconciliation on every interior day
    interior.foreach { r =>
      val cents = r.getLong(1)
      val sum = r.getLong(2) + r.getLong(3) + r.getLong(4)
      assert(sum == 1000000L * cents, s"decomposition must reconcile: $r")
    }
    // seasonal components centered: the 7 dow values sum to ~0
    val seas = rows.map(r => (r.getLong(0) % 7) -> r.getLong(3)).toMap
    assert(seas.size == 7)
    assert(math.abs(seas.values.sum) <= 7, s"seasonals not centered: $seas")
  }

  test("q_log_rank equals a sequential hypergeometric recomputation") {
    val users = Tables.load(spark, sf001, "events")
      .filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("f"), max(to_date(col("ts"))).as("l"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDate(2).toLocalDate))
    val horizon = users.map(_._3).max
    // (lifetime, death?, cohort)
    val lives = users.map { case (uid, f, l) =>
      (java.time.temporal.ChronoUnit.DAYS.between(f, l), l != horizon, uid % 2)
    }
    val times = lives.filter(_._2).map(_._1).distinct.sorted
    var oe = 0L; var vv = 0L; var nT = 0L
    times.foreach { t =>
      val r1 = lives.count(x => x._1 >= t && x._3 == 0).toLong
      val r2 = lives.count(x => x._1 >= t && x._3 == 1).toLong
      val d1 = lives.count(x => x._1 == t && x._2 && x._3 == 0).toLong
      val d2 = lives.count(x => x._1 == t && x._2 && x._3 == 1).toLong
      val n = r1 + r2; val d = d1 + d2
      if (d > 0) {
        nT += 1
        oe += math.round(1e6 * (d1.toDouble - d.toDouble * r1 / n))
        vv += math.round(1e6 * d.toDouble * (r1.toDouble / n) * (r2.toDouble / n) *
          (n - d) / (n - 1).toDouble)
      }
    }
    val r = graft.ops.Robust.logRank.fn(spark, sf001).head()
    assert(r.getAs[Long]("n_times") == nT)
    assert(r.getAs[Long]("o_minus_e_micro") == oe,
      s"O-E ${r.getAs[Long]("o_minus_e_micro")} vs $oe")
    assert(r.getAs[Long]("var_micro") == vv)
  }

  test("q_kaplan_meier equals a sequential KM recomputation; curve monotone") {
    val users = Tables.load(spark, sf001, "events")
      .filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("f"), max(to_date(col("ts"))).as("l"))
      .select(datediff(col("l"), col("f")).cast("long").as("life"), col("l"))
      .collect().map(r => (r.getLong(0), r.getDate(1))).toSeq
    val horizon = users.map(_._2.toLocalDate).max
    val lives = users.map { case (life, l) =>
      (life, l.toLocalDate != horizon) } // (lifetime, death?)
    var atRisk = lives.size.toLong
    var surv = 1.0
    val want = lives.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (t, grp) =>
      val d = grp.count(_._2).toLong
      val n = grp.size.toLong
      val r = atRisk
      atRisk -= n
      if (d > 0) {
        surv = if (d == r) 0.0 else surv * (r - d).toDouble / r
        Some((t, d, r, math.round(surv * 1e6)))
      } else None
    }
    val got = Robust.kaplanMeier.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.map(g => (g._1, g._2, g._3)) == want.map(w => (w._1, w._2, w._3)),
      s"risk table mismatch:\n$got\n$want")
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._4 - w._4) <= 1, s"surv at t=${g._1}: ${g._4} vs ${w._4}")
    }
    val curve = got.map(_._4)
    assert(curve.zip(curve.tail).forall { case (a, b) => b <= a },
      "survival must be non-increasing")
  }

  test("q_survival_logit: iteration-1 identities and monotone loss") {
    val rows = Robust.survivalLogit.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    // at w = 0 every person-period row contributes exactly
    // round(1e6 ln 2) to the loss and predicts 1, so iteration 1's
    // loss and accuracy are closed-form in (n_pp, n_deaths)
    val ev = Tables.load(spark, sf001, "events").filter(col("user_id").isNotNull)
    val users = ev.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("fd"), max(to_date(col("ts"))).as("ld"))
    val horizon = users.agg(max(col("ld"))).head().getDate(0)
    val lf = users.select(
      datediff(col("ld"), col("fd")).cast("long").as("life"),
      when(col("ld") === lit(horizon), 0L).otherwise(1L).as("death")).collect()
    val nPp = lf.map(_.getLong(0) + 1).sum
    val nDeaths = lf.map(_.getLong(1)).sum
    assert(rows(0)._2 == nPp * math.round(1e6 * math.log(2.0)),
      s"iter-1 loss ${rows(0)._2} != $nPp * ln2")
    assert(rows(0)._3 == nDeaths, s"iter-1 correct ${rows(0)._3} != $nDeaths")
    val losses = rows.map(_._2)
    assert(losses.zip(losses.tail).forall { case (a, b) => b < a },
      s"loss not strictly decreasing: ${losses.toSeq}")
  }

  test("regression discontinuity recovers a planted jump and slopes exactly") {
    import spark.implicits._
    // y = 200 + 3x left of the cutoff, y = 700 + 5x at/right of it:
    // perfectly linear sides, so the integer OLS is exact — the fit
    // must read back a_l = 200, a_r = 700, effect = 500,
    // b_l_micro = 3000, b_r_micro = 5000
    val band = ((-50 to -1).map(x => (x.toLong, 200L + 3L * x)) ++
      (0 to 50).map(x => (x.toLong, 700L + 5L * x))).toDF("x", "y")
    val r = ops.Robust.rddFit(band).head()
    assert(r.getLong(0) == 50L && r.getLong(1) == 51L, s"band sizes: $r")
    assert(r.getLong(2) == 200L, s"left intercept: $r")
    assert(r.getLong(3) == 700L, s"right intercept: $r")
    assert(r.getLong(4) == 500L, s"planted jump: $r")
    assert(r.getLong(5) == 3000L && r.getLong(6) == 5000L, s"slopes: $r")
  }

  test("regression discontinuity on a no-jump line reads effect 0") {
    import spark.implicits._
    val band = (-40 to 40).map(x => (x.toLong, 1000L + 2L * x)).toDF("x", "y")
    val r = ops.Robust.rddFit(band).head()
    assert(r.getLong(4) == 0L, s"continuous line must show no effect: $r")
    assert(r.getLong(5) == 2000L && r.getLong(6) == 2000L, s"slopes: $r")
  }

  test("jackknife == driver-side leave-one-out recomputation") {
    val users = Tables.load(spark, sf001, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("s_i"),
        count(lit(1)).as("t_i"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val (bigS, bigT, n) = (users.map(_._1).sum, users.map(_._2).sum, users.length.toLong)
    val th = users.map { case (si, ti) => (bigS - si) / (bigT - ti) }
    val mean = th.sum / n
    val ss = th.map(x => (x - mean) * (x - mean)).sum
    val want = (n, bigS / bigT, n * (bigS / bigT) - (n - 1) * mean, (n - 1) * (ss / n))
    val r = ops.Robust.jackknife.fn(spark, sf001).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == want,
      s"got $r want $want")
    assert(r.getLong(3) >= 0L, "variance is nonnegative")
  }

  test("hill tail index: closed form holds with the adaptive k") {
    val r = ops.Robust.tailIndex.fn(spark, sf001).head()
    val (k, thr, sumMicro, alpha) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // sf0.001 has 15 users -> k = 5 (min(50, n/3))
    assert(k == 5L, s"adaptive k: $k")
    assert(thr > 0L && sumMicro > 0L)
    assert(alpha == k * 1000000000000L / sumMicro, "alpha closed form")
    // recompute the log terms from the raw spends
    val spends = Tables.load(spark, sf001, "events")
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("x"))
      .collect().map(r2 => (r2.getLong(1), r2.getLong(0)))
      .sortBy { case (x, u) => (-x, u) }
    assert(spends(5)._1 == thr, "threshold is the (k+1)-th order statistic")
    val want = (0 until 5).map(i =>
      math.round(1000000.0 * math.log(spends(i)._1.toDouble / thr))).sum
    assert(sumMicro == want, s"log-term sum: $sumMicro vs $want")
  }

  test("hill alpha: steeper rank decay (heavier tail) gives smaller alpha") {
    def alphaOf(xs: Seq[Long]): Long = {
      val sorted = xs.sortBy(-_)
      val thr = sorted(50)
      val t = (0 until 50).map(i =>
        math.round(1000000.0 * math.log(sorted(i).toDouble / thr))).sum
      50L * 1000000000000L / t
    }
    val alpha1 = alphaOf((1 to 60).map(i => 1000000L / i.toLong))         // ~1
    val alpha13 = alphaOf((1 to 60).map(i => 1000000L / (i.toLong * i * i))) // ~1/3
    assert(alpha13 < alpha1, s"x~i^-3 must read heavier than x~i^-1: $alpha13 $alpha1")
  }
}
