package graft

import org.apache.spark.sql.functions._

/** Invariants of the profiling/normalization operators (ops.Profile)
  * beyond the row-hash oracle: statistical properties of the z-score
  * and the clip-bound semantics of winsorization. */
class ProfileSpec extends SparkSpec {

  test("group z-score: per-group mean ~0, scale ~1000, order-preserving") {
    val out = ops.Profile.groupZscore.fn(spark, sf001)
    val stats = out.groupBy("event_type")
      .agg(avg(col("z_milli")).as("m"),
        stddev_pop(col("z_milli")).as("sd"),
        count(lit(1)).as("n"))
      .collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      // floor() biases each z down by <1 milli, so the mean sits in
      // (-1, 0]; the population scale is 1000 milli by construction
      assert(math.abs(r.getAs[Double]("m")) < 1.0, s"mean off: $r")
      assert(math.abs(r.getAs[Double]("sd") - 1000.0) < 10.0, s"scale off: $r")
    }
    // z is monotone in the raw value within a group
    val inverted = out.as("a").join(out.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.c") < col("b.c") && col("a.z_milli") > col("b.z_milli"))
      .count()
    assert(inverted == 0L, "z-score must preserve value order within a group")
  }

  test("winsorize: thresholds bound the clipped sum, clip counts are non-vacuous") {
    val out = ops.Profile.winsorize.fn(spark, sf001).collect()
    assert(out.nonEmpty)
    val p5 = out.head.getAs[Long]("p5")
    val p95 = out.head.getAs[Long]("p95")
    assert(p5 < p95)
    // the rank definition: ~5% of the corpus sits strictly below p5,
    // ~5% strictly above p95 (ties can only shrink the tails)
    val total = out.map(_.getAs[Long]("total")).sum
    val low = out.map(_.getAs[Long]("n_low")).sum
    val high = out.map(_.getAs[Long]("n_high")).sum
    assert(low > 0 && low <= total / 20, s"low tail $low of $total")
    assert(high > 0 && high <= total / 20, s"high tail $high of $total")
    out.foreach { r =>
      val n = r.getAs[Long]("total")
      val sum = r.getAs[Long]("sum_clipped")
      assert(sum >= n * p5 && sum <= n * p95, s"clipped sum outside bounds: $r")
    }
    // and the exact percentile matches the sort-based definition
    val chars = Tables.load(spark, sf001, "documents")
      .select(col("n_chars")).orderBy("n_chars")
      .collect().map(_.getLong(0))
    val k5 = (chars.length + 19) / 20
    val k95 = (19 * chars.length + 19) / 20
    assert(p5 == chars(k5 - 1), "p5 == value at rank ceil(0.05 n)")
    assert(p95 == chars(k95 - 1), "p95 == value at rank ceil(0.95 n)")
  }

  test("quantile bins: contiguous coverage, populations near n/4 up to boundary ties") {
    val out = ops.Profile.quantileBins.fn(spark, sf001).collect()
    assert(out.map(_.getAs[Long]("bin")).toSeq == Seq(1L, 2L, 3L, 4L))
    val n = out.map(_.getAs[Long]("n_docs")).sum
    out.foreach { r =>
      // equi-depth up to ties on the boundary values: each bin holds
      // 25% give or take the heaviest tied value's population
      assert(math.abs(r.getAs[Long]("n_docs") - n / 4) <= n / 10, s"bin off: $r")
    }
    // bins tile the value range without overlap
    val ranges = out.sortBy(_.getAs[Long]("bin"))
      .map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi < lo, "bins must not overlap")
    }
  }

  test("temperature sampling: alpha=0.5 upweights low-resource languages") {
    val out = llm.Sampling.temperature.fn(spark, sf001).collect()
    val byLang = out.map(r => r.getAs[String]("lang") ->
      (r.getAs[Long]("total"), r.getAs[Long]("permil"), r.getAs[Long]("kept"))).toMap
    val (maxLang, (maxN, maxPermil, _)) = byLang.maxBy(_._2._1)
    byLang.foreach { case (lang, (n, permil, kept)) =>
      if (lang != maxLang && n < maxN)
        assert(permil > maxPermil,
          s"$lang (n=$n) must keep a higher share than $maxLang (n=$maxN)")
      // the md5 coin is uniform: kept/total tracks permil/1000 loosely
      val expect = n * permil / 1000.0
      assert(math.abs(kept - expect) <= math.max(8.0, expect * 0.5),
        s"$lang kept $kept vs expected ~$expect")
    }
  }

  test("chi-square cells recompute from raw contingency counts; statistic is their sum") {
    val raw = Tables.load(spark, sf001, "documents")
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = raw.length.toLong
    val rt = raw.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ct = raw.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val cells = raw.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = ops.Profile.chi2Independence.fn(spark, sf001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == cells.keySet)
    // same IEEE op order as the query: (n·o − r·c)² / ((n·r)·c), ×1e6, round
    val terms = cells.map { case ((l, s), o) =>
      val (r, c) = (rt(l), ct(s))
      val dd = (n * o - r * c).toDouble
      (l, s) -> (math.round((r * c).toDouble / n.toDouble * 1000000.0),
        math.round(dd * dd / ((n.toDouble * r.toDouble) * c.toDouble) * 1000000.0))
    }
    val chi2 = terms.values.map(_._2).sum
    for (((l, s), (e, term)) <- terms)
      assert(got((l, s)) == ((cells((l, s)), e, term, chi2)), s"cell ($l,$s)")
  }

  test("gini closed forms: uniform revenue => 0, one-hot => floor(1000(n-1)/n)") {
    import spark.implicits._
    // group 1: five equal suppliers (perfect equality); group 2: one
    // supplier holds everything (maximal inequality at n = 4)
    val rev = (
      (1 to 5).map(i => (1L, i.toLong, 700L)) ++
      Seq((2L, 1L, 0L), (2L, 2L, 0L), (2L, 3L, 0L), (2L, 4L, 900L))
    ).toDF("nk", "sk", "cents")
    val got = ops.Profile.giniByGroup(rev)
      .selectExpr("nk", "(1000 * num) div (n * tot) as g")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 0L, s"uniform group must have zero Gini, got ${got(1L)}")
    assert(got(2L) == 750L, s"one-hot n=4 must give 750 permille, got ${got(2L)}")
  }

  test("gini is scale-invariant and monotone under a mean-preserving spread") {
    import spark.implicits._
    def g(xs: Seq[Long]): Long = {
      val rev = xs.zipWithIndex.map { case (x, i) => (1L, i.toLong, x) }
        .toDF("nk", "sk", "cents")
      ops.Profile.giniByGroup(rev)
        .selectExpr("(1000 * num) div (n * tot) as g").head().getLong(0)
    }
    val base = Seq(100L, 200L, 300L, 400L)
    assert(g(base) == g(base.map(_ * 7)), "Gini must ignore units")
    // move 50 from the poorest to the richest: inequality strictly up
    assert(g(Seq(50L, 200L, 300L, 450L)) > g(base))
  }

  test("v-optimal histogram: the emitted split beats every other split (brute force)") {
    val counts = Tables.load(spark, sf001, "events")
      .groupBy(hour(col("ts")).cast("long").as("h"))
      .agg(count(lit(1)).as("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val v = (0 until 24).map(h => counts.getOrElse(h.toLong, 0L))
    def err(lo: Int, hi: Int): Long = { // hours lo..hi inclusive
      val seg = v.slice(lo, hi + 1)
      val (sv, sv2, n) = (seg.sum, seg.map(x => x * x).sum, (hi - lo + 1).toLong)
      1000L * sv2 - (1000L * sv * sv) / n
    }
    val all = for (a <- 0 to 21; b <- a + 1 to 22)
      yield (a.toLong, b.toLong, err(0, a) + err(a + 1, b) + err(b + 1, 23))
    val want = all.minBy { case (a, b, e) => (e, a, b) }
    val got = ops.Profile.voptHistogram.fn(spark, sf001).head()
    assert((got.getLong(0), got.getLong(1), got.getLong(5)) == want,
      s"got $got want $want")
    assert(all.forall(_._3 >= got.getLong(5)), "emitted split must be optimal")
  }

  test("matrix profile == driver-side brute force on the same daily series") {
    val cents = Tables.load(spark, sf001, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("c"))
      .select(datediff(col("day"), lit(java.sql.Date.valueOf("2024-01-01")))
        .cast("long").as("d"), col("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val v = (0 until 31).map(d => cents.getOrElse(d.toLong, 0L))
    def sad(i: Int, j: Int): Long =
      (0 until 7).map(t => math.abs(v(i + t) - v(j + t))).sum
    val want = (0 until 25).map { i =>
      val cands = (0 until 25).filter(j => math.abs(i - j) >= 4)
        .map(j => (sad(i, j), j.toLong)).min
      (i.toLong, cands._2, cands._1)
    }
    val discord = want.map(_._3).max
    val got = ops.Robust.matrixProfile.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.map(t => (t._1, t._2, t._3)).toSeq == want, "profile mismatch")
    got.foreach { case (_, _, p, flag) => assert(flag == (p == discord)) }
  }

  test("isolation forest == driver-side tree growth with the same md5 coins") {
    val base = Tables.load(spark, sf001, "orders").select(
      col("o_orderkey"),
      round(col("o_totalprice") * 100, 0).cast("long"),
      datediff(to_date(col("o_orderdate")),
        lit(java.sql.Date.valueOf("1992-01-01"))).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // grow each tree level by level exactly like the query
    var nodes: Map[(Long, Long), Seq[(Long, Long, Long)]] =
      (0L to 3L).map(t => (t, 1L) -> base.toSeq).toMap
    for (_ <- 1 to 3) {
      nodes = nodes.toSeq.flatMap { case ((tree, node), rs) =>
        val hex = md5hex(s"$tree:$node")
        val h1 = hex(0).toLong * 256 + hex(1).toLong
        val h2m = (hex(2).toLong * 256 + hex(3).toLong) % 1009
        val dim = (h1 % 2).toInt
        def f(r: (Long, Long, Long)) = if (dim == 0) r._2 else r._3
        val (mn, mx) = (rs.map(f).min, rs.map(f).max)
        val thr = mn + h2m * (mx - mn) / 1009
        val (right, left) = rs.partition(r => f(r) > thr)
        Seq((tree, node * 2) -> left, (tree, node * 2 + 1) -> right)
          .filter(_._2.nonEmpty)
      }.toMap
    }
    def cMilli(n: Long): Long =
      if (n <= 1) 0L
      else math.round(1000.0 * (2.0 * (math.log((n - 1).toDouble)
        + 0.5772156649015329) - 2.0 * (n - 1) / n))
    val score = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(12000L)
    val leafMin = scala.collection.mutable.Map.empty[Long, Long]
    for (((_, _), rs) <- nodes; c = cMilli(rs.length); r <- rs) {
      score(r._1) = score(r._1) + c
      leafMin(r._1) = math.min(leafMin.getOrElse(r._1, Long.MaxValue), rs.length.toLong)
    }
    val want = score.toSeq.map { case (k, sc) => (sc, k) }.sorted.take(20)
      .map { case (sc, k) => (k, sc, leafMin(k)) }
    val got = ops.Profile.isolationForest.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"got ${got.take(3)}... want ${want.take(3)}...")
  }

  test("mahalanobis top-20 == driver-side recomputation with the same IEEE chain") {
    val users = Tables.load(spark, sf001, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"),
        count(lit(1)).as("y"))
      .selectExpr("o_custkey", "cents div 100000 AS x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = users.length.toLong
    val sx = users.map(_._2).sum; val sy = users.map(_._3).sum
    val a = n * users.map(u => u._2 * u._2).sum - sx * sx
    val b = n * users.map(u => u._2 * u._3).sum - sx * sy
    val c = n * users.map(u => u._3 * u._3).sum - sy * sy
    val det = a.toDouble * c.toDouble - b.toDouble * b.toDouble
    val want = users.map { case (k, x, y) =>
      val dx = (n * x - sx).toDouble; val dy = (n * y - sy).toDouble
      val md2 = math.round(1000000.0 *
        ((c.toDouble * dx * dx - 2.0 * b.toDouble * dx * dy
          + a.toDouble * dy * dy) / det))
      (k, x, y, md2)
    }.sortBy { case (k, _, _, m) => (-m, k) }.take(20).toList
    val got = ops.Profile.mahalanobis.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toList
    assert(got == want, s"got ${got.take(3)} want ${want.take(3)}")
    assert(got.head._4 > got.last._4, "top-20 must actually discriminate")
  }

  test("fairness audit == driver-side confusion-cell recomputation per nation") {
    val rows = Tables.load(spark, sf001, "orders")
      .join(Tables.load(spark, sf001, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long"),
        (round(col("o_totalprice") * 100, 0).cast("long") > 30000000L).as("pred"),
        (col("o_orderpriority").startsWith("1-") ||
          col("o_orderpriority").startsWith("2-")).as("y"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    def rates(rs: Seq[(Long, Boolean, Boolean)]) = {
      val n = rs.length.toLong
      val pos = rs.count(_._3).toLong
      (1000L * rs.count(_._2) / n,
        if (pos == 0) None else Some(1000L * rs.count(t => t._2 && t._3) / pos),
        if (n == pos) None else Some(1000L * rs.count(t => t._2 && !t._3) / (n - pos)))
    }
    val (selAll, tprAll, fprAll) = rates(rs = rows.toSeq)
    val got = ops.Profile.fairnessAudit.fn(spark, sf001).collect()
    val nations = Tables.load(spark, sf001, "nation")
      .selectExpr("CAST(n_nationkey AS BIGINT)", "n_name").collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    got.foreach { r =>
      val nk = nations(r.getString(0))
      val grp = rows.toSeq.filter(_._1 == nk)
      val (sel, tpr, fpr) = rates(grp)
      assert(r.getLong(1) == grp.length.toLong, s"${r.getString(0)} n")
      assert(r.getLong(2) == sel, s"${r.getString(0)} selection rate")
      assert(r.getLong(5) == sel - selAll, s"${r.getString(0)} dp gap")
      (tpr, fpr, tprAll, fprAll) match {
        case (Some(t), Some(f), Some(ta), Some(fa)) =>
          assert(r.getLong(6) == math.max(math.abs(t - ta), math.abs(f - fa)),
            s"${r.getString(0)} eo gap")
        case _ => ()
      }
    }
  }

  test("fd discovery: key FDs hold with fanout 1, failing FDs show real violations") {
    val got = ops.Profile.fdDiscovery.fn(spark, sf001).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    val key = got("o_orderkey->o_custkey")
    assert(key._2 == 0L && key._3 == 1L && key._4, s"primary key FD must hold: $key")
    val fail = got("o_custkey->o_orderstatus")
    assert(!fail._4 && fail._3 > 1L && fail._2 > 0L, s"status FD must fail: $fail")
    // n_lhs equals the true distinct count of the LHS
    val nCust = Tables.load(spark, sf001, "orders")
      .select("o_custkey").distinct().count()
    assert(fail._1 == nCust, s"LHS group count: ${fail._1} vs $nCust")
    got.values.foreach { case (n, viol, fan, holds) =>
      assert(holds == (viol == 0L), "flag must mirror the violation count")
      assert(viol <= n && fan >= 1L)
    }
  }

  test("impute: median repair arithmetic and bias accounting are exact") {
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ev = Tables.load(spark, sf001, "events")
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = ops.Profile.impute.fn(spark, sf001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    ev.groupBy(_._1).foreach { case (t, rs) =>
      val miss = rs.filter(r => md5hex(r._2.toString)(11) % 4 == 0)
      val obs = rs.filterNot(r => md5hex(r._2.toString)(11) % 4 == 0)
        .sortBy(r => (r._3, r._2)).map(_._3)
      val n = obs.length
      val median = (obs((n + 1) / 2 - 1) + obs(n / 2)) / 2
      val (gn, gm, gmed, gimp, gtrue, gbias) = got(t)
      assert(gn == rs.length.toLong && gm == miss.length.toLong, s"$t counts")
      assert(gmed == median, s"$t median: $gmed vs $median")
      assert(gimp == obs.sum + gm * median, s"$t imputed sum")
      assert(gtrue == rs.map(_._3).sum && gbias == gimp - gtrue, s"$t bias")
    }
  }

  test("simpson audit: a planted reversal flips every group against the pool") {
    import spark.implicits._
    // classic construction: within each group y DECREASES in x, but
    // group B sits at both higher x and much higher y, so pooled the
    // association turns positive — every group must flag reversed
    val rows = (
      (0 until 50).map(i => ("A", i.toLong % 5, 100L - (i % 5) * 10L)) ++
      (0 until 50).map(i => ("B", 10L + i % 5, 1000L - (i % 5) * 10L))
    ).toDF("g", "x", "y")
    val out = ops.Profile.simpsonAudit(rows).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(out("A")._1 == -1L && out("B")._1 == -1L, s"within-group negative: $out")
    assert(out("A")._2 > 0L, "pooled positive")
    assert(out("A")._3 && out("B")._3, "both groups must flag the reversal")
    // and a consistent frame must NOT flag
    val consistent = (0 until 40).map(i => ("A", i.toLong % 7, (i % 7) * 3L))
      .toDF("g", "x", "y")
    val c = ops.Profile.simpsonAudit(consistent).collect().head
    assert(!c.getBoolean(5), "aligned association must not flag")
  }
}
