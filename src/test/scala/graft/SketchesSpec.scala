package graft

import org.apache.spark.sql.functions._

/** Sketch-operator invariants beyond the driver's bound-checked hash
  * (ops.Sketches). */
class SketchesSpec extends SparkSpec {

  test("CMS estimates never undercount any key (not just the top-10)") {
    val li = Tables.load(spark, sf001, "lineitem")
    val skBytes = li
      .select(expr("count_min_sketch(l_partkey, 0.001d, 0.99d, 42) AS sk"))
      .head().getAs[Array[Byte]]("sk")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))
    val exact = li.groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(exact.nonEmpty)
    exact.foreach { case (key, cnt) =>
      assert(cms.estimateCount(key) >= cnt,
        s"CMS undercounted key $key: ${cms.estimateCount(key)} < $cnt")
    }
  }

  test("merging per-shard HLL sketches == sketching the whole column") {
    val o = Tables.load(spark, sf001, "orders")
    val merged = o.groupBy("o_orderpriority")
      .agg(expr("hll_sketch_agg(o_custkey)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .head().getLong(0)
    val direct = o
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))").as("est"))
      .head().getLong(0)
    assert(merged == direct,
      s"sketch merge must be lossless vs direct sketching: $merged vs $direct")
    val exact = o.agg(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact <= 0.05,
      s"estimate $merged drifted >5% from exact $exact")
  }

  test("bloom prune: no false negatives, genuine pruning, result == plain join") {
    val dim = Tables.load(spark, sf001, "supplier")
      .filter(col("s_nationkey") === 3).select(col("s_suppkey"))
    val bf = dim.agg(graft.functions.BloomAgg
        .build(xxhash64(col("s_suppkey")), 1000L, 16384L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val li = Tables.load(spark, sf001, "lineitem").select(col("l_suppkey"))
    val total = li.count()
    val pass = li.filter(graft.functions.BloomAgg
      .mightContain(lit(bf), xxhash64(col("l_suppkey")))).count()
    val matched = li.join(dim, col("l_suppkey") === col("s_suppkey")).count()
    assert(pass >= matched, "a Bloom filter can never drop a true match")
    assert(pass < total, s"the filter must actually prune ($pass of $total passed)")
    // and the full query's exact confirming join erases false positives
    val got = ops.Sketches.bloomPrune.fn(spark, sf001)
      .agg(sum(col("n_lines"))).head().getLong(0)
    assert(got == matched)
  }

  // --- repo-owned HLL register sketch (graft.functions.HllAgg) ---------

  import graft.functions.HllAgg
  import spark.implicits._
  private val P = 10

  test("HllAgg: shard-built-then-unioned registers are IDENTICAL to one global build") {
    val df = (0L until 20000L).map(i => (i % 7, i * 31 + 5)).toDF("shard", "key")
    val direct = df.agg(HllAgg.build(xxhash64(col("key")), P).as("r"))
      .head().getSeq[Int](0)
    val merged = df.groupBy("shard")
      .agg(HllAgg.build(xxhash64(col("key")), P).as("r"))
      .agg(HllAgg.union(col("r"), P).as("r"))
      .head().getSeq[Int](0)
    assert(direct == merged, "register max is associative — merge must be lossless")
    // and union is idempotent: merging the merged with itself changes nothing
    val twice = df.groupBy("shard")
      .agg(HllAgg.build(xxhash64(col("key")), P).as("r"))
      .unionByName(df.groupBy("shard")
        .agg(HllAgg.build(xxhash64(col("key")), P).as("r")))
      .agg(HllAgg.union(col("r"), P).as("r"))
      .head().getSeq[Int](0)
    assert(twice == direct, "union must be idempotent")
  }

  test("HllAgg: estimate within the 3-sigma published envelope across regimes") {
    val env = 3 * HllAgg.stdError(P)
    // linear-counting regime (n << 2.5m) and raw regime (n >> 4m)
    for (n <- Seq(100L, 1500L, 50000L)) {
      val est = spark.range(n).select(xxhash64(col("id") * 2654435761L).as("h"))
        .agg(HllAgg.build(col("h"), P).as("r"))
        .select(HllAgg.estimate(col("r"), P)).head().getDouble(0)
      assert(math.abs(est - n) / n <= env,
        s"n=$n estimate $est outside ${env * 100}%")
    }
  }

  test("HllAgg: null hashes are skipped, matching COUNT(DISTINCT)") {
    val df = Seq[java.lang.Long](1L, 2L, null, 2L, null).toDF("k")
    val withNulls = df.agg(HllAgg.build(
      when(col("k").isNotNull, xxhash64(col("k"))), P).as("r"))
      .head().getSeq[Int](0)
    val without = df.na.drop().agg(HllAgg.build(xxhash64(col("k")), P).as("r"))
      .head().getSeq[Int](0)
    assert(withNulls == without)
    val est = df.agg(HllAgg.build(
        when(col("k").isNotNull, xxhash64(col("k"))), P).as("r"))
      .select(HllAgg.estimate(col("r"), P)).head().getDouble(0)
    assert(math.round(est) == 2L, s"2 distinct non-null keys, est $est")
  }

  test("HllAgg: empty input estimates exactly zero") {
    val est = spark.range(0).select(xxhash64(col("id")).as("h"))
      .agg(HllAgg.build(col("h"), P).as("r"))
      .select(HllAgg.estimate(col("r"), P)).head().getDouble(0)
    assert(est == 0.0)
  }

  // --- q-digest quantile sketch (graft.functions.QDigestAgg) -----------

  import graft.functions.QDigestAgg

  private def exactRank(vals: Seq[Long], x: Long): Long = vals.count(_ <= x).toLong

  test("QDigest: uncompressed digest answers ranks exactly") {
    val vals = (1L to 100L).map(v => v * 3 % 101)
    val df = vals.toDF("v")
    val entries = df.agg(QDigestAgg.build(col("v"), 8, 1024).as("d"))
      .head().getSeq[org.apache.spark.sql.Row](0).map(r => (r.getLong(0), r.getLong(1)))
    // n/k < 1 → no compression → every leaf exact
    assert(entries.size == vals.distinct.size)
    for (tr <- Seq(1L, 25L, 50L, 99L)) {
      val est = QDigestAgg.quantile(entries, 8, tr)
      assert(exactRank(vals, est) >= tr && exactRank(vals, est - 1) < tr,
        s"rank $tr → $est is not the exact quantile")
    }
  }

  test("QDigest: compressed digest keeps the deterministic rank bound, size stays sketch-sized") {
    val bits = 16; val k = 64
    // skewed data: heavy mass at small values + a long uniform tail
    val vals: Seq[Long] = (0 until 20000).map { i =>
      if (i % 3 != 0) (i % 7).toLong else (i.toLong * 131) % 60000
    }
    val n = vals.size.toLong
    for (parts <- Seq(1, 7, 32)) { // merge order must not break the bound
      val df = vals.toDF("v").repartition(parts)
      val entries = df.agg(QDigestAgg.build(col("v"), bits, k).as("d"))
        .head().getSeq[org.apache.spark.sql.Row](0).map(r => (r.getLong(0), r.getLong(1)))
      assert(entries.map(_._2).sum == n, "digest must conserve total mass")
      assert(entries.size <= 3 * k + bits,
        s"digest grew past sketch size: ${entries.size} entries")
      for (phi <- Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
        val target = math.ceil(phi * n).toLong
        val est = QDigestAgg.quantile(entries, bits, target)
        val err = math.abs(exactRank(vals, est) - target)
        assert(err * k <= n * bits,
          s"parts=$parts phi=$phi: rank error $err exceeds n*L/k=${n * bits / k}")
      }
    }
  }

  test("QDigest: values outside the universe fail loudly") {
    val df = Seq(5L, 300L).toDF("v")
    val e = intercept[Exception](
      df.agg(QDigestAgg.build(col("v"), 8, 64)).head())
    assert(e.getMessage != null)
  }

  test("declared query: q_quantile_sketch all bound columns true") {
    val rows = ops.Sketches.quantileSketch.fn(spark, sf001).collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getAs[Boolean]("ok"), s"bound violated on $r"))
    // monotone: higher phi → higher (or equal) exact quantile
    val ex = rows.sortBy(_.getAs[Int]("phi_permille")).map(_.getAs[Long]("exact_cents"))
    assert(ex.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
  }

  test("declared query: q_hll_registers all envelope columns true") {
    val rows = ops.Sketches.hllRegisters.fn(spark, sf001).collect()
    assert(rows.length == 6) // 5 event types + __ALL__
    rows.foreach { r =>
      assert(r.getAs[Boolean]("users_ok") && r.getAs[Boolean]("events_ok"),
        s"envelope violated on $r")
    }
  }

  test("CountMinAgg: cells equal the declarative recomputation; merge is partition-free") {
    import graft.functions.CountMinAgg
    import spark.implicits._
    val keys = (Seq.fill(500)(7L) ++ (0L until 400L) ++ Seq.fill(50)(123456789L))
    // declarative reference: per (row, bucket) counts
    val want = Array.fill(CountMinAgg.Depth * CountMinAgg.Width)(0L)
    keys.foreach { k =>
      (0 until CountMinAgg.Depth).foreach { i =>
        want(i * CountMinAgg.Width + CountMinAgg.bucket(k, i)) += 1L
      }
    }
    for (parts <- Seq(1, 3, 17)) {
      val got = keys.toDF("k").repartition(parts)
        .agg(CountMinAgg.build(col("k"))).head().getSeq[Long](0)
      assert(got.toArray.sameElements(want),
        s"cells diverge from the declarative recomputation at $parts partitions")
    }
    // the never-undercount invariant over EVERY key, and exactness on
    // the planted heavy hitter (its cells may still collide, so only >=)
    val cells = want.toIndexedSeq
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (k, n) =>
      assert(CountMinAgg.estimate(cells, k) >= n, s"undercount on $k")
    }
    assert(CountMinAgg.estimate(cells, 7L) >= 500L)
  }

  test("QDigestUnionAgg: shard-then-union answers rank queries within the composed bound") {
    import graft.functions.QDigestAgg
    import spark.implicits._
    val bits = 16; val k = 64
    // skewed synthetic: heavy mass at low values, a thin far tail,
    // split across 4 uneven shards
    val rnd = new scala.util.Random(71)
    val vals = (Seq.fill(4000)(rnd.nextInt(100).toLong) ++
      Seq.fill(400)(1000L + rnd.nextInt(5000)) ++
      Seq.fill(40)(60000L + rnd.nextInt(500)))
    val df = vals.zipWithIndex
      .map { case (v, i) => (s"shard${i % 4}", v) }.toDF("src", "v")
    val perShard = df.groupBy("src")
      .agg(QDigestAgg.build(col("v"), bits, k).as("d"))
    val head = perShard
      .agg(QDigestAgg.union(col("d"), bits, k).as("d")).head()
    val entries = head.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = vals.length.toLong
    // total mass survives the union exactly
    assert(entries.map(_._2).sum == n, "mass lost in union")
    val sorted = vals.sorted
    for (phi <- Seq(250, 500, 900, 990)) {
      val target = (phi * n + 999) / 1000
      val est = QDigestAgg.quantile(entries, bits, target)
      val trueRank = sorted.count(_ <= est).toLong
      assert(math.abs(trueRank - target) * k <= 2L * n * bits,
        s"phi $phi: rank $trueRank vs target $target outside 2nL/k")
    }
  }

  test("QDigest compress: a fold that removes a parent re-examines its children") {
    // ADVICE r17 scenario: thr = 10 (n = 160, k = 16), counts a=3,
    // sib=3, par=5 — the (a, sib, par) triple fails at 11, then par's
    // OWN triple folds par away (5 < 10), which drops a+sib to 6 and
    // makes the children pair foldable. A created-parents-only rescan
    // left the stale {8:3, 9:3} in the digest; the full fixpoint folds
    // them into 4, then fails (4,5,2) at 6+5=11. The far leaf only
    // inflates n.
    import graft.functions.QDigestAgg
    import spark.implicits._
    val big = (1L << 24) + 1000000L
    val out = Seq(Seq((8L, 3L), (9L, 3L), (4L, 5L), (big, 149L))).toDF("d")
      .agg(QDigestAgg.union(col("d"), 24, 16)).head()
      .getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out == Seq((1L, 5L), (2L, 6L), (big, 149L)),
      s"expected the full-fixpoint digest, got $out")
  }

  test("QDigest union rejects node ids outside the universe's dyadic tree") {
    import graft.functions.QDigestAgg
    import spark.implicits._
    // id 0 is the open-map's empty-slot sentinel: silently accepting
    // it would drop the count into an invisible slot
    val ex = intercept[Exception] {
      Seq(Seq((0L, 5L))).toDF("d")
        .agg(QDigestAgg.union(col("d"), 24, 16)).head()
    }
    assert(ex.getMessage != null)
  }

  test("CMS join-size estimate never undercounts and is exact on collision-free keys") {
    import spark.implicits._
    import graft.functions.CountMinAgg
    // two sides over a tiny key set (no bucket collisions at 256
    // buckets w.h.p. for 5 keys; verified below), fan-outs 1..5 / 2..6
    val keysA = (1L to 5L).flatMap(k => Seq.fill(k.toInt)(k))
    val keysB = (1L to 5L).flatMap(k => Seq.fill(k.toInt + 1)(k))
    val ca = keysA.toDF("k").agg(CountMinAgg.build(col("k"))).head().getSeq[Long](0)
    val cb = keysB.toDF("k").agg(CountMinAgg.build(col("k"))).head().getSeq[Long](0)
    val exact = (1L to 5L).map(k => k * (k + 1)).sum
    val w = CountMinAgg.Width
    val dots = (0 until CountMinAgg.Depth).map(i =>
      (0 until w).map(j => ca(i * w + j) * cb(i * w + j)).sum)
    dots.foreach(d => assert(d >= exact, s"undercount: $d < $exact"))
    // collision-free rows are exactly Σ c_k·p_k
    for (i <- 0 until CountMinAgg.Depth) {
      val buckets = (1L to 5L).map(CountMinAgg.bucket(_, i))
      if (buckets.distinct.length == 5) assert(dots(i) == exact, s"row $i")
    }
    assert(dots.exists(_ == exact), "at least one collision-free row expected")
  }

  test("KMV set difference: exact mode below k, estimates deterministic and consistent") {
    val rows = ops.Sketches.kmvDifference.fn(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.keySet == Set("a_only", "b_only", "both"))
    // sf0.001 has far fewer than k=64 active users: the sketch IS the
    // set, theta = 2^48, so every estimate equals its exact truth
    val union = rows.values.map(_._3).sum
    assert(union < ops.Sketches.KmvK, s"fixture grew past exact mode: $union")
    rows.foreach { case (region, (nS, est, exact)) =>
      assert(nS == exact && est == exact,
        s"$region: exact mode must be exact ($nS, $est, $exact)")
    }
  }
}
