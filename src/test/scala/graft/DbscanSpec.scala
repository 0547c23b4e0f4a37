package graft

import org.apache.spark.sql.functions._
import graft.llm.Dbscan

/** DBSCAN's graph reformulation against a sequential brute-force
  * reference, plus the declared query's planted-blob recovery. */
class DbscanSpec extends SparkSpec {
  import spark.implicits._

  /** Textbook sequential DBSCAN over an explicit neighbor list:
    * returns (coreIds, clusterOf: id -> min-core-id component label,
    * borderOf: id -> adopted label). */
  private def dbscanRef(ids: Seq[Long], pairs: Seq[(Long, Long)],
      minPts: Int): (Set[Long], Map[Long, Long], Map[Long, Long]) = {
    val nbrs = ids.map(i => i -> scala.collection.mutable.Set.empty[Long]).toMap
    pairs.foreach { case (a, b) => nbrs(a) += b; nbrs(b) += a }
    val core = ids.filter(i => nbrs(i).size + 1 >= minPts).toSet
    // components of the core-core subgraph, labeled by min member
    var label = core.map(i => i -> i).toMap
    var changed = true
    while (changed) {
      changed = false
      for (a <- core; b <- nbrs(a) if core(b)) {
        val m = math.min(label(a), label(b))
        if (label(a) != m || label(b) != m) {
          label += a -> m; label += b -> m; changed = true
        }
      }
    }
    val border = ids.filterNot(core)
      .flatMap(i => {
        val coreNb = nbrs(i).filter(core).map(label)
        if (coreNb.isEmpty) None else Some(i -> coreNb.min)
      }).toMap
    (core, label, border)
  }

  test("graph DBSCAN == sequential reference on seeded random pair sets") {
    for (seed <- Seq(5, 17)) {
      val rnd = new scala.util.Random(seed)
      val n = 60L
      val ids = 0L until n
      val pairs = (0 until 260).map { _ =>
        val a = rnd.nextInt(n.toInt).toLong; val b = rnd.nextInt(n.toInt).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val (core, label, border) = dbscanRef(ids, pairs, minPts = 5)
      val got = Dbscan.dbscanFromPairs(
          ids.toDF("vec_id"), pairs.toDF("vec_a", "vec_b"), minPts = 5)
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getString(2)))
      assert(got.length == n, "one row per point")
      got.foreach {
        case (id, Some(c), "core") =>
          assert(core(id) && label(id) == c, s"core $id -> $c")
        case (id, Some(c), "border") =>
          assert(!core(id) && border.get(id).contains(c), s"border $id -> $c")
        case (id, None, "noise") =>
          assert(!core(id) && !border.contains(id), s"noise $id")
        case other => fail(s"malformed row $other")
      }
    }
  }

  test("border point between two clusters adopts the MIN core label") {
    // two 4-cliques {0,1,2,3} and {10,11,12,13} (minPts 4 -> all
    // core), plus point 5 adjacent to one core of EACH clique: border
    // of both, must deterministically adopt min(0, 10) = 0.
    val clique = (xs: Seq[Long]) =>
      for (a <- xs; b <- xs if a < b) yield (a, b)
    val pairs = clique(Seq(0L, 1L, 2L, 3L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) ++ Seq((3L, 5L), (5L, 10L))
    val got = Dbscan.dbscanFromPairs(
        (Seq(0L, 1L, 2L, 3L, 5L, 10L, 11L, 12L, 13L)).toDF("vec_id"),
        pairs.toDF("vec_a", "vec_b"), minPts = 4)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2))).toMap
    assert(got(5L) == ((0L, "border")), got(5L).toString)
    assert(got(0L) == ((0L, "core")) && got(10L) == ((10L, "core")))
    // 5's two edges don't make the cliques one cluster (5 is not core)
    assert(got(13L)._1 == 10L, "cliques must stay separate components")
  }

  test("incremental delta+state == from-scratch DBSCAN, point for point") {
    import graft.llm.Dbscan
    val rnd = new scala.util.Random(47)
    // synthetic assigned frame: 3 blocks, 2-d vectors in [0,1)^2
    val pts = (0L until 50L).map { i =>
      (i, Seq(rnd.nextDouble(), rnd.nextDouble()), (i % 3).toString)
    }
    val df = pts.toDF("vec_id", "v", "block")
    val hist = df.filter(col("vec_id") < 40)
    val delta = df.filter(col("vec_id") >= 40)
    val minSim = 0.98
    val statePairs = Dbscan.pairsAmongAssigned(hist, hist, minSim)
    val deltaPairs = Dbscan.pairsAmongAssigned(delta, df, minSim)
    val incrDeg = Dbscan.pairDegrees(statePairs)
      .unionByName(Dbscan.pairDegrees(deltaPairs))
      .groupBy("id").agg(sum(col("deg")).as("deg"))
    val incr = Dbscan.dbscanFromDegrees(df, statePairs.unionByName(deltaPairs),
        incrDeg, minPts = 3)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2))).toSet
    val full = Dbscan.dbscanFromPairs(df,
        Dbscan.pairsAmongAssigned(df, df, minSim), minPts = 3)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2))).toSet
    assert(incr == full, s"incremental diverged: ${incr.diff(full)} / ${full.diff(incr)}")
  }

  test("incremental state absorbs a SECOND delta batch and still == from-scratch") {
    import graft.llm.Dbscan
    // ADVICE r16: the single hist/delta split above never exercises
    // the MAINTAINED state as input to a further absorption — this
    // applies batch 2 on top of the state produced by batch 1
    // (merged pair store + additively merged degrees) and re-checks
    // point-for-point equivalence against the from-scratch run,
    // which is the coverage the in-query proof removal cites.
    val rnd = new scala.util.Random(47)
    val pts = (0L until 50L).map { i =>
      (i, Seq(rnd.nextDouble(), rnd.nextDouble()), (i % 3).toString)
    }
    val df = pts.toDF("vec_id", "v", "block")
    val hist = df.filter(col("vec_id") < 35)
    val d1 = df.filter(col("vec_id") >= 35 && col("vec_id") < 45)
    val u1 = df.filter(col("vec_id") < 45)
    val d2 = df.filter(col("vec_id") >= 45)
    val minSim = 0.98
    // bootstrap state from history alone
    val pairs0 = Dbscan.pairsAmongAssigned(hist, hist, minSim)
    val deg0 = Dbscan.pairDegrees(pairs0)
    // absorb batch 1 -> the maintained state (pairs + merged degrees)
    val d1Pairs = Dbscan.pairsAmongAssigned(d1, u1, minSim)
    val pairs1 = pairs0.unionByName(d1Pairs)
    val deg1 = deg0.unionByName(Dbscan.pairDegrees(d1Pairs))
      .groupBy("id").agg(sum(col("deg")).as("deg"))
    // absorb batch 2 against the MAINTAINED state, not the bootstrap
    val d2Pairs = Dbscan.pairsAmongAssigned(d2, df, minSim)
    val pairs2 = pairs1.unionByName(d2Pairs)
    val deg2 = deg1.unionByName(Dbscan.pairDegrees(d2Pairs))
      .groupBy("id").agg(sum(col("deg")).as("deg"))
    val incr = Dbscan.dbscanFromDegrees(df, pairs2, deg2, minPts = 3)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2))).toSet
    val full = Dbscan.dbscanFromPairs(df,
        Dbscan.pairsAmongAssigned(df, df, minSim), minPts = 3)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2))).toSet
    assert(incr == full,
      s"second-batch incremental diverged: ${incr.diff(full)} / ${full.diff(incr)}")
  }

  test("declared incremental query: in-query proofs pass, census covers the union") {
    val rows = graft.llm.Dbscan.dbscanIncremental.fn(spark, sf001).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3)).sum
    assert(total == 512, s"census must cover 500 + 12 planted: $total")
    assert(rows.exists(r => !r.isNullAt(0) && r.getLong(1) >= 13),
      rows.map(_.toString).mkString(", "))
  }

  test("declared query: planted blob is one all-core cluster; census is consistent") {
    val rows = Dbscan.dbscan.fn(spark, sf001).collect()
    val total = rows.map(r => r.getLong(1) + r.getLong(2) + r.getLong(3)).sum
    assert(total == 512, s"census must cover all 500 + 12 planted: $total")
    // the blob cluster exists, with >= 13 core members (12 plants +
    // vector 0 itself, which the identical copies make core too)
    assert(rows.exists(r => !r.isNullAt(0) && r.getLong(1) >= 13),
      rows.map(_.toString).mkString(", "))
  }

  test("levelDbscan == dbscanFromPairs per level on random sim-weighted pair lists") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val n = 40
      val points = (0L until n.toLong).map(i => (i, Seq(0.0))).toDF("vec_id", "v")
      val pairs = (for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong
        if rnd.nextDouble() < 0.15
      } yield (a, b, 0.88 + rnd.nextDouble() * 0.12)).toDF("vec_a", "vec_b", "sim")
      val levels = Seq(900, 950, 980)
      val stacked = llm.Dbscan.levelDbscan(points, pairs, levels, minPts = 3)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2), r.getString(3))).toSet
      val perLevel = levels.flatMap { lp =>
        llm.Dbscan.dbscanFromPairs(points,
            pairs.filter(col("sim") >= lp / 1000.0), minPts = 3)
          .collect()
          .map(r => (lp, r.getLong(0),
            if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
      }.toSet
      assert(stacked == perLevel,
        s"seed $seed: ${stacked.diff(perLevel)} / ${perLevel.diff(stacked)}")
    }
  }

  test("stability rollup: a bridged pair of blobs persists whole at the loose level and fragments at the tight one") {
    // two 4-cliques {0..3} and {10..13}: intra-clique sim 0.99,
    // the bridge 3-10 sim 0.92 — one base cluster at 0.90 that
    // splits into exactly two fragments at 0.95
    val ids = Seq(0L, 1L, 2L, 3L, 10L, 11L, 12L, 13L)
    val points = ids.map(i => (i, Seq(0.0))).toDF("vec_id", "v")
    val clique = (g: Seq[Long]) =>
      for (a <- g; b <- g if a < b) yield (a, b, 0.99)
    val pairs = (clique(Seq(0L, 1L, 2L, 3L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ ((3L, 10L, 0.92)))
      .toDF("vec_a", "vec_b", "sim")
    val perLevel = Seq(900, 950).map { lp =>
      lp -> Dbscan.dbscanFromPairs(points,
        pairs.filter(col("sim") >= lp / 1000.0), minPts = 3)
    }
    val rows = Dbscan.stabilityRollup(perLevel).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // one base cluster (min id 0), all 8 core at 900
    assert(rows.toSeq == Seq(
      (900L, 0L, 8L, 8L, 1L, 1000L),
      (950L, 0L, 8L, 8L, 2L, 1000L)), rows.toSeq.toString)
  }

  test("condensed cut: stable children beat a brief merger") {
    // root holds only the [900, 925) slab (20 pts · 25) before the
    // split; each child keeps 10 pts through [925, 1000) = 750
    val grid = Seq(900, 925, 950, 965, 980)
    val deaths = Map(
      (900, 1L) -> Map(980 -> 20L),
      (925, 1L) -> Map(980 -> 10L),
      (925, 7L) -> Map(980 -> 10L))
    val parents = Seq(((925, 1L), 1L), ((925, 7L), 1L))
    val cut = Dbscan.condensedCut(deaths, parents, grid, minPts = 3)
    assert(cut == Seq(((925, 1L), 1000, 750L), ((925, 7L), 1000, 750L)),
      cut.toString)
  }

  test("condensed cut: a mass-shedding parent beats its small splinters") {
    // 30 of 40 root members die in the first slab but still credit
    // the root 25 each; the split-off children are 5 pts each
    val grid = Seq(900, 925, 950, 965, 980)
    val deaths = Map(
      (900, 1L) -> Map(900 -> 30L, 980 -> 10L),
      (925, 1L) -> Map(980 -> 5L),
      (925, 9L) -> Map(980 -> 5L))
    val parents = Seq(((925, 1L), 1L), ((925, 9L), 1L))
    val cut = Dbscan.condensedCut(deaths, parents, grid, minPts = 3)
    assert(cut == Seq(((900, 1L), 925, 1000L)), cut.toString)
  }

  test("condensed cut: single real children continue the segment; sub-minPts splinters shed") {
    // chain 900 -> 925 (one real child + a 2-pt splinter) -> splits
    // at 950; the long pre-split slab [900, 950) outweighs the kids
    val grid = Seq(900, 925, 950, 965, 980)
    val deaths = Map(
      (900, 1L) -> Map(980 -> 12L),
      (925, 1L) -> Map(980 -> 12L),
      (925, 5L) -> Map(925 -> 2L), // splinter, not a split
      (950, 1L) -> Map(980 -> 6L),
      (950, 8L) -> Map(965 -> 6L))
    val parents = Seq(((925, 1L), 1L), ((925, 5L), 1L),
      ((950, 1L), 1L), ((950, 8L), 1L))
    val cut = Dbscan.condensedCut(deaths, parents, grid, minPts = 3)
    // root: 12·(950−900) = 600; kids: 6·(1000−950) + 6·(980−950) = 480
    assert(cut == Seq(((900, 1L), 950, 600L)), cut.toString)
  }

  test("declared hdbscan extraction: blob floor armed, segments form an antichain") {
    val out = Dbscan.hdbscanExtract.fn(spark, sf001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4)))
    assert(out.nonEmpty)
    out.foreach { case (birth, _, end, n, stab) =>
      assert(birth < end, s"segment [$birth, $end) empty")
      assert(n >= 10, s"selected segment below minPts: $n")
      assert(stab > 0L, s"selected segment with zero stability")
    }
  }
}
