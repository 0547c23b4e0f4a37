package graft

import org.apache.spark.sql.functions.col

/** Fellegi–Sunter linkage invariants beyond the oracle hash: perfect
  * blocking recall, weight monotonicity in pattern dominance, and the
  * separation property that makes the weight a usable ranking. */
class LinkageSpec extends SparkSpec {

  private def rows(dir: String) =
    ops.Linkage.fellegiSunter.fn(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

  test("blocking recall is perfect: every true match lands in some pattern row") {
    val m = rows(sf001)
    val nCust = Tables.load(spark, sf001, "customer").count()
    assert(m.values.map(_._2).sum == nCust,
      s"sum of n_match must be $nCust (name-suffix blocks never split an id)")
  }

  test("weights are monotone in pattern dominance and separate match rates") {
    val m = rows(sf001)
    // flipping any single field 0 -> 1 must strictly increase the
    // weight (agreement weight > disagreement weight per field when
    // corruption < 50% and fields discriminate)
    for (((gn, gs, gb), (_, _, w)) <- m; f <- 0 until 3) {
      val up = f match {
        case 0 => (1L, gs, gb); case 1 => (gn, 1L, gb); case _ => (gn, gs, 1L)
      }
      if (up != ((gn, gs, gb)) && m.contains(up))
        assert(m(up)._3 > w, s"flip $f on ($gn,$gs,$gb): ${m(up)._3} <= $w")
    }
    // separation: full agreement is the highest-weight pattern and
    // carries a higher match rate than full disagreement
    val all1 = m((1L, 1L, 1L)); val all0 = m((0L, 0L, 0L))
    assert(all1._3 == m.values.map(_._3).max)
    assert(all1._2 * all0._1 > all0._2 * all1._1,
      s"match-rate separation failed: $all1 vs $all0")
    // agreement weights positive, disagreement total negative
    assert(all1._3 > 0L && all0._3 < 0L, s"${all1._3}, ${all0._3}")
  }

  test("the biggest share of true matches sits in the full-agreement pattern") {
    val m = rows(sf001)
    val byMatch = m.toSeq.sortBy(-_._2._2)
    assert(byMatch.head._1 == ((1L, 1L, 1L)),
      s"expected (1,1,1) to dominate: ${byMatch.take(3)}")
  }

  test("blocking quality: uncorrupted key has perfect recall, compound key trades recall for reduction") {
    val rows = ops.Linkage.blockingQuality.fn(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val (candS, nS, covS, rrS, pcS) = rows("suffix")
    val (candC, nC, covC, rrC, pcC) = rows("suffix_nation")
    // the name suffix is never corrupted: every match shares a block
    assert(covS == nS && pcS == 1000000L, s"suffix: $covS/$nS pc=$pcS")
    // the compound key drops exactly the nation-corrupted matches
    assert(covC < nC && pcC < 1000000L, s"compound: $covC/$nC pc=$pcC")
    // ~20% corruption rate: recall in the 60-95% band, never at the poles
    assert(pcC > 600000L, s"compound recall collapsed: $pcC")
    // tighter key => fewer candidates, higher reduction ratio
    assert(candC < candS && rrC > rrS, s"$candC !< $candS / $rrC !> $rrS")
    assert(rrS > 900000L, s"even 100 suffix blocks must cut 99%: $rrS")
  }

  test("winkler EM recovers the supervised weights' field ranking, unsupervised") {
    val sf01 = "/root/testdata/sf0.01" // all 8 patterns populated here
    // supervised per-field delta: weight(only f agrees) - weight(none)
    val sup = SparkEntry.queries("q_record_linkage")(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(5))
      .toMap
    val base = sup((0L, 0L, 0L))
    val supDelta = Map(
      "nation" -> (sup((1L, 0L, 0L)) - base).toDouble,
      "seg" -> (sup((0L, 1L, 0L)) - base).toDouble,
      "balb" -> (sup((0L, 0L, 1L)) - base).toDouble)
    val em = SparkEntry.queries("q_linkage_em")(spark, sf01)
      .filter(col("rnd") === 2L).collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3))).toMap
    def emDelta(f: String): Double = {
      val (m, u) = em(f)
      math.log(m.toDouble / u.toDouble) +
        math.log((1000000.0 - u.toDouble) / (1000000.0 - m.toDouble))
    }
    val supRank = supDelta.toSeq.sortBy(-_._2).map(_._1)
    val emRank = Seq("nation", "seg", "balb").sortBy(f => -emDelta(f))
    assert(supRank == emRank,
      s"supervised $supRank vs EM $emRank (sup=$supDelta)")
  }

  test("winkler EM separates m from u and moves p toward the blocked truth") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_linkage_em")(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    Seq("nation", "seg", "balb").foreach { f =>
      val (m2, u2, _) = rows((2L, f))
      assert(m2 > u2, s"$f: round-2 m $m2 must exceed u $u2")
    }
    // supervised truth: p = matches / blocked candidates
    val sup = SparkEntry.queries("q_record_linkage")(spark, sf01).collect()
    val nPairs = sup.map(_.getLong(3)).sum
    val nMatch = sup.map(_.getLong(4)).sum
    val pTrue = 1000000L * nMatch / nPairs
    val p2 = rows((2L, "nation"))._3
    // EM maximizes likelihood, not truth distance, so per-round
    // monotonicity toward pTrue is NOT guaranteed (and measurably
    // fails by ~30 ppm here); what matters is that two rounds land
    // decisively closer than the 0.1 init and inside a 2 pp band.
    assert(math.abs(p2 - pTrue) < math.abs(100000L - pTrue),
      s"p2=$p2 no closer to truth $pTrue than the init")
    assert(math.abs(p2 - pTrue) < 20000L,
      s"p2=$p2 outside the 2pp band around truth $pTrue")
  }
}
