package graft

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
}
