package graft

import org.apache.spark.sql.functions._

/** DP noisy counts + k-anonymity audit invariants beyond the oracle
  * hash. */
class PrivacySpec extends SparkSpec {

  test("dp counts: noise is bounded, nonzero somewhere, and deterministic") {
    val run1 = SparkEntry.queries("q_dp_counts")(spark, sf001)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val run2 = SparkEntry.queries("q_dp_counts")(spark, sf001)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(run1.toSeq == run2.toSeq, "noise draw must be deterministic")
    // |Laplace⁻¹(u)| ≤ ln(2·65536) at the 16-bit draw's extremes
    val bound = (math.log(2 * 65536.0) * 1e6).toLong + 1
    run1.foreach { case (_, _, t, noisy) =>
      val noise = noisy - t * 1000000L
      assert(math.abs(noise) <= bound, s"noise $noise exceeds inverse-CDF bound")
    }
    assert(run1.count { case (_, _, t, noisy) => noisy != t * 1000000L } > run1.length / 2,
      "most cells should carry nonzero noise")
  }

  test("k-anonymity: suppression flag is exactly class_n < 10, classes tile the table") {
    val out = SparkEntry.queries("q_k_anonymity")(spark, sf001).collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    assert(out.forall { case (n, s) => (n < 10) == (s == 1L) })
    val total = out.map(_._1).sum
    assert(total == Tables.load(spark, sf001, "customer").count())
  }

  test("dp median: overwhelming mass forces the true median; output always a data value") {
    import spark.implicits._
    // 1000 copies of 50 plus sparse outliers: every non-50 candidate's
    // utility is ≤ −1000, its micro-weight rounds to 0, so the
    // mechanism must select 50 no matter what the coin says
    val peaked = (Seq.fill(1000)(("a", 50L)) ++
      Seq(("a", 1L), ("a", 2L), ("a", 99L))).toDF("event_type", "c")
    val got = llm.Privacy.dpMedianOf(peaked).collect()
    assert(got.length == 1 && got.head.getLong(1) == 50L)
    // corpus run: the selected value is an observed value of its group
    // and the mechanism stays within the concentration envelope —
    // EM theory gives rank error O(ln(candidates)/ε) ≈ 100 rank units
    // at ε = 0.1 with ~190 distinct candidates, so the bound below is
    // the loose-but-meaningful deterministic envelope for this corpus
    val ev = Tables.load(spark, sf001, "events")
      .select(col("event_type"), round(col("value") * 100, 0).cast("long").as("c"))
    val out = llm.Privacy.dpMedianOf(ev).collect()
    for (r <- out) {
      val typ = r.getString(0); val pick = r.getLong(1); val n = r.getLong(2)
      val below = ev.filter(col("event_type") === typ && col("c") < pick).count()
      assert(ev.filter(col("event_type") === typ && col("c") === pick).count() > 0,
        s"$typ: pick must be an observed value")
      assert(math.abs(2 * below - n) <= math.max(40L, 2 * n / 5),
        s"$typ: pick rank $below of $n outside the concentration envelope")
    }
  }

  test("l-diversity: homogeneity attack caught by entropy where distinct-count passes") {
    import spark.implicits._
    // class A: 98x 'URGENT' + 1x 'HIGH' + 1x 'LOW' -> distinct_l = 3
    // (passes the naive gate) but entropy ~ 0.12 nats << ln 3 -> the
    // entropy gate must refuse it. class B: perfectly balanced
    // 3-value class -> entropy exactly ln 3 (up to micro rounding).
    val rows = (Seq.fill(98)(("A", 1L, "URGENT")) ++
      Seq(("A", 1L, "HIGH"), ("A", 1L, "LOW")) ++
      (1 to 30).flatMap(_ => Seq(("B", 2L, "X"), ("B", 2L, "Y"), ("B", 2L, "Z"))))
      .toDF("segment", "nation", "sv")
    val got = llm.Privacy.lDiversityOf(rows).collect()
      .map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    val (la, ea, ra) = got("A")
    assert(la == 3L && !ra, s"homogeneous class must be refused: $la $ea $ra")
    assert(ea < 1098612L, s"class A entropy $ea must sit far below ln 3")
    val (lb, eb, rb) = got("B")
    assert(lb == 3L && rb, s"balanced class must release: $lb $eb $rb")
    // balanced 3-way entropy == ln 3 up to the integer-div bias
    assert(math.abs(eb - 1098612L) <= 2L, s"class B entropy $eb")
  }

  test("t-closeness: a global-mirroring class releases, a top-concentrated class is refused") {
    import spark.implicits._
    // global buckets 0/1/2 uniform: A gives 8 to each, B gives 12 to
    // bucket 2, C gives 12 to buckets 0 and 1 -> global 20/20/20.
    // class A mirrors the global mix exactly -> EMD 0, released;
    // class B sits entirely in bucket 2 -> EMD = (1/3 + 2/3)/2 = 1/2
    // > t = 0.2, refused
    val rows = (
      (1 to 8).flatMap(_ => Seq(0L, 1L, 2L)).map(b => ("A", 0L, b)) ++
      (1 to 12).map(_ => ("B", 0L, 2L)) ++
      (1 to 12).flatMap(_ => Seq(0L, 1L)).map(b => ("C", 0L, b))
    ).toDF("segment", "nation", "balb")
    val got = llm.Privacy.tClosenessOf(rows).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    val (na, emdA, relA) = got("A")
    // A: 24 rows, cums 8/16/24 vs global 20/40/60 over N=60: exact match
    assert(na == 24L && emdA == 0L && relA, s"A: $na $emdA $relA")
    val (nb, emdB, relB) = got("B")
    // B: 12 rows, cum_c 0,0,12 vs global cum 20,40,60:
    // |0*60-20*12| + |0*60-40*12| + |12*60-60*12| = 240+480+0 = 720
    assert(nb == 12L && emdB == 720L, s"B: $nb $emdB")
    // 5*720 = 3600 > 60*12*2 = 1440 -> refused
    assert(!relB, "top-concentrated class must be refused")
  }

  test("mondrian: uniform grid splits to near-k leaves; degenerate QI never splits") {
    import spark.implicits._
    // 10x10 QI grid, 5 records per cell = 500 records, k = 25
    val grid = (for (a <- 0L until 10L; b <- 0L until 10L; r <- 0 until 5)
      yield (a * 1000 + b * 10 + r, a, b)).toDF("id", "d1", "d2")
    val leaves = llm.Privacy.mondrianOf(grid, k = 25, depth = 6).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    assert(leaves.map(_._1).sum == 500L, "records conserved")
    assert(leaves.forall(_._1 >= 25L), s"k violated: ${leaves.mkString(", ")}")
    assert(leaves.length >= 8, s"uniform grid should split well: ${leaves.length}")
    // axis cuts keep sibling boxes disjoint: no two leaves overlap in
    // BOTH dimensions
    for (i <- leaves.indices; j <- leaves.indices if i < j) {
      val (a, b) = (leaves(i), leaves(j))
      val d1Overlap = a._2 <= b._3 && b._2 <= a._3
      val d2Overlap = a._4 <= b._5 && b._4 <= a._5
      assert(!(d1Overlap && d2Overlap), s"leaves overlap: $a / $b")
    }
    // all-identical QI: nothing to split, one leaf carries everything
    val flat = (0L until 100L).map(i => (i, 3L, 7L)).toDF("id", "d1", "d2")
    val one = llm.Privacy.mondrianOf(flat, k = 25, depth = 6).collect()
    assert(one.length == 1 && one.head.getLong(1) == 100L)
  }

  test("mondrian utility recomputes from the leaves; one-leaf release maxes both metrics") {
    import org.apache.spark.sql.functions._
    val rows = Tables.load(spark, sf001, "customer").select(
      col("c_custkey").as("id"),
      col("c_nationkey").cast("long").as("d1"),
      expr("cast(round(c_acctbal * 100) as bigint) div 100000").as("d2"))
    val leaves = llm.Privacy.mondrianOf(rows).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    val (lo1, hi1, lo2, hi2) = {
      val g = rows.agg(min("d1"), max("d1"), min("d2"), max("d2")).head()
      (g.getLong(0), g.getLong(1), g.getLong(2), g.getLong(3))
    }
    val (w1t, w2t) = (hi1 - lo1, hi2 - lo2)
    val got = llm.Privacy.mondrianUtility.fn(spark, sf001).collect().head
    assert(got.getLong(0) == leaves.length.toLong)
    assert(got.getLong(1) == leaves.map(l => l._1 * l._1).sum, "discernibility")
    val ncpNum = leaves.map(l =>
      l._1 * ((l._3 - l._2) * w2t + (l._5 - l._4) * w1t)).sum
    assert(got.getLong(2) == ncpNum && got.getLong(3) == 2 * w1t * w2t)
    // the no-split release (k = corpus size) pays full NCP per record
    val n = rows.count()
    val worst = llm.Privacy.mondrianOf(rows, k = n.toInt, depth = 6)
      .collect()
    assert(worst.length == 1 && worst.head.getLong(1) == n)
  }
}
