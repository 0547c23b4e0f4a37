package graft

import org.apache.spark.sql.functions._

/** Water-filling invariants of the UniMax budget allocator that the
  * row-hash oracle can't state as properties. */
class SamplingAllocSpec extends SparkSpec {

  test("unimax allocation exhausts the budget exactly, caps only the head") {
    val out = llm.Sampling.unimaxAlloc.fn(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val total = out.map(_._2).sum
    val budget = 3L * total / 4L
    // Σ alloc ≡ B exactly — the remainder distribution leaves nothing
    assert(out.map(_._3).sum == budget,
      s"allocations ${out.map(_._3).sum} != budget $budget")
    // never allocate more than a language has
    for ((lang, c, a) <- out)
      assert(a <= c, s"$lang allocated $a of $c")
    // water-filling shape: every language is either taken whole or
    // capped at a common level (±1 for the remainder)
    val capped = out.filter { case (_, c, a) => a < c }
    assert(capped.nonEmpty, "budget < total must cap at least one language")
    val levels = capped.map(_._3).distinct.sorted
    assert(levels.length <= 2 && levels.last - levels.head <= 1,
      s"capped languages not at a common level: ${capped.mkString(", ")}")
    // affordability at k* implies c₍ₖ＊₎ ≤ t: a language taken whole is
    // never larger than the cap level itself
    val whole = out.filter { case (_, c, a) => a == c }
    if (whole.nonEmpty)
      assert(whole.map(_._2).max <= capped.map(_._3).min,
        s"a whole language exceeds the cap level: whole=${whole.toSeq} capped=${capped.toSeq}")
  }

  test("weighted reservoir == driver-side A-ES reference; sample biases toward heavy docs") {
    // exact replay: the md5-48-bit uniform and the exponential-race
    // key recomputed on the driver must select the same top-5
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Long): Double = {
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val pri = java.lang.Long.parseLong(hex, 16)
      math.log((pri + 1.0) / 281474976710656.0) / math.max(w, 1L).toDouble
    }
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      rows.map(r => (src, r._2, key(r._2, r._3)))
        .sortBy(t => (-t._3, t._2)).take(5).zipWithIndex
        .map { case ((s2, id, _), i) => (s2, i.toLong, id) }
    }.toSet
    val got = graft.SparkEntry.queries("q_weighted_reservoir")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected, s"A-ES selection mismatch: ${got.diff(expected)}")
    // weight-proportional inclusion: the sampled docs are heavier on
    // average than the corpus (deterministic on the fixed corpus)
    val corpusMean = docs.map(_._3).sum.toDouble / docs.length
    val sampledIds = got.map(_._3)
    val sampledMean = docs.filter(d => sampledIds(d._2)).map(_._3).sum.toDouble /
      sampledIds.size
    assert(sampledMean > corpusMean,
      f"sampled mean weight $sampledMean%.0f must exceed corpus mean $corpusMean%.0f")
  }

  test("k-center coreset: greedy picks the farthest point each round, radius non-increasing") {
    import spark.implicits._
    // 1-D geometry (63 zero dims): points at 0, 0.001, 0.010, 0.011 —
    // greedy from id 0 must pick 11-milli (farthest), then 10-milli's
    // neighborhood collapses: min-dist of 1-milli and 10-milli is
    // (1 milli)² each, tie broken by lowest id
    def v(x: Double) = Array.fill(63)(0.0f) :+ x.toFloat
    val vecs = Seq(
      (0L, v(0.0)), (1L, v(0.001)), (10L, v(0.010)), (11L, v(0.011))
    ).toDF("vec_id", "embedding")
    val out = llm.Sampling.kcenterOf(vecs, 3)
      .as[(Long, Long, Long)].collect()
    val m = 1000L // 0.001 in micro units
    assert(out(0) == ((1L, 0L, (11 * m) * (11 * m))),
      s"round 1: center 0, radius to the far end; got ${out(0)}")
    assert(out(1) == ((2L, 11L, m * m)),
      s"round 2: farthest point becomes center, ties collapse to 1-milli²; got ${out(1)}")
    // round 3: remaining candidates 1 and 10 tie at 1-milli² — lowest
    // id (1) is picked as center; radius stays 1-milli² (point 10)
    assert(out(2) == ((3L, 1L, m * m)), s"round 3: got ${out(2)}")
    // corpus run: radii never increase and all centers are distinct
    val corpus = llm.Sampling.kcenterOf(
      Tables.load(spark, sf001, "embeddings"), 8)
      .as[(Long, Long, Long)].collect()
    val radii = corpus.map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"radius increased: ${radii.toSeq}")
    assert(corpus.map(_._2).distinct.length == corpus.length)
  }

  test("mergeable reservoir: any partitioning of the build equals the global sample") {
    import spark.implicits._
    // deterministic micro keys: the sampler's total order is integral,
    // so build-then-merge must be EXACT at every partition count
    val rows = (0L until 400L).map(i => (s"src${i % 4}", i, (i * 7919) % 100003))
    val df = rows.toDF("source", "doc_id", "key_micro")
    def sample(parts: Int) = df.repartition(parts)
      .groupBy("source")
      .agg(graft.functions.TopKAgg(col("key_micro"), col("doc_id"), 5).as("res"))
      .select(col("source"), posexplode(col("res")))
      .select(col("source"), col("pos"), col("col.id"), col("col.sort_key"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val want = sample(1)
    for (parts <- Seq(3, 17)) assert(sample(parts) == want, s"parts=$parts")
    // and it equals the window formulation on the same keys
    import org.apache.spark.sql.expressions.Window
    val win = df.withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("key_micro").desc, col("doc_id").asc)))
      .filter(col("rn") <= 5)
      .select(col("source"), (col("rn") - 1).cast("int").as("pos"),
        col("doc_id"), col("key_micro"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(want == win, "aggregate formulation diverged from the window")
  }

  test("greedy max-coverage: trace matches a brute-force greedy reference, stops when docs run out") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq("a", "b", "c")), (2L, Seq("a", "b")),
      (3L, Seq("c", "d")), (4L, Seq("e")))
    val dtok = docs.flatMap { case (d, ts) => ts.map(d -> _) }
      .toDF("doc_id", "tok")
    val got = llm.Sampling.greedyCoverage(dtok, 6)
    // reference greedy with the same (gain desc, doc_id asc) order
    var covered = Set.empty[String]
    var remaining = docs
    val want = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
    var st = 1L
    while (remaining.nonEmpty) {
      val (d, ts) = remaining.minBy { case (d, ts) =>
        (-(ts.toSet -- covered).size, d) }
      val gain = (ts.toSet -- covered).size.toLong
      covered ++= ts
      want += ((st, d, gain, covered.size.toLong))
      remaining = remaining.filterNot(_._1 == d)
      st += 1
    }
    assert(got == want.toSeq, s"got $got want $want")
    // exactly 4 picks: the pool empties before k
    assert(got.length == 4)
    // submodularity sanity: gains never increase along the greedy trace
    assert(got.map(_._3).sliding(2).forall(p => p.head >= p.last))
  }

  test("declared coverage query: cumulative totals equal the gain prefix sums") {
    val rows = llm.Sampling.coverageSelect.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == llm.Sampling.CoverK)
    val prefix = rows.map(_._3).scanLeft(0L)(_ + _).tail
    assert(rows.map(_._4).toSeq == prefix.toSeq,
      s"covered_total must be the prefix sum of gains: $rows")
    assert(rows.map(_._2).distinct.length == rows.length, "picks are distinct")
  }

  test("capture-recapture: Chapman bounds and self-reported error hold") {
    val r = graft.llm.Sampling.captureRecapture.fn(spark, sf001).head()
    val (nTrue, n1, n2, m, nHat, err) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(m <= math.min(n1, n2), "overlap cannot exceed either crawl")
    assert(nHat >= n1 + n2 - m, "estimate cannot undercut the observed union")
    assert(nHat == (n1 + 1) * (n2 + 1) / (m + 1) - 1, "Chapman closed form")
    val wantErr = if (nHat >= nTrue) 1000 * (nHat - nTrue) / nTrue
      else -(1000 * (nTrue - nHat) / nTrue)
    assert(err == wantErr, s"self-reported error: $err vs $wantErr")
    assert(math.abs(err) <= 500, s"coin-split crawls should land near truth: $err")
  }
}
