package graft

import org.apache.spark.sql.functions._
import graft.llm.UnigramLm

/** Viterbi optimality and EM-step bookkeeping of the unigram-LM
  * tokenizer, against exhaustive enumeration. */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  /** All segmentations of w into pieces of length <= 4 that exist in
    * the cost map; returns min total cost (the tie-free ground truth
    * the DP must achieve). */
  private def bruteMinCost(w: String, costs: Map[String, Long]): Long = {
    if (w.isEmpty) 0L
    else (1 to math.min(UnigramLm.MaxPiece, w.length)).flatMap { j =>
      costs.get(w.take(j)).flatMap { c =>
        val rest = bruteMinCost(w.drop(j), costs)
        if (rest == Long.MaxValue) None else Some(c + rest)
      }
    }.foldLeft(Long.MaxValue)(math.min)
  }

  test("viterbi paths reconstruct each word and achieve the brute-force optimum") {
    val words = Seq(("scan", 9L), ("scans", 4L), ("table", 7L),
      ("stable", 2L), ("a", 5L), ("tablescan", 3L)).toDF("w", "cnt")
    val costs = UnigramLm.pieceCosts(words)
    val costMap = costs.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val paths = UnigramLm.viterbiPaths(words, costs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val byWord = paths.groupBy(_._1)
    Seq("scan", "scans", "table", "stable", "a", "tablescan").foreach { w =>
      val ps = byWord(w).map(_._3)
      // backtracking emits pieces right-to-left; total length must
      // tile the word exactly and every piece must be a substring
      assert(ps.map(_.length).sum == w.length, s"$w pieces $ps")
      assert(ps.forall(w.contains(_)), s"$w pieces $ps")
      val got = ps.map(costMap).sum
      assert(got == bruteMinCost(w, costMap),
        s"$w: viterbi $got != brute ${bruteMinCost(w, costMap)}")
    }
  }

  test("single-word corpus: 'aaaa' segments as one piece; EM gives it all the mass") {
    // counts: a=4, aa=3, aaa=2, aaaa=1, total 10; cost(aaaa) =
    // round(ln(10/1)*1e6) = 2302585 beats every split (cheapest is
    // aa+aa = 2*round(ln(10/3)*1e6) = 2407946)
    val words = Seq(("aaaa", 1L)).toDF("w", "cnt")
    val out = UnigramLm.emStep(words, UnigramLm.pieceCosts(words)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("aaaa", 1L, 1L, 1000000L)), out.toSeq.toString)
  }

  test("declared query: probabilities sum to ~1e6, viterbi mass equals corpus tokens") {
    val words = UnigramLm.wordCounts(
      Tables.load(spark, sf001, "documents"))
    val totalWordLen = words
      .agg(sum(col("cnt") * length(col("w")))).head().getLong(0)
    val rows = UnigramLm.unigramEm.fn(spark, sf001).collect()
    assert(rows.nonEmpty)
    val probSum = rows.map(_.getLong(3)).sum
    assert(probSum <= 1000000L && probSum > 1000000L - rows.length,
      s"prob mass $probSum")
    // every path piece covers its word exactly once, so summed
    // vit_count * piece-length = summed word length * word count
    val covered = rows.map(r => r.getLong(2) * r.getString(0).length).sum
    assert(covered == totalWordLen, s"$covered vs $totalWordLen")
  }

  test("round 2: pruning respects the floor, keeps chars, and still tiles the corpus") {
    val words = UnigramLm.wordCounts(
      Tables.load(spark, sf001, "documents"))
    val totalWordLen = words
      .agg(sum(col("cnt") * length(col("w")))).head().getLong(0)
    val rows = UnigramLm.unigramEm2.fn(spark, sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // every surviving multi-char piece earned its keep in round 1
    rows.foreach { case (p, vit1, _, _) =>
      assert(p.length == 1 || vit1 >= UnigramLm.MinCount, s"$p vit1=$vit1")
    }
    // the round-2 segmentation still tiles every word exactly
    val covered = rows.map(r => r._3 * r._1.length).sum
    assert(covered == totalWordLen, s"$covered vs $totalWordLen")
    val probSum = rows.map(_._4).sum
    assert(probSum <= 1000000L && probSum > 1000000L - rows.length)
  }

  test("round 2 re-segments under the new costs: a round-1 underdog can win") {
    // corpus: "ab" x 6 and "abab" x 1. Round 1: 'abab' (count 1,
    // expensive) loses to cheaper splits; after re-costing from
    // viterbi counts, 'ab' (heavily used in round 1) becomes very
    // cheap, so 'abab' must segment as ab+ab in round 2.
    val words = Seq(("ab", 6L), ("abab", 1L)).toDF("w", "cnt")
    val costs1 = UnigramLm.pieceCosts(words)
    val vit1 = UnigramLm.viterbiPaths(words, costs1)
      .groupBy("piece").agg(sum(col("cnt")).as("vit_count"))
    val costs2 = UnigramLm.prunedCosts(costs1, vit1)
    val paths2 = UnigramLm.viterbiPaths(words, costs2).collect()
      .map(r => (r.getString(0), r.getString(2)))
    val ababPieces = paths2.filter(_._1 == "abab").map(_._2).sorted
    assert(ababPieces.toSeq == Seq("ab", "ab"),
      s"abab must re-segment as ab+ab: ${ababPieces.toSeq}")
  }

  test("EM3: corpus Viterbi cost is non-increasing across three ML-recost rounds") {
    val rows = UnigramLm.unigramEm3.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // the query's own abort allows rounding slack; the corpus case
    // should descend outright round over round
    assert(rows(1)._4 <= rows(0)._4,
      s"round2 cost ${rows(1)._4} > round1 ${rows(0)._4}")
    assert(rows(2)._4 <= rows(1)._4,
      s"round3 cost ${rows(2)._4} > round2 ${rows(1)._4}")
    // ML recost restricts the inventory to used pieces: n_pieces
    // cannot grow
    assert(rows(1)._2 <= rows(0)._2 && rows(2)._2 <= rows(1)._2,
      rows.map(_._2).toSeq.toString)
  }

  test("EM3 hand corpus: reuse collapses segmentation onto the shared piece") {
    // "ab" x 6 + "abab" x 1: round 1 segments abab without 'abab'
    // sharing (seed costs), round 2's ML recost makes 'ab' dominant;
    // by round 3 the whole corpus tiles with 'ab' pieces and the
    // trajectory must descend strictly from round 1 to round 2.
    val words = Seq(("ab", 6L), ("abab", 1L)).toDF("w", "cnt")
    val costs1 = UnigramLm.pieceCosts(words)
    def vitOf(c: org.apache.spark.sql.DataFrame) =
      UnigramLm.viterbiPaths(words, c)
        .groupBy("piece").agg(sum(col("cnt")).as("vit_count"))
    def totOf(vit: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame): Long =
      vit.join(c.select("piece", "cost"), Seq("piece"))
        .agg(sum(col("vit_count") * col("cost"))).head().getLong(0)
    val vit1 = vitOf(costs1)
    val costs2 = UnigramLm.mlCosts(vit1)
    val vit2 = vitOf(costs2)
    val costs3 = UnigramLm.mlCosts(vit2)
    val vit3 = vitOf(costs3)
    val (t1, t2, t3) = (totOf(vit1, costs1), totOf(vit2, costs2),
      totOf(vit3, costs3))
    assert(t2 < t1, s"expected strict descent, got $t1 -> $t2")
    assert(t3 <= t2 + (vit2.agg(sum(col("vit_count"))).head().getLong(0) * 2),
      s"$t2 -> $t3")
    val pieces3 = vit3.collect().map(r => r.getString(0)).toSet
    assert(pieces3 == Set("ab"), pieces3.toString)
  }
}
