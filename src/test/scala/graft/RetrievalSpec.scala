package graft

import graft.llm.Retrieval

/** BM25 semantics on a hand-computed fixture plus invariants on the
  * real documents table. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // Hand-checkable corpus: 3 docs, query workload fixed in Retrieval.
  // doc 10 contains 'hash' and 'join'; doc 11 contains 'join' twice;
  // doc 12 matches nothing.
  private val fixture = Seq(
    (10L, "hash join"),
    (11L, "join join probe"),
    (12L, "nothing relevant here")
  ).toDF("doc_id", "text")

  private def bm25(tf: Long, df: Long, n: Long, dl: Long, avgdl: Double): Double = {
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    idf * tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
  }

  test("BM25 scores match a hand-computed oracle on the fixture") {
    val got = Retrieval.bm25TopK(spark, fixture, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // query 0 = "hash join table": only docs 10, 11 match any term
    val q0 = got.filter(_._1 == 0)
    assert(q0.map(_._3).toSet == Set(10L, 11L))

    // expected micro scores (n=3 docs, avgdl=(2+3+3)/3)
    val avgdl = 8.0 / 3.0
    val d10 = math.round((bm25(1, 1, 3, 2, avgdl) + bm25(1, 2, 3, 2, avgdl)) * 1e6)
    // rounding happens per-term then sums, mirror that
    val d10terms = math.round(bm25(1, 1, 3, 2, avgdl) * 1e6) + math.round(bm25(1, 2, 3, 2, avgdl) * 1e6)
    val d11terms = math.round(bm25(2, 2, 3, 3, avgdl) * 1e6)
    val scores = q0.map(r => r._3 -> r._4).toMap
    assert(scores(10L) == d10terms, s"doc10: got ${scores(10L)} want $d10terms (unrounded-sum variant was $d10)")
    assert(scores(11L) == d11terms)
    // doc 10 hits the rare term 'hash' (df=1) so it must outrank doc 11
    assert(q0.sortBy(_._2).head._3 == 10L)
  }

  test("rank is dense 1..k per query, ordered by score desc then doc_id") {
    val docs = Tables.load(spark, sf001, "documents")
    val rows = Retrieval.bm25TopK(spark, docs, k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byQuery = rows.groupBy(_._1)
    assert(byQuery.keySet == Set(0, 1, 2))
    byQuery.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      // score non-increasing with rank; ties broken by ascending doc_id
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3))
        case _ =>
      }
    }
  }

  test("docs with no query term never appear") {
    val got = Retrieval.bm25TopK(spark, fixture, k = 10).collect()
    assert(!got.exists(_.getLong(2) == 12L))
  }

  test("hybrid RRF: fused score is the exact integer sum of per-side contributions") {
    val docs = Tables.load(spark, sf001, "documents")
    val lex = Retrieval.lexRanked(spark, docs, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val den = Retrieval.denseRanked(spark, sf001, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def c(rank: Option[Long]) = rank.map(r => math.round(1e6 / (60 + r))).getOrElse(0L)
    val fused = Retrieval.hybridTopK(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(fused.nonEmpty)
    fused.foreach { case (q, _, d, rrf) =>
      val want = c(lex.get(q -> d)) + c(den.get(q -> d))
      assert(rrf == want, s"query $q doc $d: rrf $rrf != $want")
      // every fused candidate came from at least one side
      assert(lex.contains(q -> d) || den.contains(q -> d))
    }
    // a doc ranked by BOTH sides must outrank one ranked by only the
    // weaker tail of a single side (RRF's defining property)
    val bothBest = fused.filter { case (q, _, d, _) => lex.contains(q -> d) && den.contains(q -> d) }
    assert(bothBest.nonEmpty, "fixture corpus should have lexical∩dense overlap")
  }

  test("hard negatives are lexical candidates absent from dense top-5") {
    val docs = Tables.load(spark, sf001, "documents")
    val lex20 = Retrieval.lexRanked(spark, docs, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val den5 = Retrieval.denseRanked(spark, sf001, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val neg = Retrieval.hardNegatives(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(neg.nonEmpty)
    neg.foreach { case (q, d) =>
      assert(lex20.contains(q -> d), s"negative ($q,$d) not a lexical candidate")
      assert(!den5.contains(q -> d), s"negative ($q,$d) is in dense top-5")
    }
    // exactly the set difference, not a subset
    assert(neg.toSet == (lex20 -- den5))
  }

  test("hashed tf-idf: fixed feature width, dominant feature consistent, mass additive") {
    val out = Retrieval.hashedTfidf.fn(spark, sf001).collect()
    val nDocs = Tables.load(spark, sf001, "documents").count()
    assert(out.length.toLong == nDocs, "every document featurized")
    out.foreach { r =>
      assert(r.getAs[Long]("nnz") >= 1 && r.getAs[Long]("nnz") <= 32,
        "feature width is the fixed 32-bucket space")
      val b = r.getAs[Long]("top_bucket")
      assert(b >= 0 && b < 32)
      assert(r.getAs[Long]("top_micro") <= r.getAs[Long]("total_micro"))
      // dominant feature times nnz bounds the total from above
      assert(r.getAs[Long]("total_micro") <=
        r.getAs[Long]("top_micro") * r.getAs[Long]("nnz"))
    }
  }

  test("NDCG@10 equals an independent Scala recomputation from the component rankings") {
    val out = Retrieval.ndcgEval.fn(spark, sf001).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("dcg_micro"),
        r.getAs[Long]("idcg_micro"), r.getAs[Long]("ndcg_ppm")))
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L), "one row per query doc")

    val docs = Tables.load(spark, sf001, "documents")
    val rel = Retrieval.denseRanked(spark, sf001, 20).collect()
      .map { r =>
        val dr = r.getAs[Long]("dense_rank")
        (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
          (if (dr <= 3) 3L else if (dr <= 10) 2L else 1L)
      }.toMap
    val lex10 = Retrieval.lexRanked(spark, docs, 20).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("lex_rank")))
      .filter(_._3 <= 10)
    def disc(rank: Long) = math.round(1e6 / math.log(rank + 1.0))
    def gain(g: Long) = (1L << g) - 1

    val wantDcg = lex10.groupBy(_._1).view.mapValues(_.map { case (q, d, rk) =>
      gain(rel.getOrElse((q, d), 0L)) * disc(rk)
    }.sum).toMap
    val wantIdcg = rel.toSeq.groupBy(_._1._1).view.mapValues {
      _.map { case ((_, d), g) => (g, d) }
        .sortBy { case (g, d) => (-g, d) }.take(10).zipWithIndex
        .map { case ((g, _), i) => gain(g) * disc(i + 1L) }.sum
    }.toMap

    out.foreach { case (q, dcg, idcg, ppm) =>
      assert(dcg == wantDcg(q), s"dcg query $q")
      assert(idcg == wantIdcg(q), s"idcg query $q")
      assert(ppm == dcg * 1000000L / idcg, "exact integer ppm")
      // dcg (and so ppm) CAN be 0 — a lexical top-10 disjoint from the
      // dense top-20 is exactly what the metric is built to expose
      assert(dcg <= idcg && ppm >= 0L && ppm <= 1000000L, "ndcg bounds")
    }
    // 20 graded docs exist per query, so the ideal top-10 prefix is the
    // same gain profile (3×7, 7×3) for every query — idcg is constant
    assert(out.map(_._3).distinct.length == 1)
  }

  test("phrase search: adjacency, order, and overlap semantics") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "a a a b"),   // 'a a' twice (overlapping), 'a b' once
      (2L, "b a c a"),   // 'a b' ZERO times (order matters), 'a c' once
      (3L, "a b a b a")  // 'a b' twice, 'a b a' twice (overlapping)
    ).toDF("doc_id", "text")
    val post = docs.select(col("doc_id"),
      posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tok")))
    def stats(ph: String): (Long, Long) = {
      val r = Retrieval.phraseStats(post, ph).head()
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_occurrences"))
    }
    assert(stats("a a") == ((1L, 2L)), "overlapping bigram must count twice")
    assert(stats("a b") == ((2L, 3L)))
    assert(stats("a b a") == ((1L, 2L)), "overlapping trigram")
    assert(stats("b a") == ((2L, 3L))) // doc2 once, doc3 twice
    assert(stats("c b") == ((0L, 0L)), "absent phrase yields a zero row")
  }

  test("q_mmr_rerank: distinct picks, pure-relevance first step, monotone scores") {
    val rows = Retrieval.mmrRerank.fn(spark, sf001).collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rel_micro"), r.getAs[Long]("maxsim_micro"),
        r.getAs[Long]("score2_micro")))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(rows.map(_._2).distinct.length == 5, "picks must be distinct")
    // step 1 is pure relevance: no selected set yet
    assert(rows(0)._4 == 0L && rows(0)._5 == rows(0)._3)
    // greedy MMR objective is non-increasing FROM STEP 2: per-candidate
    // maxsim only grows once the selected set is nonempty, and each
    // step maximizes over a shrinking remainder. (Step 1→2 is exempt:
    // the empty-set maxsim is pinned to 0 while real cosines can be
    // negative, so step 2 may legitimately score above step 1.)
    val scores = rows.map(_._5).drop(1)
    assert(scores.zip(scores.tail).forall { case (a, b) => b <= a },
      s"MMR scores not non-increasing after step 2: ${scores.toSeq}")
    // every reported score is the stated integer identity
    rows.foreach { case (_, _, rel, maxsim, sc) =>
      assert(sc == rel - maxsim)
      assert(math.abs(maxsim) <= 1000000L && math.abs(rel) <= 1000000L)
    }
  }

  test("late interaction: rank order matches score order, scores decompose over query buckets") {
    val rows = llm.Retrieval.lateInteraction.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_._2)
      assert(byRank.map(_._2).toSeq == (1L to rs.length).toSeq, s"q$q ranks")
      // scores non-increasing in li_rank; ties broken by lex_rank asc
      byRank.sliding(2).foreach { case Array(a, b) =>
        assert(a._5 > b._5 || (a._5 == b._5 && a._4 < b._4),
          s"q$q order violated: $a then $b")
        case _ =>
      }
      assert(byRank.head._5 > 0, s"q$q top li_score must be positive")
      assert(rs.length <= 20, s"q$q shortlist bound")
    }
  }

  test("RBO: identity scores Σw_d (=1 up to nano rounding), disjoint scores 0, reference agrees") {
    import spark.implicits._
    import graft.llm.Retrieval
    def frame(rankCol: String, lists: Map[Long, Seq[Long]]) =
      lists.toSeq.flatMap { case (q, docs) =>
        docs.zipWithIndex.map { case (d, i) => (q, d, (i + 1).toLong) }
      }.toDF("query_id", "doc_id", rankCol)
    val a = Map(0L -> (1L to 10L), 1L -> (1L to 10L), 2L -> (1L to 10L))
      .view.mapValues(_.toSeq).toMap
    val ident = Retrieval.rboOf(frame("lex_rank", a), frame("dense_rank", a))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val wSum = Retrieval.RboWeightsNano.map(_._2).sum // Σ (x_d=d) w_d·d/d
    ident.foreach { case (q, ov, rbo) =>
      assert(ov == 10L && rbo == wSum, s"q$q: $ov $rbo != $wSum")
    }
    // truncated RBO@10 of the full agreement sits just under 1 (p=0.9
    // tail mass unassigned): 1e9·(1-p)Σp^(d-1) = 651321... nano
    assert(wSum > 600000000L && wSum < 700000000L, wSum.toString)
    val b = Map(0L -> (11L to 20L), 1L -> (11L to 20L), 2L -> (11L to 20L))
      .view.mapValues(_.toSeq).toMap
    val disj = Retrieval.rboOf(frame("lex_rank", a), frame("dense_rank", b))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    disj.foreach { case (ov, rbo) => assert(ov == 0L && rbo == 0L) }
    // reference fold on a shuffled pair
    val la = Seq(3L, 1L, 4L, 5L, 9L, 2L, 6L, 8L, 7L, 10L)
    val lb = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L)
    val got = Retrieval.rboOf(frame("lex_rank", Map(0L -> la)),
      frame("dense_rank", Map(0L -> lb))).collect().head.getLong(2)
    val want = (1 to 10).map { d =>
      val x = la.take(d).toSet.intersect(lb.take(d).toSet).size.toLong
      x * Retrieval.RboWeightsNano(d - 1)._2 / d
    }.sum
    assert(got == want, s"$got != $want")
  }

  test("condorcet fusion: winner flag is unique, tops its query, and dominates RRF top-1 or ties") {
    val rows = graft.llm.Retrieval.condorcetFusion.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      // copeland non-increasing down the emitted ranking
      val cps = sorted.map(_._4)
      assert(cps.zip(cps.tail).forall { case (a, b) => a >= b }, s"query $q order")
      val winners = rs.filter(_._6)
      assert(winners.length <= 1, s"query $q: two condorcet winners is a contradiction")
      winners.foreach(w => assert(w._2 == 1L,
        s"query $q: a condorcet winner must top the aggregate ranking"))
    }
  }
}
