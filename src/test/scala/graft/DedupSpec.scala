package graft

import graft.llm.Dedup

/** MinHash/SimHash behavior on planted fixtures + recall against an
  * exact brute-force Jaccard sweep of the sf0.001 corpus. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and then runs far away " +
    "to the green hills where tall trees grow beside the cold clear river bank"

  test("ShingleHashesOrdered: positional identity matches the gram-string form") {
    import org.apache.spark.sql.functions._
    // repeated grams ("a b c d e" twice) must collide by VALUE while
    // keeping distinct positions; every other position stays unique
    val text = "a b c d e x a b c d e y z w q"
    val rows = Seq(Tuple1(text)).toDF("text")
      .select(posexplode(graft.functions.ShingleHashesOrdered(col("text"), 5)))
      .collect().map(r => r.getInt(0) -> r.getLong(1))
    val toks = text.split(" ")
    assert(rows.length == toks.length - 4)
    assert(rows.map(_._1).toSeq == (0 until rows.length))
    val grams = (0 until rows.length).map(i => toks.slice(i, i + 5).mkString(" "))
    for (i <- rows.indices; j <- rows.indices)
      assert((rows(i)._2 == rows(j)._2) == (grams(i) == grams(j)),
        s"hash equality at ($i,$j) disagrees with gram equality")
    // < n tokens: no positional grams
    assert(Seq(Tuple1("a b c")).toDF("text")
      .select(graft.functions.ShingleHashesOrdered(col("text"), 5)).head()
      .getSeq[Long](0).isEmpty)
  }

  test("dup spans: planted exact copies report their full token span") {
    import org.apache.spark.sql.functions._
    val spans = Dedup.dupSpans.fn(spark, sf001)
      .filter(col("doc_b") >= 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val toks = Tables.load(spark, sf001, "documents")
      .filter(col("doc_id") < 10)
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    // an exact copy's longest shared run IS the whole document
    for ((id, n) <- toks if n >= 10)
      assert(spans.get(id).contains(n),
        s"doc $id: expected full span $n, got ${spans.get(id)}")
  }

  test("minhash finds a planted near-duplicate, skips unrelated text") {
    val docs = Seq(
      (1L, base),
      (2L, base.replace("cold clear", "warm murky")), // near-dup of 1
      (3L, "completely different content about spark catalyst optimizer rules and physical plans running on big clusters with many shuffle partitions everywhere")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash identical docs have jaccard 1.0") {
    val docs = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    val r = Dedup.minhashPairs(docs).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Double]("jaccard") == 1.0)
  }

  test("simhash: identical docs collide at hamming 0; unrelated text does not pair at <=3") {
    val docs = Seq(
      (1L, base),
      (2L, base),
      (3L, "numbers 123 456 789 unrelated thing entirely zebra xylophone quartz")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("SimhashFromVotes codegen loop == declarative 64-term when() OR-reduce") {
    import org.apache.spark.sql.functions._
    // random lane-packed vote counters + token counts; each lane is a
    // 16-bit count, n bounded so majorities land on both sides
    val rows = (1 to 200).map { i =>
      val rnd = new scala.util.Random(i)
      val packed = Seq.fill(16)((0 until 4).map(l =>
        (rnd.nextInt(1000).toLong & 0xFFFFL) << (l * 16)).reduce(_ | _))
      (i.toLong, packed, rnd.nextInt(2000).toLong + 1L)
    }.toDF("id", "packed", "n")
    val viaExpr = rows.select(col("id"),
      graft.functions.SimhashFromVotes(col("packed"), col("n")).as("sig"))
      .as[(Long, Long)].collect().toMap
    val viaTree = rows.select(col("id"),
      (0 until 64).map { b =>
        val cnt = shiftright(element_at(col("packed"), b / 4 + 1), (b % 4) * 16)
          .bitwiseAND(0xFFFFL)
        when(cnt * 2 > col("n"), shiftleft(lit(1L), b)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b)).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(viaExpr == viaTree)
  }

  test("MinHashAgg imperative aggregate == 64 declarative min(h1 ^ rotl(h2,i)) columns") {
    import org.apache.spark.sql.functions._
    def rotl(b: org.apache.spark.sql.Column, i: Int) =
      shiftleft(b, i).bitwiseOR(shiftrightunsigned(b, 64 - i))
    val docs = Tables.load(spark, sf001, "documents").select("doc_id", "text").limit(50)
    val exploded = docs
      .select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h1"), xxhash64(col("s"), lit(1)).as("h2"))
    val viaAgg = exploded.groupBy("doc_id")
      .agg(graft.functions.MinHashAgg(col("h1"), col("h2"), 64).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val minCols = (0 until 64).map(i => min(col("h1").bitwiseXOR(rotl(col("h2"), i))).as(s"g$i"))
    val viaCols = exploded.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 64).map(r.getLong).toSeq).toMap
    assert(viaAgg.keySet == viaCols.keySet)
    for ((id, sig) <- viaAgg) assert(sig == viaCols(id), s"doc $id signature mismatch")
  }

  test("ShingleHashes byte-pass == string shingles: set sizes and pairwise jaccard") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf001, "documents").select("doc_id", "text").limit(100)
    // set identity: same cardinality per doc as the string form
    // (collision-free hash => same distinct count)
    val sizes = docs.select(
      col("doc_id"),
      size(Dedup.shingles(col("text"))).as("s_str"),
      size(graft.functions.ShingleHashes(col("text"), 5)).as("s_hash"))
      .filter(col("s_str") =!= col("s_hash")).count()
    assert(sizes == 0L, "shingle-hash set cardinality diverged from string shingles")
    // jaccard between consecutive docs must agree exactly both ways
    val str = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val hsh = docs.select(col("doc_id"), graft.functions.ShingleHashes(col("text"), 5).as("sh"))
    def jac(df: org.apache.spark.sql.DataFrame) = {
      val a = df.select(col("doc_id").as("a"), col("sh").as("sa"))
      val b = df.select(col("doc_id").as("b"), col("sh").as("sb"))
      a.join(b, col("b") === col("a") + 1)
        .select(col("a"),
          (size(array_intersect(col("sa"), col("sb"))).cast("double") /
            (size(col("sa")) + size(col("sb")) -
              size(array_intersect(col("sa"), col("sb"))))).as("j"))
        .as[(Long, Double)].collect().toMap
    }
    assert(jac(str) == jac(hsh))
  }

  test("WordBigrams byte-pass == declarative transform over split tokens") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf001, "documents").select("doc_id", "text").limit(100)
      .unionByName(Seq((9000001L, "  one  "), (9000002L, "a b"), (9000003L, ""),
        (9000004L, " x\ty\nz ")).toDF("doc_id", "text"))
    val tok = split(trim(col("text")), "\\s+")
    val declarative = when(size(tok) >= 2,
      transform(sequence(lit(0), size(tok) - 2),
        i => concat(element_at(tok, i + 1), lit(" "), element_at(tok, i + 2))))
      .otherwise(array().cast("array<string>"))
    val rows = docs.select(col("doc_id"),
      graft.functions.WordBigrams(col("text")).as("fused"),
      declarative.as("decl"))
      .as[(Long, Seq[String], Seq[String])].collect()
    for ((id, fused, decl) <- rows)
      // the declarative form's degenerate docs ("" / one token) yield
      // [] via the otherwise-branch; for "" split gives [""] (1 token)
      // on both paths, so expectations align exactly
      assert(fused == decl, s"doc $id: $fused vs $decl")
  }

  test("connected components handles non-interval graphs (long-range edges)") {
    // edges deliberately NOT consecutive: {1-5, 5-9}, {2-3}; 4, 6 isolated
    val edges = Seq((1L, 5L), (5L, 9L), (2L, 3L)).toDF("src", "dst")
    val vertices = (1L to 9L).toDF("id")
    val labels = Dedup.connectedComponents(edges, vertices)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) == 1L && labels(5L) == 1L && labels(9L) == 1L)
    assert(labels(2L) == 2L && labels(3L) == 2L)
    assert(labels(4L) == 4L && labels(6L) == 6L)
  }

  test("connected components: tiny-graph local path == distributed path exactly") {
    // the size-gated union-find fast path must be byte-identical to
    // the propagate/jump loop; force the distributed path via the cap
    // conf and compare on a graph with chains, a cycle, isolates and
    // an out-of-vertex-set endpoint (induced-subgraph semantics)
    val edges = Seq((1L, 5L), (5L, 9L), (9L, 1L), (2L, 3L), (3L, 4L),
      (7L, 99L)).toDF("src", "dst") // 99 outside the vertex set
    val vertices = (1L to 8L).toDF("id")
    def run(): Map[Long, Long] =
      Dedup.connectedComponents(edges, vertices)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fast = run()
    spark.conf.set("spark.graft.cc.localCap", "0")
    val dist = try run() finally spark.conf.unset("spark.graft.cc.localCap")
    assert(fast == dist, s"$fast vs $dist")
    assert(fast(7L) == 7L, "edge to a non-vertex endpoint must not propagate")
  }

  test("property: connected components == union-find on random graphs") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val n = 12
    val edgeGen = Gen.chooseNum(0, 14).flatMap(m =>
      Gen.listOfN(m, Gen.zip(Gen.chooseNum(0L, n - 1L), Gen.chooseNum(0L, n - 1L))))
    val prop = forAll(edgeGen) { es =>
      val cleaned = es.filter { case (a, b) => a != b }
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      cleaned.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map(v => v.toLong -> find(v).toLong).toMap
      val edges =
        if (cleaned.isEmpty) Seq.empty[(Long, Long)].toDF("src", "dst")
        else cleaned.toDF("src", "dst")
      val got = Dedup.connectedComponents(edges, (0L until n.toLong).toDF("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(r.passed, r.status.toString)
  }

  test("minhash LSH recall >= 0.8 vs exact all-pairs jaccard on sf0.001") {
    val docs = Tables.load(spark, sf001, "documents").select("doc_id", "text")
    // exact ground truth: all-pairs 5-gram jaccard >= 0.5 (500 docs -> 125k pairs)
    import org.apache.spark.sql.functions._
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val truth = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jac", col("inter").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jac") >= 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val found = Dedup.minhashPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "corpus should contain planted near-dups")
    // verification step guarantees no false positives
    assert(found.subsetOf(truth))
    val recall = found.size.toDouble / truth.size
    assert(recall >= 0.8, s"recall $recall too low (${found.size}/${truth.size})")
  }

  test("cluster-aware split: no near-dup component straddles train/valid/test") {
    val rows = SparkEntry.queries("q_cluster_split")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.length > 0)
    val byComponent = rows.groupBy(_._2)
    byComponent.foreach { case (c, docs) =>
      assert(docs.map(_._3).distinct.length == 1,
        s"component $c split across ${docs.map(_._3).distinct.mkString(",")}")
    }
    // the property is only non-vacuous if multi-doc components exist
    assert(byComponent.exists(_._2.length >= 2), "corpus should contain near-dup clusters")
    // and all three splits are populated
    assert(rows.map(_._3).distinct.sorted.toSeq == Seq("test", "train", "valid"))
  }

  test("canonical selection keeps the longest member of every component") {
    val out = llm.Dedup.dedupCanonical.fn(spark, sf001).collect()
    val chars = Tables.load(spark, sf001, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.map(_.getAs[Long]("n_docs")).sum == chars.size.toLong,
      "every document belongs to exactly one component")
    out.foreach { r =>
      val canonical = r.getAs[Long]("canonical_id")
      assert(r.getAs[Long]("canonical_chars") == chars(canonical))
      // within multi-doc components the canonical is at least as long
      // as the component head (the min-id member)
      if (r.getAs[Long]("n_docs") > 1)
        assert(chars(canonical) >= chars(r.getAs[Long]("component")),
          s"component ${r.getAs[Long]("component")} kept a shorter member")
    }
  }

  test("incremental CC: delta+state ≡ full recompute at two-batch depth, new vertices included") {
    import org.apache.spark.sql.functions._
    def labelsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e0 = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("src", "dst")
    val v0 = (1L to 8L).toDF("id") // 7, 8 isolated
    val state0 = Dedup.connectedComponents(e0, v0)
    // batch 1: merge {1,2}+{3,4}; NEW vertex 9 joins {5,6}
    val d1 = Seq((2L, 3L), (6L, 9L)).toDF("src", "dst")
    val inc1 = Dedup.incrementalComponents(state0, d1)
    val full1 = Dedup.connectedComponents(e0.unionByName(d1), (1L to 9L).toDF("id"))
    assert(labelsOf(inc1) == labelsOf(full1),
      "batch-1 incremental labels must equal the full recompute")
    // batch 2 on batch 1's OUTPUT: chain-merge {1..4}+{5,6,9}; a
    // brand-new two-vertex component arrives whole
    val d2 = Seq((4L, 5L), (10L, 11L)).toDF("src", "dst")
    val inc2 = Dedup.incrementalComponents(inc1, d2)
    val full2 = Dedup.connectedComponents(
      e0.unionByName(d1).unionByName(d2), ((1L to 11L)).toDF("id"))
    assert(labelsOf(inc2) == labelsOf(full2),
      "batch-2 incremental (on incremental state) must equal the full recompute")
    // the giant merged component is labeled by its min vertex id
    assert(labelsOf(inc2).filter(_._2 == 1L).map(_._1) == Set(1L, 2L, 3L, 4L, 5L, 6L, 9L))
  }

  test("incremental CC: empty delta is the identity on state") {
    import org.apache.spark.sql.functions._
    val e0 = Seq((1L, 2L)).toDF("src", "dst")
    val state = Dedup.connectedComponents(e0, (1L to 3L).toDF("id"))
    val out = Dedup.incrementalComponents(state,
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      state.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("suffix dedup: adjacent-LCP pairs match a brute-force LCS reference") {
    import org.apache.spark.sql.functions._
    // unique shared spans per pair, so adjacency attribution is exact
    def toks(prefix: String, n: Int): Seq[String] = (0 until n).map(i => s"$prefix$i")
    val shared1 = toks("s", 18)  // A-B share 18 tokens
    val shared2 = toks("t", 40)  // D-E share 40 tokens -> capped at block 30
    val docs = Seq(
      (1L, (toks("a", 6) ++ shared1 ++ toks("b", 5)).mkString(" ")),  // A
      (2L, (toks("c", 3) ++ shared1 ++ toks("d", 9)).mkString(" ")),  // B
      (3L, toks("e", 40).mkString(" ")),                              // C: no overlap
      (4L, (toks("f", 2) ++ shared2).mkString(" ")),                  // D
      (5L, (shared2 ++ toks("g", 4)).mkString(" "))                   // E
    ).toDF("doc_id", "text")
    // driver-side reference: classic DP longest common token substring,
    // capped at the block bound
    def lcs(a: Seq[String], b: Seq[String]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      var best = 0
      for (i <- 1 to a.length; j <- 1 to b.length)
        if (a(i - 1) == b(j - 1)) {
          dp(i)(j) = dp(i - 1)(j - 1) + 1
          best = math.max(best, dp(i)(j))
        }
      best
    }
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1).split("\\s+").toSeq).toMap
    val expected = (for {
      a <- texts.keys; b <- texts.keys if a < b
      l = math.min(lcs(texts(a), texts(b)), 30) if l >= 15
    } yield (a, b) -> l.toLong).toMap
    val got = Dedup.suffixLcpPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected,
      s"suffix-sort pairs must match the DP reference: got $got expected $expected")
    assert(expected((4L, 5L)) == 30L, "block bound must cap the reported LCP")
    assert(expected((1L, 2L)) == 18L)
  }

  test("suffix dedup on random small-vocab corpora: sound pairwise, exact global max") {
    import org.apache.spark.sql.functions._
    // On arbitrary corpora pair ATTRIBUTION may chain through a third
    // doc sharing the same span, so the random property asserts what
    // holds universally: (1) soundness — every reported LCP is a real
    // common substring, never exceeding the pair's DP LCS; (2) global
    // completeness — the longest cross-doc span in the corpus is
    // reported at exactly min(DP max, block), because the suffix
    // block realizing it must contain a cross-doc adjacency.
    def lcs(a: Seq[String], b: Seq[String]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      var best = 0
      for (i <- 1 to a.length; j <- 1 to b.length)
        if (a(i - 1) == b(j - 1)) {
          dp(i)(j) = dp(i - 1)(j - 1) + 1
          best = math.max(best, dp(i)(j))
        }
      best
    }
    for (seed <- Seq(3, 17)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Seq("aa", "bb", "cc", "dd")
      // low-entropy docs + one planted 20-token excerpt copy so long
      // shared spans exist with certainty
      val texts = (0 until 8).map(i =>
        i.toLong -> (0 until 40).map(_ => vocab(rnd.nextInt(vocab.length)))).toMap
      val planted = 100L -> (Seq("zz") ++ texts(0L).slice(5, 25) ++ Seq("qq"))
      val all = texts + planted
      val docs = all.toSeq.map { case (id, ws) => (id, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Dedup.suffixLcpPairs(docs, minLcp = 8).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // (1) soundness for every reported pair
      got.foreach { case ((a, b), l) =>
        assert(l <= math.min(lcs(all(a), all(b)), 30),
          s"seed=$seed pair ($a,$b): reported $l exceeds DP ${lcs(all(a), all(b))}")
      }
      // (2) the corpus-wide longest cross-doc span is reported exactly
      val ids = all.keys.toSeq.sorted
      val dpMax = (for { a <- ids; b <- ids if a < b } yield lcs(all(a), all(b))).max
      assert(math.min(dpMax, 30) >= 8, "fixture must contain a long span")
      assert(got.values.max == math.min(dpMax, 30),
        s"seed=$seed: global max ${got.values.max} != min($dpMax, 30)")
    }
  }

  test("suffix dedup: an exact copy reports the block-capped full-length span") {
    import org.apache.spark.sql.functions._
    val text = (0 until 50).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val got = Dedup.suffixLcpPairs(docs).collect()
    assert(got.length == 1)
    assert(got.head.getLong(2) == 30L) // min(50, block 30)
    // every suffix position is adjacent to its twin, but only those
    // long enough to clear minLcp=15 qualify: positions 0..35 (the
    // tail suffixes are themselves shorter than the threshold)
    assert(got.head.getLong(3) == 36L)
  }

  test("sparse cosine: exact copies score 1e6, near copies high-but-sub-unit") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q_sparse_cosine")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    val byPair = out.map { case (a, b, c) => (a, b) -> c }.toMap
    for (id <- 0L until 5L) {
      assert(byPair.get((id, id + 1000000L)).contains(1000000L),
        s"exact copy of $id must score cos2_ppm = 1e6: ${byPair.get((id, id + 1000000L))}")
      val near = byPair.get((id, id + 2000000L))
      assert(near.exists(c => c >= 250000L && c < 1000000L),
        s"near copy of $id must be high but sub-unit: $near")
      // the exact and near copies of the same base doc also pair up
      assert(byPair.contains((id + 1000000L, id + 2000000L)),
        s"copy pair ($id+1M, $id+2M) missing")
    }
    // emission floor respected
    assert(out.forall(_._3 >= 250000L))
  }

  test("canonical election: hand-built cluster elects the known winner") {
    import org.apache.spark.sql.functions._
    // cluster 1: doc 11 and 12 tie on quality 9 — LOWER id wins;
    // cluster 2: doc 21 strictly richest; cluster 3: a singleton
    val members = Seq(
      (1L, 10L, 5L), (1L, 11L, 9L), (1L, 12L, 9L),
      (2L, 20L, 3L), (2L, 21L, 7L),
      (3L, 30L, 4L)).toDF("cluster", "doc_id", "n_tokens")
    val got = Dedup.electKeepers(members).collect()
      .map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got == Map(10L -> 0L, 11L -> 1L, 12L -> 0L,
      20L -> 0L, 21L -> 1L, 30L -> 1L))
  }

  test("canonical minhash query: planted copies cluster with sources, one keeper each") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q_dedup_canonical_minhash")(spark, sf001)
      .persist()
    val rows = out.collect()
    val byDoc = rows.map(r => r.getLong(1) -> r.getLong(0)).toMap
    // every planted near-copy landed in its source's cluster (the
    // in-query floor throws otherwise, but pin the labels here too)
    for (id <- 0L until 10L if byDoc.contains(id))
      assert(byDoc(id + 1000000L) == byDoc(id),
        s"planted ${id + 1000000L} not clustered with source $id")
    // delete list is the complement of the keepers, one per cluster
    val byCluster = rows.groupBy(_.getLong(0))
    byCluster.foreach { case (c, ms) =>
      assert(ms.map(_.getLong(3)).sum == 1L, s"cluster $c keeper count != 1")
    }
    out.unpersist()
  }

  test("banded-exact portable-coin pipeline: plants recovered with near-1 jaccard") {
    import org.apache.spark.sql.functions._
    val maxId = Tables.load(spark, sf001, "documents")
      .agg(max("doc_id")).head().getLong(0)
    val rows = SparkEntry.queries("q_dedup_banded_exact")(spark, sf001)
      .collect()
    // the in-query floor already throws below 10; pin the VALUES too:
    // a one-token-appended copy keeps (L-2)/(L-1) of its 3-gram set,
    // so every planted pair must verify well above the 500 threshold
    val planted = rows.filter(r => r.getLong(1) > maxId &&
      r.getLong(0) == r.getLong(1) - maxId - 1)
    assert(planted.length == 10, s"${planted.length} of 10 planted pairs")
    planted.foreach { r =>
      assert(r.getLong(2) >= 900L,
        s"planted pair (${r.getLong(0)},${r.getLong(1)}) jaccard " +
          s"${r.getLong(2)}‰ — expected near-verbatim")
    }
    // canonical pair order and threshold respected throughout
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "canonical order")
      assert(r.getLong(2) >= 500L && r.getLong(2) <= 1000L)
    }
  }
}
