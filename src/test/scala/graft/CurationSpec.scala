package graft

import org.apache.spark.sql.functions._

/** Invariants of the corpus-curation operators (llm.Curation) that the
  * row-hash oracle can't express directly. */
class CurationSpec extends SparkSpec {

  test("ngram contamination catches the shift-planted leaks the aligned pass misses") {
    val docs = Tables.load(spark, sf001, "documents")
    val bkt = llm.Sampling.hashBucket(col("doc_id"))
    val plantedIds = docs.where(bkt < 80).orderBy("doc_id").limit(3)
      .select((col("doc_id") + 200000L).as("id"))
      .collect().map(_.getLong(0)).toSet
    assert(plantedIds.size == 3)
    val out = llm.Curation.ngramContamination.fn(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- plantedIds) {
      assert(out.contains(id), s"shift-planted leak $id not flagged")
      // a one-token prefix costs at most the plant's leading grams;
      // the interior 13-grams of a 10+-token doc still collide
      assert(out(id) >= 1L, s"leak $id flagged with zero gram hits")
    }
    // the POINT of the unaligned pass: the same shift-planted texts
    // are invisible to offset-aligned 32-char fingerprints (every
    // byte offset moved by len("leadshift ")), so stage 2 catches
    // exactly what stage 1 cannot — computed here with stage 1's own
    // fingerprint rule
    val train = docs.where(bkt < 80).select(col("doc_id"), col("text"))
    val shifted = train.orderBy("doc_id").limit(3)
      .select((col("doc_id") + 200000L).as("doc_id"),
        concat(lit("leadshift "), col("text")).as("text"))
    def fps(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), explode(sequence(lit(0), lit(7))).as("k"), col("text"))
        .where(length(col("text")) >= (col("k") + 1) * 32)
        .select(col("doc_id"), md5(expr("substr(text, k*32+1, 32)").cast("binary")).as("fp"))
    val alignedHits = fps(shifted).join(fps(train), "fp").count()
    assert(alignedHits == 0L,
      s"aligned fingerprints unexpectedly caught the shifted plants ($alignedHits hits)")
  }

  test("domain reweight: weights near-exhaustive, monotone in excess loss") {
    val out = llm.Curation.domainReweight.fn(spark, sf001)
      .select("source", "excess_micro", "weight_permille")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val total = out.map(_._3).sum
    // floor division loses at most 1 permille per domain
    assert(total <= 1000L && total >= 1000L - out.length,
      s"weights sum $total out of the floor-rounding envelope")
    // softmax monotonicity: a strictly more surprising domain never
    // gets a smaller weight
    for (Seq((sa, ea, wa), (sb, eb, wb)) <- out.sortBy(_._2).toSeq.sliding(2))
      assert(wa <= wb, s"$sa (excess $ea, w $wa) > $sb (excess $eb, w $wb)")
    // reweighting must actually differentiate the sources
    assert(out.map(_._3).distinct.length > 1, "all domains got identical weights")
  }

  test("contamination flags all three planted leaks") {
    val docs = Tables.load(spark, sf001, "documents")
    val bkt = llm.Sampling.hashBucket(col("doc_id"))
    val plantedIds = docs.where(bkt < 80).orderBy("doc_id").limit(3)
      .select((col("doc_id") + 100000L).as("id"))
      .collect().map(_.getLong(0)).toSet
    assert(plantedIds.size == 3)
    val out = llm.Curation.contamination.fn(spark, sf001)
    val flagged = out.select("test_id").collect().map(_.getLong(0)).toSet
    assert(plantedIds.subsetOf(flagged),
      s"planted $plantedIds not all in flagged $flagged")
    // a planted leak matches at least its own source document
    val counts = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    plantedIds.foreach(id => assert(counts(id) >= 1))
  }

  test("sequence packing conserves tokens and respects shard budgets") {
    val out = llm.Curation.packSequences.fn(spark, sf001).collect()
    val docs = Tables.load(spark, sf001, "documents")
    val totalTok = docs
      .select(sum(size(split(trim(col("text")), "\\s+")).cast("long")))
      .head().getLong(0)
    assert(out.map(_.getAs[Long]("sum_tokens")).sum == totalTok,
      "every token lands in exactly one pack")
    // within a shard: pack ids are dense from 0, and every pack except
    // the last starts because the previous one crossed the budget —
    // so each non-final pack holds >= 256 tokens minus one straddling
    // document's worth; check the cheap dense-prefix property exactly.
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("pack_id")).sorted
      assert(ids.head == 0L && ids.zipWithIndex.forall { case (id, i) => id == i.toLong })
    }
  }

  test("corpus shuffle is a deterministic permutation") {
    val a = llm.Curation.corpusShuffle.fn(spark, sf001).collect()
    val b = llm.Curation.corpusShuffle.fn(spark, sf001).collect()
    assert(a.toSeq == b.toSeq, "same seed, same order")
    val n = Tables.load(spark, sf001, "documents").count()
    assert(a.map(_.getLong(0)).distinct.length.toLong == n, "permutation")
    // and it is not the identity order (the hash actually shuffles)
    assert(!a.map(_.getLong(0)).zipWithIndex.forall { case (id, i) => id == i.toLong })
  }

  test("stopword strip keeps counts consistent") {
    val out = llm.Curation.stopwordStrip.fn(spark, sf001)
    val docs = Tables.load(spark, sf001, "documents")
    val bad = out.join(docs, "doc_id")
      .where(col("n_kept") + col("n_dropped") =!=
        size(split(trim(col("text")), "\\s+")).cast("long"))
      .count()
    assert(bad == 0L, "kept + dropped == total tokens, per document")
  }

  test("chunking boundaries: window/stride arithmetic at edge lengths") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // token counts chosen around the 50-token window / 40 stride:
    // 1 (short), 49, 50 (exact window), 51 (first overflow), 90
    // (second chunk exactly full), 91 (third chunk born), 130, 131
    val docs = Seq(1, 49, 50, 51, 90, 91, 130, 131).map { n =>
      (n.toLong, (1 to n).map(i => s"t$i").mkString(" "))
    }.toDF("doc_id", "text")
    // the same window/stride arithmetic as Curation.chunkDocs,
    // applied to the edge-length fixture
    val got = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("chunk_id",
        explode(sequence(lit(1), expr("((greatest(n - 50, 0) + 39) div 40) + 1"))))
      .withColumn("chunk",
        concat_ws(" ", slice(col("toks"), (col("chunk_id") - 1) * 40 + 1, lit(50))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        min(size(split(col("chunk"), " "))).as("min_len"),
        max(size(split(col("chunk"), " "))).as("max_len"))
      .as[(Long, Long, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(1L) == ((1L, 1, 1)))
    assert(got(49L) == ((1L, 49, 49)))
    assert(got(50L) == ((1L, 50, 50)))
    assert(got(51L) == ((2L, 11, 50)))   // tail chunk = tokens 41..51
    assert(got(90L) == ((2L, 50, 50)))
    assert(got(91L) == ((3L, 11, 50)))   // third chunk = tokens 81..91
    assert(got(130L) == ((3L, 50, 50)))
    assert(got(131L) == ((4L, 11, 50)))
    // overlap property: consecutive chunks share exactly 10 tokens
    // (window 50 − stride 40) whenever both are full
  }

  test("segment dedup: planted copies lose every segment, keep-first is exact") {
    val out = llm.Curation.segmentDedup.fn(spark, sf001).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // every planted verbatim copy (doc_id >= 1000000) is fully
    // deduplicated: all segments dropped, empty-clean fingerprint
    val md5Empty = "d41d8cd98f00b204e9800998ecf8427e"
    val copies = out.filter(_.getLong(0) >= 1000000L)
    assert(copies.length == 5)
    copies.foreach { r =>
      assert(r.getAs[Long]("n_dup") == r.getAs[Long]("n_segs"))
      assert(r.getAs[String]("clean_sig") == md5Empty)
      // and its original kept at least one segment
      val orig = byId(r.getLong(0) - 1000000L)
      assert(orig.getAs[Long]("n_dup") < orig.getAs[Long]("n_segs"))
    }
    // keep-first means each distinct segment survives exactly once:
    // Σ(kept per doc) == global distinct segment count
    val docs = Tables.load(spark, sf001, "documents").select(col("doc_id"), col("text"))
    val planted = docs.filter(col("doc_id") < 5)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val distinctSegs = docs.unionAll(planted)
      .select(split(trim(col("text")), "\\s+").as("tk"))
      .withColumn("n_segs", floor(size(col("tk")) / 10).cast("long"))
      .filter(col("n_segs") > 0)
      .select(col("tk"), explode(sequence(lit(0L), col("n_segs") - 1)).as("i"))
      .select(concat_ws(" ",
        slice(col("tk"), (col("i") * 10 + 1).cast("int"), lit(10))).as("seg"))
      .distinct().count()
    val keptTotal = out.map(r => r.getAs[Long]("n_segs") - r.getAs[Long]("n_dup")).sum
    assert(keptTotal == distinctSegs,
      s"kept $keptTotal != distinct segments $distinctSegs")
  }

  test("curriculum order: unique positions, every 4-window mixes all quartiles") {
    val out = llm.Curation.curriculumOrder.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 500)
    val positions = out.map(_._4)
    assert(positions.distinct.length === positions.length, "positions must be unique")
    // interleave property: any aligned window of 4 consecutive
    // positions (while all buckets still have members) covers all four
    // difficulty quartiles — the training stream never starves
    val byPos = out.sortBy(_._4)
    val minBucketSize = out.groupBy(_._3).map(_._2.length).min
    for (w <- 0 until minBucketSize) {
      val buckets = byPos.slice(w * 4, w * 4 + 4).map(_._3).toSet
      assert(buckets === Set(1L, 2L, 3L, 4L), s"window $w saw $buckets")
    }
    // difficulty is non-decreasing within each bucket's subsequence
    for ((_, members) <- byPos.groupBy(_._3))
      assert(members.map(_._2).toSeq == members.map(_._2).sorted.toSeq)
  }

  test("curriculum order: distributed-rank arithmetic ≡ the ntile window spelling") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, sf001, "documents")
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
    val byDifficulty = Window.orderBy(col("n_tokens").asc, col("doc_id").asc)
    val withinBucket = Window.partitionBy(col("bucket"))
      .orderBy(col("n_tokens").asc, col("doc_id").asc)
    val reference = docs
      .withColumn("bucket", ntile(4).over(byDifficulty).cast("long"))
      .withColumn("pos",
        (row_number().over(withinBucket).cast("long") - 1) * 4 + col("bucket"))
      .select("doc_id", "n_tokens", "bucket", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val got = llm.Curation.curriculumOrder.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == reference)
  }

  test("PMI collocations match a hand-computed fixture and rank association over frequency") {
    import spark.implicits._
    // "a b" is frequent but independent filler; "x y" always co-occurs.
    // 5 copies of each pattern clear the min-count floor.
    val docs = Seq.tabulate(5)(i =>
      (i.toLong, "a b a c x y a b a d x y", "src")
    ).toDF("doc_id", "text", "source")
    val got = llm.Curation.pmiOf(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // per doc: 12 tokens, 11 bigrams; corpus: nUni = 60, nBig = 55
    val uni = Map("a" -> 20L, "b" -> 10L, "c" -> 5L, "d" -> 5L,
      "x" -> 10L, "y" -> 10L)
    def pmi(cxy: Long, cx: Long, cy: Long): Long =
      math.round((math.log(cxy * 60.0 / (cx * cy)) +
        math.log(60.0 / 55.0)) * 1000000.0)
    val want = Map(
      ("x y") -> (10L, uni("x"), uni("y"), pmi(10, 10, 10)),
      ("a b") -> (10L, uni("a"), uni("b"), pmi(10, 20, 10)))
    for ((bg, w) <- want)
      assert(got.find(_._1 == bg).map(t => (t._2, t._3, t._4, t._5)) ==
        Some(w), s"bigram $bg")
    // perfect association outranks the frequent-but-diluted pair
    val rank = got.map(_._1).toSeq
    assert(rank.indexOf("x y") < rank.indexOf("a b"))
  }

  test("curriculum write: every file owns a contiguous pos slice; files abut and cover 1..N") {
    val out = Staging.dir(spark, "graft_curriculum_layout_spec")
    llm.Curation.writeCurriculum(
      llm.Curation.curriculumOrdered(spark, sf001), out, 6)
    val byFile = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("pos").as("lo"), max("pos").as("hi"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[String]("f"), r.getAs[Long]("lo"),
        r.getAs[Long]("hi"), r.getAs[Long]("n")))
    val total = byFile.map(_._4).sum
    assert(total === 500L)
    // pos is a dense permutation of 1..N, so a file whose row count
    // equals its (hi - lo + 1) span holds a CONTIGUOUS slice of the
    // training order — the trainer can stream it without gaps
    for ((f, lo, hi, n) <- byFile)
      assert(n == hi - lo + 1, s"$f: $n rows over span [$lo,$hi]")
    // files are disjoint, abut exactly, and jointly cover 1..N —
    // streaming them in lo-order replays the whole curriculum
    val sorted = byFile.sortBy(_._2)
    assert(sorted.head._2 == 1L)
    assert(sorted.last._3 == total)
    for (Seq(a, b) <- sorted.toSeq.sliding(2))
      assert(b._2 == a._3 + 1, s"gap/overlap between ${a._1} and ${b._1}")
    // the range write actually fanned out (not one monolithic file)
    assert(byFile.length > 1)
  }

  test("boilerplate strip removes exactly the shared banner, keeps unique content intact") {
    import spark.implicits._
    // 10 docs of srcA share a 5-token banner + have unique bodies;
    // 2 docs of srcB carry the SAME banner text but are below the
    // per-source threshold, so srcB keeps it
    val a = (0 until 10).map(i =>
      (i.toLong, "srcA", s"join our newsletter today now body$i one two three four"))
    val b = Seq((100L, "srcB", "join our newsletter today now other stuff here pad pad"),
      (101L, "srcB", "join our newsletter today now more words go here pad"))
    val docs = (a ++ b).toDF("doc_id", "source", "text")
    val out = llm.Curation.boilerplateStripOf(docs, minDocs = 10)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // srcA: 2 segments total, banner stripped, body kept
    for (i <- 0 until 10) {
      val (_, tot, kept, sig) = out(i.toLong)
      assert(tot == 2L && kept == 1L, s"doc $i: want 2 segs, 1 kept; got $tot/$kept")
      val bodySig = docs.where(col("doc_id") === i.toLong)
        .select(md5(concat_ws(" ",
          org.apache.spark.sql.functions.slice(split(col("text"), " "), 6, 5))
          .cast("binary"))).head().getString(0)
      assert(sig == bodySig, s"doc $i: cleaned content is exactly the post-banner body")
    }
    // srcB: below threshold — nothing stripped
    for (id <- Seq(100L, 101L)) {
      val (_, tot, kept, _) = out(id)
      assert(tot == kept, s"doc $id: sub-threshold source must keep all segments")
    }
  }

  test("coverage Shapley: closed form equals the axiomatic definition, efficiency holds") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y", "en", "a"),
      (2L, "y z", "en", "b"),
      (3L, "z", "en", "c")
    ).toDF("doc_id", "text", "lang", "source")
    val L = llm.Curation.ShapleyL
    val got = llm.Curation.shapleyOf(docs).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("shapley_lunits")).toMap
    // brute-force the Shapley definition over all 2^3 subsets of the
    // coverage game v(S) = #types covered by the union of S
    val toksBySrc = Map("a" -> Set("x", "y"), "b" -> Set("y", "z"), "c" -> Set("z"))
    val srcs = toksBySrc.keys.toSeq.sorted
    def v(sub: Set[String]): Long =
      sub.flatMap(toksBySrc).size.toLong
    def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
    val n = srcs.size
    srcs.foreach { i =>
      val others = srcs.filterNot(_ == i)
      // φ_i in L-units: weights |S|!(n-1-|S|)!/n! times L stay integral
      // because n! = 6 divides L
      val phi = others.toSet.subsets().map { sub =>
        val w = fact(sub.size) * fact(n - 1 - sub.size)
        (L / fact(n)) * w * (v(sub + i) - v(sub))
      }.sum
      assert(got(i) == phi, s"source $i: closed form ${got(i)} != axiomatic $phi")
    }
    // efficiency axiom: shares exhaust the grand coalition's value
    assert(got.values.sum == L * v(srcs.toSet), "efficiency axiom violated")
    // the declared query on real data: same axiom, corpus-wide
    val q = llm.Curation.shapleySources.fn(spark, sf001).collect()
    val total = q.map(_.getAs[Long]("shapley_lunits")).sum
    val types = Tables.load(spark, sf001, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("t"))
      .filter(col("t") =!= "").select("t").distinct().count()
    assert(total == L * types, s"corpus efficiency: $total != $L * $types")
  }

  test("facility greedy: exact trajectory on a hand graph — blob first, diminishing gains") {
    import spark.implicits._
    val points = (1L to 10L).toDF("vec_id")
    // blob {1..5} pairwise identical; a 0.9-pair (6,7); 8,9,10 isolated
    val pairs = ((for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b, 1.0)) :+
      ((6L, 7L, 0.9))).toDF("vec_a", "vec_b", "sim")
    val got = llm.Curation.facilityGreedy(points, pairs, k = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // step 1: any blob member covers all five at 1.0 -> gain 5e6, tie to id 1
    // step 2: 6 covers itself + 0.9 of 7 -> 1.9e6
    // step 3: 8 (fresh singleton, 1e6) beats 7 (0.1e6 residual self-gap)
    // step 4: 9
    assert(got.toSeq == Seq(
      (1L, 1L, 5000000L, 5000000L),
      (2L, 6L, 1900000L, 6900000L),
      (3L, 8L, 1000000L, 7900000L),
      (4L, 9L, 1000000L, 8900000L)), got.toSeq.toString)
  }
}
