package graft

import org.apache.spark.sql.functions._

/** Invariants of the integer-arithmetic PageRank (ops.Graph) beyond
  * the unrolled-SQL hash oracle. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val SCALE = 1000000000000L

  test("pagerank on a star: the hub outranks the leaves, ranks are ordered by degree") {
    // undirected star a(0)–b(1), a–c(2), a–d(3): hub sends 1/3 to each
    // leaf, every leaf sends everything back to the hub
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val pr = ops.Graph.pageRank(edges, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr.size == 4)
    assert(Seq(1L, 2L, 3L).map(pr).distinct.size == 1, "leaves are symmetric")
    assert(pr(0L) > pr(1L), "hub outranks leaves")
    // closed form at the fixpoint: hub = (1-d)/4 + d*3*(leaf/1... ) —
    // just pin conservation instead: floor losses only ever LOSE mass
    val total = pr.values.sum
    assert(total <= SCALE && total > SCALE - 1000L * pr.size,
      s"rank mass conserved up to floor losses, got $total")
  }

  test("pagerank on a ring is uniform and equals the teleport fixpoint") {
    // 4-ring: every vertex has degree 2 in each direction; perfect
    // symmetry means every iteration keeps ranks equal, and the
    // integer fixpoint is r = t + (85*r) div 100 reached from r0 = S/4
    val ring = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val pr = ops.Graph.pageRank(ring, 5).collect().map(_.getLong(1))
    assert(pr.distinct.length == 1, "symmetric graph, equal ranks")
    var r = SCALE / 4
    val t = (15L * (SCALE / 4)) / 100
    for (_ <- 1 to 5) {
      // each vertex receives two contributions of r div 2
      r = t + (85L * (2L * (r / 2))) / 100
    }
    assert(pr.head == r, s"integer trajectory mismatch: got ${pr.head}, want $r")
  }

  test("pagerank == sequential reference on seeded random graphs") {
    // the distributed rounds must reproduce the EXACT integer
    // trajectory of a single-threaded reference loop — on arbitrary
    // graph shapes, not just the symmetric fixtures above
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val nV = 12 + rnd.nextInt(20)
      val undirected = (0 until (nV * 2)).map { _ =>
        (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong)
      }.filter { case (a, b) => a != b }.distinct
      val edges = undirected.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      val got = ops.Graph.pageRank(edges.toDF("src", "dst"), 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: same arithmetic, driver-side maps
      val verts = edges.map(_._1).distinct.sorted
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val init = SCALE / verts.size
      val t = 15L * init / 100L
      var pr = verts.map(_ -> init).toMap
      for (_ <- 1 to 5) {
        val contrib = edges.groupBy(_._2).view.mapValues(
          _.map { case (u, _) => pr(u) / deg(u) }.sum).toMap
        pr = verts.map(v => v -> (t + 85L * contrib.getOrElse(v, 0L) / 100L)).toMap
      }
      assert(got == pr, s"seed $seed: distributed != reference")
    }
  }

  test("co-purchase: hand-built baskets, canonical pair order, distinct-first") {
    val li = Seq(
      (1L, 10L), (1L, 20L), (1L, 20L), // dup line of part 20 must count once
      (2L, 10L), (2L, 20L),
      (3L, 20L), (3L, 10L), (3L, 30L), // order irrelevant: pair stored p1<p2
      (4L, 40L) // singleton basket contributes nothing
    ).toDF("o", "p")
    val pairs = li.distinct().as("a")
      .join(li.distinct().as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("p1"), col("b.p").as("p2"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs == Map((10L, 20L) -> 3L, (10L, 30L) -> 1L, (20L, 30L) -> 1L))
  }

  test("gram matrix: diagonal matches per-coordinate sums of squares, full triangle present") {
    val out = llm.Similarity.gramMatrix.fn(spark, sf001).collect()
    val dim = 64
    assert(out.length == dim * (dim + 1) / 2, "full upper triangle")
    val nVec = Tables.load(spark, sf001, "embeddings").count()
    assert(out.forall(_.getAs[Long]("n") == nVec), "every cell sums over every vector")
    // recompute one diagonal cell independently
    val d0 = Tables.load(spark, sf001, "embeddings")
      .select(element_at(col("embedding").cast("array<double>"), 1).as("x"))
      .select(round(col("x") * 1000000.0, 0).cast("long").as("q"))
      .agg(sum(col("q") * col("q"))).head().getLong(0)
    val cell = out.find(r => r.getAs[Long]("i") == 0L && r.getAs[Long]("j") == 0L).get
    assert(cell.getAs[Long]("gram_micro2") == d0)
  }

  test("GramAgg == the declarative explode formulation, cell for cell") {
    val quant = transform(col("embedding").cast("array<double>"),
      x => round(x * 1000000.0, 0).cast("long"))
    val base = Tables.load(spark, sf001, "embeddings").select(quant.as("q"))
    val viaAgg = llm.Similarity.gramMatrix.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val pairs = flatten(transform(sequence(lit(0), lit(63)), i =>
      transform(sequence(i, lit(63)), j =>
        struct(i.cast("long").as("i"), j.cast("long").as("j"),
          (element_at(col("q"), (i + 1).cast("int")) *
            element_at(col("q"), (j + 1).cast("int"))).as("p")))))
    val viaExplode = base.select(explode(pairs).as("c"))
      .groupBy(col("c.i").as("i"), col("c.j").as("j"))
      .agg(count(lit(1)).as("n"), sum(col("c.p")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(viaAgg == viaExplode)
  }

  test("triangle stats: K4 + pendant path fixture, hand-countable") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles), pendant path 4-5-6 (no new
    // triangles): 8 edges, degrees 3,3,3,4,2,1 →
    // wedges 3·C(3,2) + C(4,2) + C(2,2→1) = 9 + 6 + 1 = 16
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("u", "v")
    val row = ops.Graph.triangleStats(edges).collect().head
    assert(row.getLong(0) == 6L, s"vertices: $row")
    assert(row.getLong(1) == 8L, s"edges: $row")
    assert(row.getLong(2) == 16L, s"wedges: $row")
    assert(row.getLong(3) == 4L, s"triangles: $row")
    assert(row.getLong(4) == 3000L * 4 / 16, s"clustering: $row")
  }

  test("triangle stats: triangle-free bipartite graph counts zero") {
    import spark.implicits._
    // K2,3: 6 edges, no odd cycles — any nonzero count is a closure bug
    val edges = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L), (2L, 30L))
      .toDF("u", "v")
    val row = ops.Graph.triangleStats(edges).collect().head
    assert(row.getLong(3) == 0L, s"bipartite graph has no triangles: $row")
    assert(row.getLong(2) == 2L * 3 + 3L * 1, s"wedges: $row") // deg 3,3,2,2,2
  }

  test("bfs: path graph hop distances, horizon cutoff, multi-source min") {
    import spark.implicits._
    // path 0–1–2–3–4–5–6, symmetric edges
    val edges = (0L until 6L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
      .toDF("src", "dst")
    // single source at 0, 4 rounds: vertices 0..4 reachable, 5 and 6 beyond
    val one = ops.Graph.bfs(edges, Seq(0L).toDF("v"), 4)
      .as[(Long, Long)].collect().toMap
    assert(one == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
    // sources at both ends: distance is the min over sources
    val two = ops.Graph.bfs(edges, Seq(0L, 6L).toDF("v"), 4)
      .as[(Long, Long)].collect().toMap
    assert(two == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L,
      4L -> 2L, 5L -> 1L, 6L -> 0L))
  }

  test("bfs == sequential reference on a seeded random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val und = (1 to 120).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }.distinct
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    val srcs = Seq(0L, 7L).filter(v => edges.exists(_._1 == v))
    // sequential BFS to horizon 4
    var ref = srcs.map(_ -> 0L).toMap
    for (_ <- 1 to 4) {
      val nxt = edges.flatMap { case (u, v) => ref.get(u).map(d => v -> (d + 1)) }
      ref = (ref.toSeq ++ nxt).groupBy(_._1).map { case (v, ds) => v -> ds.map(_._2).min }
    }
    val got = ops.Graph.bfs(edges.toDF("src", "dst"), srcs.toDF("v"), 4)
      .as[(Long, Long)].collect().toMap
    assert(got == ref)
  }

  test("label propagation: path graph labels spread exactly k hops") {
    // path 0-1-2-3-4-5-6-7 (symmetric): after 3 rounds vertex v holds
    // min(0, v-3) ... i.e. max(0, v-3); vertex 7 cannot yet see 0
    val edges = (0L until 7L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
      .toDF("src", "dst")
    val got = ops.Graph.labelProp(edges, 3)
      .as[(Long, Long)].collect().toMap
    (0L to 7L).foreach { v =>
      assert(got(v) == math.max(0L, v - 3), s"v=$v got ${got(v)}")
    }
  }

  test("label propagation: two components never share labels") {
    val compA = (0L until 5L).flatMap(i => Seq((i, (i + 1) % 5), ((i + 1) % 5, i)))
    val compB = (10L until 15L).flatMap(i =>
      Seq((i, 10L + (i + 1) % 5), (10L + (i + 1) % 5, i)))
    val got = ops.Graph.labelProp((compA ++ compB).toDF("src", "dst"), 3)
      .as[(Long, Long)].collect().toMap
    // 5-cycles: radius ≤ 2 from the minimum, so 3 rounds converge
    (0L until 5L).foreach(v => assert(got(v) == 0L, s"v=$v got ${got(v)}"))
    (10L until 15L).foreach(v => assert(got(v) == 10L, s"v=$v got ${got(v)}"))
  }

  test("label propagation == sequential reference on a seeded random graph") {
    val rnd = new scala.util.Random(23)
    val und = (1 to 100).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }.distinct
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    var ref = edges.map(_._1).distinct.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      val upd = edges.flatMap { case (u, v) => Some(v -> ref(u)) }
      ref = ref.map { case (v, l) =>
        v -> math.min(l, upd.filter(_._1 == v).map(_._2).minOption.getOrElse(l))
      }
    }
    val got = ops.Graph.labelProp(edges.toDF("src", "dst"), 3)
      .as[(Long, Long)].collect().toMap
    assert(got == ref)
  }

  private def symDF(pairs: Seq[(Long, Long)]) =
    pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")

  private def trajSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("incremental pagerank: delta+state ≡ full recompute at two-batch depth") {
    val e0 = symDF(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (1L, 6L), (2L, 6L), (6L, 7L), (7L, 8L)))
    val d1 = symDF(Seq((1L, 3L), (4L, 6L))) // settled endpoints only
    val d2 = symDF(Seq((2L, 5L), (7L, 1L)))
    def degOf(e: org.apache.spark.sql.DataFrame) =
      e.groupBy("src").agg(count(lit(1)).as("d"))
    // batch 1: incremental against the bootstrap state
    val traj0 = ops.Graph.pageRankTrajectory(e0, 5)
    val inc1 = ops.Graph.incrementalPageRank(e0, d1, degOf(e0), traj0, 5)
    val e1 = e0.unionByName(d1)
    assert(trajSet(inc1) == trajSet(ops.Graph.pageRankTrajectory(e1, 5)),
      "batch-1 incremental trajectory must equal the full recompute")
    // batch 2: state = batch 1's OUTPUT — the absorption loop composes
    val inc2 = ops.Graph.incrementalPageRank(e1, d2, degOf(e1), inc1, 5)
    assert(trajSet(inc2) ==
      trajSet(ops.Graph.pageRankTrajectory(e1.unionByName(d2), 5)),
      "batch-2 incremental (on incremental state) must equal the full recompute")
  }

  test("incremental BFS: delta+state ≡ full recompute; shortcuts, new vertices, new sources") {
    def distsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // path 0-1-2-3-4-5 with source 0 (v % 100 == 0): dists 0..4, 5 unreached
    val e0 = symDF(Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    def sourcesOf(e: org.apache.spark.sql.DataFrame) =
      e.select(col("src").as("v")).distinct().filter(col("v") % 100 === 0)
    val state0 = ops.Graph.bfs(e0, sourcesOf(e0), 4)
    // batch 1: a shortcut 0-4 (pulls 4 from dist 4 to 1, reaches 5 at 2)
    // and a dangling new vertex 6 off 5
    val d1 = symDF(Seq((0L, 4L), (5L, 6L)))
    val inc1 = ops.Graph.incrementalBfs(e0, d1,
      spark.emptyDataset[Long](org.apache.spark.sql.Encoders.scalaLong).toDF("v"),
      state0, 4)
    val e1 = e0.unionByName(d1)
    assert(distsOf(inc1) == distsOf(ops.Graph.bfs(e1, sourcesOf(e1), 4)),
      "batch-1 incremental must equal the full bounded BFS")
    // batch 2 on batch 1's output: vertex 100 arrives — a NEW SOURCE
    val d2 = symDF(Seq((100L, 3L)))
    val newSrc = Seq(100L).toDF("v")
    val inc2 = ops.Graph.incrementalBfs(e1, d2, newSrc, inc1, 4)
    val e2 = e1.unionByName(d2)
    assert(distsOf(inc2) == distsOf(ops.Graph.bfs(e2, sourcesOf(e2), 4)),
      "batch-2 incremental (new source, on incremental state) must equal full")
    // the new source is dist 0 and re-prices its neighborhood
    assert(distsOf(inc2).contains((100L, 0L)))
    assert(distsOf(inc2).contains((3L, 1L)))
  }

  test("incremental pagerank/CC/BFS ≡ full recompute on seeded random graphs + deltas") {
    for (seed <- Seq(7, 23, 101)) {
      val rnd = new scala.util.Random(seed)
      val nV = 30 + rnd.nextInt(20)
      val pairs = (0 until 80).flatMap { _ =>
        val a = rnd.nextInt(nV).toLong; val b = rnd.nextInt(nV).toLong
        if (a == b) None else Some((math.min(a, b), math.max(a, b)))
      }.distinct
      val (deltaRaw, histRaw) = pairs.partition(_ => rnd.nextDouble() < 0.2)
      assume(histRaw.nonEmpty)
      // PageRank requires settled endpoints: vertex-adding delta
      // pairs fold back into history, the rest form the batch
      val histVerts = histRaw.flatMap(p => Seq(p._1, p._2)).toSet
      val (deltaPr, displaced) = deltaRaw.partition(
        p => histVerts(p._1) && histVerts(p._2))
      val histPr = histRaw ++ displaced
      def set(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
        df.collect().map(_.toSeq).toSet

      val prState = ops.Graph.pageRankTrajectory(symDF(histPr), 5)
      val prInc = ops.Graph.incrementalPageRank(symDF(histPr), symDF(deltaPr),
        symDF(histPr).groupBy("src").agg(count(lit(1)).as("d")), prState, 5)
      assert(set(prInc) == set(ops.Graph.pageRankTrajectory(symDF(histPr ++ deltaPr), 5)),
        s"pagerank seed=$seed")

      // CC and BFS take the RAW split — new vertices are in-domain
      val ccState = llm.Dedup.connectedComponents(symDF(histRaw),
        histVerts.toSeq.toDF("id"))
      val ccInc = llm.Dedup.incrementalComponents(ccState, symDF(deltaRaw))
      val allVerts = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      assert(set(ccInc) == set(llm.Dedup.connectedComponents(
        symDF(pairs), allVerts.toDF("id"))), s"cc seed=$seed")

      def srcOf(vs: Seq[Long]) = vs.filter(_ % 5 == 0)
      val bfsState = ops.Graph.bfs(symDF(histRaw),
        srcOf(histVerts.toSeq).toDF("v"), 4)
      val deltaVerts = deltaRaw.flatMap(p => Seq(p._1, p._2)).distinct
      val newSrc = srcOf(deltaVerts.filterNot(histVerts)).toDF("v")
      val bfsInc = ops.Graph.incrementalBfs(symDF(histRaw), symDF(deltaRaw),
        newSrc, bfsState, 4)
      assert(set(bfsInc) == set(ops.Graph.bfs(symDF(pairs),
        srcOf(allVerts).toDF("v"), 4)), s"bfs seed=$seed")

      val lpState = ops.Graph.labelPropTrajectory(symDF(histRaw), 3)
      val lpInc = ops.Graph.incrementalLabelProp(symDF(histRaw), symDF(deltaRaw),
        lpState, 3)
      assert(set(lpInc) == set(ops.Graph.labelPropTrajectory(symDF(pairs), 3)),
        s"labelprop seed=$seed")
    }
  }

  test("incremental pagerank refuses vertex-adding deltas (teleport renormalizes)") {
    val e0 = symDF(Seq((1L, 2L), (2L, 3L)))
    val traj0 = ops.Graph.pageRankTrajectory(e0, 5)
    val deg0 = e0.groupBy("src").agg(count(lit(1)).as("d"))
    val bad = symDF(Seq((3L, 99L))) // 99 unseen in history
    val ex = intercept[IllegalArgumentException] {
      ops.Graph.incrementalPageRank(e0, bad, deg0, traj0, 5).collect()
    }
    assert(ex.getMessage.contains("settled vertex set"), ex.getMessage)
  }

  test("link prediction: square graph predicts the two diagonals, path predicts endpoints") {
    // square 1-2-3-4-1: non-edges are the diagonals (1,3) and (2,4),
    // each with BOTH off-diagonal vertices as common neighbors
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("p1", "p2")
    val sq = ops.Graph.commonNeighborScores(square)
      .as[(Long, Long, Long)].collect().toSet
    assert(sq == Set((1L, 3L, 2L), (2L, 4L, 2L)))
    // path 1-2-3: single predicted link (1,3) through center 2;
    // the existing edges must NOT appear in the output
    val path = Seq((1L, 2L), (2L, 3L)).toDF("p1", "p2")
    val pa = ops.Graph.commonNeighborScores(path)
      .as[(Long, Long, Long)].collect().toSet
    assert(pa == Set((1L, 3L, 1L)))
  }

  test("link prediction on the corpus graph returns non-adjacent pairs only") {
    val top = ops.Graph.linkPredict.fn(spark, sf001)
    val rows = top.collect()
    assert(rows.nonEmpty, "pinned-year co-purchase graph yields predictions")
    assert(rows.forall(_.getLong(2) >= 1L))
    // ranked: cn non-increasing
    val cns = rows.map(_.getLong(2))
    assert(cns.zip(cns.tail).forall { case (a, b) => a >= b })
  }

  /** Sequential peeling reference: the unique maximal subgraph with
    * min degree ≥ k. */
  private def kCoreRef(edges: Seq[(Long, Long)], k: Int): Set[Long] = {
    var adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (x, ys) => x -> ys.map(_._2).toSet }
    var changed = true
    while (changed) {
      val drop = adj.collect { case (x, ns) if ns.size < k => x }.toSet
      changed = drop.nonEmpty
      adj = (adj -- drop).map { case (x, ns) => x -> (ns -- drop) }
    }
    adj.keySet
  }

  test("k-core: planted clique survives peeling that erases the sparse rest") {
    import spark.implicits._
    // K6 on vertices 0..5 + a long path 10..40 (path degrees ≤ 2)
    val clique = for (u <- 0L to 5L; v <- (u + 1) to 5L) yield (u, v)
    val path = (10L until 40L).map(i => (i, i + 1))
    val edges = (clique ++ path).toDF("u", "v")
    val core = ops.Graph.kCore(edges, 5).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(core == (0L to 5L).toSet, s"5-core should be exactly the K6: $core")
    // k beyond the clique's degree empties the graph, and that's
    // reported as zero edges, not an error
    assert(ops.Graph.kCore(edges, 6).count() == 0)
  }

  /** Sequential Brandes for the pinned source set. */
  private def brandesRef(edges: Seq[(Long, Long)], sources: Seq[Long]): Map[Long, Double] = {
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).map { case (x, ys) => x -> ys.map(_._2) }
    val acc = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
    sources.foreach { s =>
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1L).withDefaultValue(0L)
      val order = scala.collection.mutable.ArrayBuffer(s)
      var i = 0
      while (i < order.size) {
        val v = order(i); i += 1
        adj.getOrElse(v, Nil).foreach { w =>
          if (!dist.contains(w)) { dist(w) = dist(v) + 1; order += w }
          if (dist(w) == dist(v) + 1) sigma(w) += sigma(v)
        }
      }
      val delta = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      order.reverse.foreach { w =>
        adj.getOrElse(w, Nil).foreach { v =>
          if (dist.contains(v) && dist(v) == dist(w) - 1)
            delta(v) += sigma(v).toDouble / sigma(w) * (1.0 + delta(w))
        }
      }
      delta.foreach { case (v, d) => if (v != s) acc(v) += d }
    }
    sources.foreach(acc.remove)
    acc.toMap
  }

  test("betweenness trips the sigma-overflow sentinel on a path-count explosion") {
    import spark.implicits._
    // source -> 10 fully-connected layers of 40: sigma multiplies by
    // 40 per layer, passing the 2^43 envelope (40^9 ~ 2.6e14) at the
    // last layer — the forward pass must raise, not wrap a long sum
    // into garbage (review finding, r17; the DuckDB oracle side
    // errors hard on its HUGEINT cast, so both engines fail loudly)
    val layers = 10
    val width = 40
    def node(l: Int, j: Int): Long = l * 1000L + j
    val edges = ((0 until width).map(j => (0L, node(1, j))) ++
      (for {
        l <- 1 until layers; a <- 0 until width; b <- 0 until width
      } yield (node(l, a), node(l + 1, b)))).toDF("u", "v")
    val e = intercept[Exception] {
      ops.Graph.betweenness(edges, Seq(0L)).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(e).contains("sigma overflow"), messages(e))
  }

  test("betweenness == sequential Brandes on fixtures and a seeded random graph") {
    import spark.implicits._
    // path graph 0-1-2-3-4 from source 0: delta = (3,2,1,0) on 1..4
    val path = (0L until 4L).map(i => (i, i + 1))
    val gotPath = ops.Graph.betweenness(path.toDF("u", "v"), Seq(0L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotPath == Map(1L -> 3000L, 2L -> 2000L, 3L -> 1000L, 4L -> 0L), gotPath)
    val rnd = new scala.util.Random(101)
    val edges = (0 until 120).map { _ =>
      val u = rnd.nextInt(30).toLong; val v = rnd.nextInt(30).toLong
      (math.min(u, v), math.max(u, v))
    }.filter(e => e._1 != e._2).distinct
    val sources = Seq(0L, 1L, 2L)
    val got = ops.Graph.betweenness(edges.toDF("u", "v"), sources)
      .collect().map(r => r.getLong(0) -> r.getLong(1) / 1000.0).toMap
    val want = brandesRef(edges, sources)
    val keys = (got.keySet ++ want.keySet).filterNot(sources.contains)
    keys.foreach { v =>
      val g = got.getOrElse(v, 0.0); val w = want.getOrElse(v, 0.0)
      assert(math.abs(g - w) <= 0.002 + 1e-6 * math.abs(w),
        s"vertex $v: $g vs $w")
    }
  }

  test("k-core == sequential reference on seeded random graphs") {
    import spark.implicits._
    for (seed <- Seq(11, 23)) {
      val rnd = new scala.util.Random(seed)
      val n = 40
      val edges = (0 until 160).map { _ =>
        val u = rnd.nextInt(n).toLong; val v = rnd.nextInt(n).toLong
        (math.min(u, v), math.max(u, v))
      }.filter(e => e._1 != e._2).distinct
      for (k <- Seq(3, 5)) {
        val got = ops.Graph.kCore(edges.toDF("u", "v"), k).collect()
          .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
        val want = kCoreRef(edges, k)
        assert(got == want, s"seed $seed k $k: $got vs $want")
      }
    }
  }

  test("bellman-ford: cheapest path beats fewest hops; hop bound is exact") {
    // 0 -> 1 -> 2 via w=10 each, plus a direct 0 -> 2 at w=100:
    // 2 rounds find 20 through the middle, 1 round can only see the
    // direct edge (100). Hop-bounded semantics, exactly.
    val edges = Seq((0L, 1L, 10L), (1L, 2L, 10L), (0L, 2L, 100L))
      .flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
      .toDF("src", "dst", "w")
    val sources = Seq(0L).toDF("v")
    def run(r: Int) = ops.Graph.bellmanFord(edges, sources, r).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(run(2) == Map(0L -> 0L, 1L -> 10L, 2L -> 20L), run(2).toString)
    assert(run(1) == Map(0L -> 0L, 1L -> 10L, 2L -> 100L), run(1).toString)
  }

  test("bellman-ford == sequential reference on a seeded random weighted graph") {
    val rnd = new scala.util.Random(13)
    val n = 30
    val edges = (0 until 120).map { _ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, (1 + rnd.nextInt(50)).toLong)
    }.filter(e => e._1 != e._2)
    val rounds = 4
    // reference: k-round relaxation from vertex 0
    var ref = Map(0L -> 0L)
    for (_ <- 1 to rounds) {
      val relaxed = edges.flatMap { case (a, b, w) =>
        ref.get(a).map(d => b -> (d + w))
      }
      ref = (ref.toSeq ++ relaxed).groupBy(_._1)
        .map { case (v, ds) => v -> ds.map(_._2).min }
    }
    val got = ops.Graph.bellmanFord(
        edges.toDF("src", "dst", "w"), Seq(0L).toDF("v"), rounds)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got == ref, s"$got vs $ref")
  }

  test("temporal reach: a chronologically inverted path does NOT transmit") {
    // 0-1 active at day 5, 1-2 active at day 3 only: static reach
    // says 2 is connected, temporal says no (3 < 5). Adding a later
    // 1-2 edge at day 7 opens it with arrival 7, not 3.
    val base = Seq((0L, 1L, 5L), (1L, 2L, 3L))
    def run(extra: Seq[(Long, Long, Long)]) = ops.Graph.temporalReach(
        (base ++ extra).flatMap { case (a, b, t) => Seq((a, b, t), (b, a, t)) }
          .toDF("src", "dst", "t"),
        Seq(0L).toDF("v"), 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(run(Nil) == Map(0L -> 0L, 1L -> 5L), run(Nil).toString)
    assert(run(Seq((1L, 2L, 7L))) == Map(0L -> 0L, 1L -> 5L, 2L -> 7L))
  }

  test("temporal reach == sequential reference on a seeded random temporal graph") {
    val rnd = new scala.util.Random(29)
    val n = 25
    val edges = (0 until 150).map { _ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, rnd.nextInt(30).toLong)
    }.filter(e => e._1 != e._2).distinct
    val rounds = 4
    var ref = Map(0L -> 0L)
    for (_ <- 1 to rounds) {
      val relaxed = edges.flatMap { case (a, b, t) =>
        ref.get(a).filter(_ <= t).map(_ => b -> t)
      }
      ref = (ref.toSeq ++ relaxed).groupBy(_._1)
        .map { case (v, ts) => v -> ts.map(_._2).min }
    }
    val got = ops.Graph.temporalReach(
        edges.toDF("src", "dst", "t"), Seq(0L).toDF("v"), rounds)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got == ref, s"$got vs $ref")
  }

  test("hits: broad sourcing makes the hub, broad demand makes the authority") {
    // c1 -> {s1, s2, s3}, c2 -> {s1}: c1 is the stronger hub;
    // s1 (bought by both) the stronger authority; s2 == s3 symmetric.
    val e = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L))
      .toDF("src", "dst")
    val got = ops.Graph.hits(e, 2).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got(("hub", 1L)) > got(("hub", 2L)), got.toString)
    assert(got(("authority", 10L)) > got(("authority", 11L)), got.toString)
    assert(got(("authority", 11L)) == got(("authority", 12L)), got.toString)
    // sum-normalized micro masses (truncation may shave a few micro)
    val hubs = got.collect { case (("hub", _), v) => v }.sum
    val auths = got.collect { case (("authority", _), v) => v }.sum
    assert(hubs > 999990L && hubs <= 1000000L, s"hub mass $hubs")
    assert(auths > 999990L && auths <= 1000000L, s"authority mass $auths")
  }

  test("hits == sequential double-iteration reference on a seeded random digraph") {
    val rnd = new scala.util.Random(41)
    val edges = (0 until 80).map { _ =>
      (rnd.nextInt(12).toLong, (100 + rnd.nextInt(12)).toLong)
    }.distinct
    // sequential reference with the same integer normalization
    val srcs = edges.map(_._1).distinct.sorted
    var h = srcs.map(_ -> 1000000L / srcs.size).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to 2) {
      val ar = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => h(e._1)).sum }
      val as = ar.values.sum
      a = ar.map { case (d, v) => d -> v * 1000000L / as }
      val hr = edges.groupBy(_._1).map { case (s, es) =>
        s -> es.map(e => a(e._2)).sum }
      val hs = hr.values.sum
      h = hr.map { case (s, v) => s -> v * 1000000L / hs }
    }
    val got = ops.Graph.hits(edges.toDF("src", "dst"), 2).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    a.foreach { case (d, v) =>
      assert(got(("authority", d)) == v, s"authority $d") }
    h.foreach { case (s, v) =>
      assert(got(("hub", s)) == v, s"hub $s") }
  }

  test("personalized pagerank == sequential integer reference; restart pins the seed") {
    val rnd = new scala.util.Random(67)
    val und = (0 until 60).map { _ =>
      val a = rnd.nextInt(15).toLong; val b = rnd.nextInt(15).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val seed = edges.map(_._1).min
    val M = 1000000000000L
    val deg = edges.groupBy(_._1).map { case (v, es) => v -> es.size.toLong }
    var ref: Map[Long, Long] = deg.keys.map(v =>
      v -> (if (v == seed) M else 0L)).toMap
    for (_ <- 1 to 5) {
      val contrib = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => ref(e._1) / deg(e._1)).sum }
      ref = deg.keys.map { v =>
        v -> ((if (v == seed) 15L * M / 100L else 0L) +
          85L * contrib.getOrElse(v, 0L) / 100L)
      }.toMap
    }
    val got = ops.Graph.personalizedPageRank(edges.toDF("src", "dst"), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref, s"$got vs $ref")
    // the restart floor: the seed always keeps at least its teleport
    assert(got(seed) >= 15L * M / 100L)
    // truncation only ever LOSES mass
    assert(got.values.sum <= M)
  }

  test("temporal katz: walk counts match hand enumeration, time order enforced") {
    // seed 0. edges: 0->1@t1, 1->2@t2, 1->2@t0 (inverted), 0->2@t3.
    // walks (<=3 edges): to 1: [0-1@1] = 1.
    // to 2: [0-2@3] = 1, [0-1@1, 1-2@2] = 1 (t2>=t1 ok);
    //       [0-1@1, 1-2@0] invalid (0 < 1). total 2.
    val edges = Seq((0L, 1L, 1L), (1L, 2L, 2L), (1L, 2L, 0L), (0L, 2L, 3L))
      .toDF("src", "dst", "t")
    val got = ops.Graph.temporalWalkCounts(edges, Seq(0L).toDF("v"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L), got.toString)
  }

  test("temporal katz == sequential walk enumeration on a seeded random temporal graph") {
    val rnd = new scala.util.Random(61)
    val edges = (0 until 60).map { _ =>
      (rnd.nextInt(10).toLong, rnd.nextInt(10).toLong, rnd.nextInt(8).toLong)
    }.filter(e => e._1 != e._2).distinct
    // brute force: enumerate all time-respecting walks of length <= 3
    // from seed 0 (walks, not paths: vertices may repeat)
    val out = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    def go(v: Long, tLast: Long, depth: Int): Unit =
      if (depth < 3) edges.foreach { case (a, b, t) =>
        if (a == v && t >= tLast) { out(b) += 1; go(b, t, depth + 1) }
      }
    go(0L, 0L, 0)
    val got = ops.Graph.temporalWalkCounts(
        edges.toDF("src", "dst", "t"), Seq(0L).toDF("v"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == out.toMap, s"$got vs ${out.toMap}")
  }

  test("double sweep finds the exact diameter of a path whose min id is interior") {
    // path 3–1–2–4–5: min id (1) is INTERIOR, so sweep 1's ecc (3,
    // to vertex 5) UNDERSTATES the diameter; sweep 2 from 5 walks the
    // whole path back (ecc 4 = exact diameter). This is the case the
    // second sweep exists for.
    val edges = Seq((3L, 1L), (1L, 2L), (2L, 4L), (4L, 5L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = ops.Graph.doubleSweep(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 1L, 5L, 3L, 5L),   // from 1: farthest 5 at dist 3, 5 reached
      (2L, 5L, 3L, 4L, 5L)),  // from 5: farthest 3 at dist 4 = diameter
      got.toSeq.toString)
  }

  test("double sweep: hop bound caps ecc honestly; tiebreak picks min vertex id") {
    // path 0..9 (diameter 9), hop bound 4: sweep 1 from 0 reaches
    // only 0..4 (ecc capped at 4, farthest = 4); sweep 2 from 4 sees
    // both 0 and 8 at dist 4 -> tiebreak picks the SMALLER id, 0.
    val edges = (0L until 9L).map(i => (i, i + 1))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = ops.Graph.doubleSweep(edges, hops = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 0L, 4L, 4L, 5L),
      (2L, 4L, 0L, 4L, 9L)),
      got.toSeq.toString)
  }

  test("greedy matching earns its 1/2-approximation bound on seeded random instances") {
    // sequential reference greedy + brute-force optimum over all
    // matchings of a small bipartite instance
    val rnd = new scala.util.Random(83)
    for (_ <- 1 to 3) {
      val edges = (for (a <- 0 until 6; b <- 0 until 6 if rnd.nextBoolean())
        yield (a.toLong, b.toLong, (1 + rnd.nextInt(1000)).toLong)).toSeq
      if (edges.nonEmpty) {
        // greedy in (w desc, s, c) order
        val us = scala.collection.mutable.Set.empty[Long]
        val uc = scala.collection.mutable.Set.empty[Long]
        var greedy = 0L
        edges.sortBy { case (a, b, w) => (-w, a, b) }.foreach { case (a, b, w) =>
          if (!us(a) && !uc(b)) { greedy += w; us += a; uc += b }
        }
        // brute force optimum (<= 36 edges: recursive search)
        def opt(rem: Seq[(Long, Long, Long)], sa: Set[Long], sb: Set[Long]): Long =
          rem match {
            case Seq() => 0L
            case e +: rest =>
              val skip = opt(rest, sa, sb)
              if (!sa(e._1) && !sb(e._2))
                math.max(skip, e._3 + opt(rest, sa + e._1, sb + e._2))
              else skip
          }
        val best = opt(edges, Set.empty, Set.empty)
        assert(2 * greedy >= best,
          s"greedy $greedy below half of optimum $best")
      }
    }
  }

  test("modularity: two disconnected triangles under the component split score exactly 1/2") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
    val edges = und.toDF("src", "dst")
      .unionAll(und.map(_.swap).toDF("src", "dst"))
    val lab = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("v", "label")
    val rows = ops.Graph.modularityOf(edges, lab).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // per triangle: din = 6 directed rows, dsum = 6, m2 = 12:
    // q_num = 6*12 - 36 = 36; permille = 36000 div 144 = 250 each,
    // total Q = 500 permille = the textbook 1/2
    assert(rows.toSeq == Seq((1L, 3L, 6L, 6L, 36L, 250L),
      (4L, 3L, 6L, 6L, 36L, 250L)), rows.toSeq.toString)
  }

  test("modularity: splitting a triangle scores negative, truncation matches div semantics") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val edges = und.toDF("src", "dst")
      .unionAll(und.map(_.swap).toDF("src", "dst"))
    val lab = Seq((1L, 1L), (2L, 2L), (3L, 2L)).toDF("v", "label")
    val rows = ops.Graph.modularityOf(edges, lab).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5)))
    // m2 = 6; c1: din 0, dsum 2 -> q_num -4; c2: din 2, dsum 4 ->
    // q_num 2*6-16 = -4; permille = -4000 div 36 = -111 (TRUNCATED,
    // the Spark-div == DuckDB-// contract on negatives)
    assert(rows.toSeq == Seq((1L, -4L, -111L), (2L, -4L, -111L)),
      rows.toSeq.toString)
  }

  test("luby MIS == sequential reference with the same md5 coins; independent and maximal") {
    import spark.implicits._
    def coinOf(r: Int, v: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$r:$v".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(12), 16)
    }
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val nV = 20 + rnd.nextInt(20)
      val und = (for (_ <- 0 until nV * 2) yield
        (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
        .filter { case (a, b) => a != b }.distinct
      val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
      val got = ops.Graph.lubyMis(edges.toDF("src", "dst"), 8)
        .select("v", "in_mis", "round_joined").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // sequential reference
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      var active = edges.map(_._1).distinct.toSet
      var mis = Map.empty[Long, Long]
      for (r <- 1 to 8) {
        val coins = active.map(v => v -> coinOf(r, v)).toMap
        val cand = active.filter(v =>
          (adj(v) & active).forall(nb => coins(v) < coins(nb)))
        mis ++= cand.map(_ -> r.toLong)
        active = active -- cand -- cand.flatMap(adj)
      }
      assert(active.isEmpty, s"seed $seed: reference did not converge")
      val want = edges.map(_._1).distinct.map(v =>
        (v, if (mis.contains(v)) 1L else 0L, mis.getOrElse(v, 0L))).toSet
      assert(got == want, s"seed $seed: ${got.diff(want)} / ${want.diff(got)}")
      // independence + maximality
      val m = mis.keySet
      assert(und.forall { case (a, b) => !(m(a) && m(b)) }, s"seed $seed")
      assert(edges.map(_._1).distinct.forall(v => m(v) || (adj(v) & m).nonEmpty),
        s"seed $seed: not maximal")
    }
  }

  test("b-matching trace: capacities hold, picks descend, and the matching is maximal") {
    val out = ops.Graph.bMatching.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    // capacity: supplier <= 2 picks, customer <= 1
    val bySup = out.groupBy(_._2).view.mapValues(_.length)
    val byCus = out.groupBy(_._3).view.mapValues(_.length)
    assert(bySup.values.forall(_ <= 2), s"supplier over capacity: $bySup")
    assert(byCus.values.forall(_ <= 1), s"customer reassigned: $byCus")
    // greedy order: cents non-increasing with step
    val sorted = out.sortBy(_._1).map(_._4)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b },
      "greedy picks must descend in weight")
    // maximality over the SAME shortlist: every unpicked edge violates
    // a capacity (otherwise greedy would have taken it)
    val vol = Tables.load(spark, sf001, "lineitem")
      .join(Tables.load(spark, sf001, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_suppkey").as("s"), col("o_custkey").as("c"))
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("cents"))
      .orderBy(col("cents").desc, col("s").asc, col("c").asc).limit(30)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val picked = out.map(t => (t._2, t._3)).toSet
    val full = out.length == 12
    vol.filterNot(picked).foreach { case (sk, ck) =>
      assert(full || bySup.getOrElse(sk, 0) >= 2 || byCus.getOrElse(ck, 0) >= 1,
        s"edge ($sk,$ck) was addable but skipped — greedy not maximal")
    }
  }

  test("assortativity closed forms: star = -1000 milli, regular ring = NULL") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("u", "v")
    val rs = ops.Graph.assortativity(star).head()
    assert(rs.getLong(3) == -1000L, s"star must be perfectly disassortative: $rs")
    val ring = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("u", "v")
    val rr = ops.Graph.assortativity(ring).head()
    assert(rr.isNullAt(3), s"degree-regular graph has zero variance: $rr")
    assert(rr.getLong(2) == 0L, "denominator must be exactly zero")
  }

  test("assortativity == integer reference formula on seeded random graphs") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val nV = 8 + rnd.nextInt(10)
      val und = (0 until nV * 2).map(_ =>
        (rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
        .filter { case (a, b) => a < b }.distinct
      if (und.nonEmpty) {
        val sym = und ++ und.map(_.swap)
        val deg = sym.groupBy(_._1).view.mapValues(_.length.toLong).toMap
        val m = sym.length.toLong
        val s1 = sym.map { case (a, b) => deg(a) * deg(b) }.sum
        val s2 = sym.map { case (a, _) => deg(a) }.sum
        val s3 = sym.map { case (a, _) => deg(a) * deg(a) }.sum
        val (num, den) = (m * s1 - s2 * s2, m * s3 - s2 * s2)
        val row = ops.Graph.assortativity(und.toDF("u", "v")).head()
        assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((m, num, den)),
          s"seed $seed moments")
        if (den != 0L) {
          val want = if (num >= 0) 1000 * num / den else -(1000 * -num / den)
          assert(row.getLong(3) == want, s"seed $seed milli")
        }
      }
    }
  }

  test("checkedBasket is the identity under the cap — values AND hashes untouched") {
    val rnd = new scala.util.Random(99)
    val op = (1 to 400).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(300).toLong)).distinct
      .toDF("o", "p")
    val got = ops.Graph.checkedBasket(op).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = op.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want, "guard must not perturb a single row")
  }

  test("checkedBasket aborts on a mega-basket instead of expanding it") {
    // one order with BasketCap+1 distinct items: the quadratic
    // self-join would emit C(65,2) = 2080 pairs from ONE key — at a
    // corpus mega-basket that's the executor-OOM shape the guard
    // exists for, so the plan must throw before the join ever runs
    val mega = (0 to ops.Graph.BasketCap).map(i => (7L, 100L + i))
      .toDF("o", "p")
    val ex = intercept[Throwable] {
      ops.Graph.checkedBasket(mega).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(ex).contains("basket over cap"),
      s"expected the basket invariant, got: ${msgs(ex).take(200)}")
  }

  test("local clustering coefficient closed forms: K4, star, triangle+pendant") {
    def cc(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
      ops.Graph.localClustering(edges.toDF("u", "v")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // K4: every vertex in 3 triangles, d = 3 -> cc = 1000 exactly
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    assert(cc(k4).values.forall(_ == ((3L, 3L, 1000L))), s"K4: ${cc(k4)}")
    // star: hub degree 3, no triangles -> cc = 0 (leaves d = 1 dropped)
    val star = cc(Seq((0L, 1L), (0L, 2L), (0L, 3L)))
    assert(star == Map(0L -> ((3L, 0L, 0L))), s"star: $star")
    // triangle 0-1-2 plus pendant 3 on vertex 0: vertex 0 has d = 3,
    // 1 triangle -> cc = 2000/(3*2) = 333; vertices 1,2 -> 1000
    val tp = cc(Seq((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L)))
    assert(tp(0L) == ((3L, 1L, 333L)) && tp(1L) == ((2L, 1L, 1000L)) &&
      tp(2L) == ((2L, 1L, 1000L)), s"triangle+pendant: $tp")
  }

  test("component census + hub attack: planted hub-and-spokes shatters correctly") {
    // two stars (hubs 0 and 100) bridged by an edge: one component of
    // 10 vertices; removing hub 0's edges leaves hub 100's star of 5
    // and four isolated-but-edgeless spokes (which drop out of the
    // edge-derived vertex set entirely)
    val und = (
      (1L to 4L).map(i => (0L, i)) ++ Seq((0L, 100L)) ++
      (101L to 104L).map(i => (100L, i))
    ).toDF("u", "v")
    val full = ops.Graph.componentCensus(und).head()
    assert((full.getLong(0), full.getLong(1), full.getLong(2), full.getLong(3)) ==
      ((10L, 9L, 10L, 1L)), s"full census: $full")
    val attacked = und.filter(col("u") =!= 0L && col("v") =!= 0L)
    val a = ops.Graph.componentCensus(attacked).head()
    assert((a.getLong(0), a.getLong(1), a.getLong(2), a.getLong(3)) ==
      ((5L, 4L, 5L, 1L)), s"attacked census: $a")
  }
}
