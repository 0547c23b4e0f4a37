package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane-LSH bucketed variant as the 100 TB scale path.
  *
  * Vectors are cast float→double once up front; dot products and norms
  * use `zip_with`/`aggregate` — sequential left-to-right folds, so the
  * arithmetic is bit-deterministic and matches a sequential oracle
  * loop. Only integer ids/ranks are emitted for hash comparison
  * (SURVEY.md §7.5 float rule).
  */
object Similarity {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Sequential-fold dot product of two array<double> columns —
    * the composable higher-order-function form (interpreted); used
    * for dots against non-constant vectors outside the hot path. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via the native codegen'd Catalyst expression
    * ([[graft.functions.CosineSimilarity]]): one fused primitive loop
    * per pair instead of three interpreted array folds. Identical
    * arithmetic (sequential dot and norms, dot/(√na·√nb)). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  private def queriesAndBase(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val emb = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    // round-robin repartition: the harness parquet is a single row
    // group (one scan task); the dot-product stage should use every core
    val par = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    (q, emb.repartition(par))
  }

  /** Exact brute-force cosine top-k over arbitrary (query_id, qv) /
    * (vec_id, v) frames: broadcast the (tiny) query set against the
    * full corpus — the fact side streams through map-side, one
    * shuffle of |q|×N (query_id, sim) pairs into the per-query top-k
    * window. At 100 TB the broadcast side is unchanged and the scan
    * side scales linearly; no cross-corpus shuffle ever happens.
    * Doubles as the ground-truth oracle for the ANN recall audits. */
  def exactTopK(q: DataFrame, base: DataFrame, k: Int = 5): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    base.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("v"), col("qv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  val cosineTopK: Q = Q(
    "q_cosine_topk",
    (s, dir) => {
      val (q, base) = queriesAndBase(s, dir)
      exactTopK(q, base)
    },
    Some("""
      SELECT query_id, rank, neighbor_id FROM (
        SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
               CAST(row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                                                 CAST(q.embedding AS DOUBLE[])) DESC,
                          b.vec_id ASC) AS BIGINT) AS rank
        FROM embeddings b, embeddings q
        WHERE q.vec_id < 8 AND b.vec_id <> q.vec_id
      ) WHERE rank <= 5
      ORDER BY query_id, rank"""))

  /** Deterministic random hyperplanes: 4 tables × 8 planes × 64 dims
    * seeded from a fixed RNG — the plane matrix is a literal broadcast
    * into the plan, regenerated identically every run. */
  private lazy val planes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(32)(Seq.fill(64)(rnd.nextGaussian()))
  }

  val LshTables = 4
  val LshBits = 8

  /** Dot against a constant plane via the native codegen'd loop
    * ([[graft.functions.DotProduct]]); the plane ships as an array
    * literal. (Literal Σ element_at expansion was tried and reverted:
    * it blows past the JVM HugeMethodLimit and runs un-JIT-compiled —
    * see DotProduct scaladoc.) */
  private def dotLit(v: Column, w: Seq[Double]): Column =
    graft.functions.DotProduct(v, typedLit(w))

  /** 8-bit hyperplane-sign bucket for a vector column in LSH table l. */
  def lshBucket(v: Column, table: Int): Column =
    (0 until LshBits).map { p =>
      when(dotLit(v, planes(table * LshBits + p)) > 0, shiftleft(lit(1), p))
        .otherwise(lit(0))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** (table, bucket) membership pairs — L independent 256-bucket hash
    * tables; a candidate needs to collide in ANY table (standard
    * multi-table LSH recall boost). */
  private def bucketed(df: DataFrame, idCol: String, vCol: String): DataFrame =
    df.select(
      col(idCol), col(vCol),
      explode(array((0 until LshTables).map(l =>
        struct(lit(l).as("tbl"), lshBucket(col(vCol), l).as("bucket"))): _*)).as("e"))
      .select(col(idCol), col(vCol), col("e.tbl"), col("e.bucket"))

  /** Multi-probe bucketing for the QUERY side: each table probes the
    * query's own bucket plus every 1-, 2-, and 3-bit flip neighbor
    * (1+8+28+56 = 93 probes/table). A true neighbor whose signs
    * differ from the query's on at most three planes — the dominant
    * miss modes at moderate angles — is then still retrieved: at the
    * corpus's observed geometry (p≈0.6 per-plane agreement) per-table
    * retrieval mass over ≤3 flips covers the bulk of the sign-error
    * binomial, and the four tables multiply it. The fan-out lands
    * entirely on the broadcast-side frame of ≤ a few rows — probe
    * work scales with QUERY count, corpus work with N, which is the
    * right asymmetry at 100 TB (more probes beats more tables: extra
    * tables double the index build and its shuffle; extra probes are
    * free XOR masks over an already-computed bucket). The corpus side
    * still materializes ONE bucket per table, so candidate generation
    * stays linear in N. */
  private def bucketedProbed(df: DataFrame, idCol: String, vCol: String): DataFrame = {
    // single source of truth with the q_ann_lsh oracle: both sides
    // read [[probeMasks]], so the probe set can never silently drift
    // between engine and oracle
    val masks: Seq[Int] = probeMasks
    val tabled = df.select(
      col(idCol), col(vCol),
      explode(array((0 until LshTables).map(l =>
        struct(lit(l).as("tbl"), lshBucket(col(vCol), l).as("b0"))): _*)).as("e"))
      .select(col(idCol), col(vCol), col("e.tbl"), col("e.b0"))
    tabled.select(
      col(idCol), col(vCol), col("tbl"),
      explode(array(masks.map(m => col("b0").bitwiseXOR(lit(m))): _*)).as("bucket"))
  }

  /** LSH-bucketed approximate NN core over arbitrary query/base
    * frames — the scale path: both sides hash into 4×256 sign
    * buckets; candidates are only pairs sharing a bucket in some
    * table, so per-query work drops from N to ~L·N/2⁸.
    *
    * Recall depends on data geometry: sign-LSH retrieves neighbors
    * whose cosine is meaningfully above the bulk (the use case —
    * near-dup embeddings, cluster structure). On near-uniform random
    * vectors (median top-5 cosine ≈0.32 in this corpus) every ANN
    * index degrades toward brute force; use [[cosineTopK]] there.
    * ScalaTest pins ~full recall on planted high-sim neighbors. */
  /** Execution shape (one pass per side, no recovery joins): each
    * side computes (id, vector, tbl, bucket) ONCE and the vector rides
    * the broadcast-hash candidate join, so scoring needs no re-join of
    * `base`/`q` to refetch dropped vectors. The corpus side never
    * shuffles for the join (query buckets broadcast); duplicates from
    * multi-table collisions are scored (one fused cosine each — cheap)
    * and deduped afterwards on the three scalar columns, keeping
    * vectors out of the distinct shuffle.
    *
    * Skew guard: the bucket self-pairing is quadratic within a
    * bucket, so one skewed bucket (near-duplicate pile-ups at 100 TB)
    * would dominate the stage. A tiny (tbl, bucket, n) aggregate is
    * broadcast back and oversized buckets are thinned
    * deterministically by id-hash to ~`maxBucket` members — bounded
    * work per bucket at the cost of recall only inside pathological
    * buckets. The bucketed corpus frame is persisted (spill-safe) so
    * the size aggregate and the candidate join share ONE signature
    * computation — the "materialize the sketch, then index it" shape;
    * callers running multiple queries in a session should
    * `clearCache()` between them (Bench/Verify do). */
  def annTopK(q: DataFrame, base: DataFrame, k: Int = 5, maxBucket: Int = 4096,
      handles: graft.CacheHandles = new graft.CacheHandles): DataFrame = {
    val qb = bucketedProbed(q, "query_id", "qv")
    val bbAll = handles.track(bucketed(base, "vec_id", "v")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val sizes = bbAll.groupBy("tbl", "bucket").agg(count(lit(1)).as("bucket_n"))
    val keepEvery = greatest(lit(1L),
      ceil(col("bucket_n").cast("double") / maxBucket).cast("long"))
    val bb = bbAll.join(broadcast(sizes), Seq("tbl", "bucket"))
      .filter(pmod(xxhash64(col("vec_id"), col("tbl")), keepEvery) === 0)
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    bb.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("v"), col("qv")))
      .select("query_id", "vec_id", "sim")
      .distinct()
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** One LSH sign-bucket as oracle SQL: Σ_p 2^p·[v·plane_{t·8+p} > 0]
    * with each plane embedded as a DOUBLE[] literal (the planes are a
    * compile-time constant of the seeded RNG — a fixed model
    * parameter, so baking them into the oracle is no different from
    * any pinned constant). `Double.toString` emits the shortest
    * round-tripping decimal, so DuckDB parses back the exact same
    * binary double; `list_inner_product` folds sequentially like the
    * native [[graft.functions.DotProduct]] loop (the list-kernel
    * order match is already proven by q_cosine_topk's hash), so the
    * sign tests — and therefore the buckets — agree bit-exactly.
    * Disjoint powers of two make + equal to bitwise OR. */
  private def lshBucketSql(vcol: String, table: Int): String =
    (0 until LshBits).map { p =>
      val lit = planes(table * LshBits + p).map(_.toString)
        .mkString("[", ", ", "]")
      s"(CASE WHEN list_inner_product($vcol, $lit) > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** The multi-probe mask set — the identity probe plus every 1-,
    * 2-, and 3-bit flip — shared by [[bucketedProbed]] (the engine)
    * and the q_ann_lsh oracle (the replay), so the two can never
    * drift apart. */
  private def probeMasks: Seq[Int] =
    0 +: (0 until LshBits).map(1 << _) ++: ((for {
      i <- 0 until LshBits; j <- i + 1 until LshBits
    } yield (1 << i) | (1 << j)) ++ (for {
      i <- 0 until LshBits; j <- i + 1 until LshBits; l <- j + 1 until LshBits
    } yield (1 << i) | (1 << j) | (1 << l)))

  /** Recall audit as the driver-visible signal: plant one exact copy
    * of every query vector into the corpus (ids 1M+), run the LSH
    * index AND the exact brute-force baseline over the same corpus,
    * and emit only the ANN results confirmed by the exact top-k. The
    * row count IS the measurement — hits out of 8 queries × k=5 slots
    * (planted copies guarantee ≥8 retrievable true neighbors; a recall
    * regression shrinks the result).
    *
    * HASH-ORACLED (promoted r17, the first of the ANN family): the
    * index is sign-LSH over a FIXED plane matrix, so the oracle
    * replays it literally — [[lshBucketSql]] buckets per table with
    * the planes as DOUBLE[] literals, the query side expanded by the
    * same 93 [[probeMasks]] via xor(), the candidate join, exact
    * cosine scoring, per-query top-5, and the brute-force confirm —
    * every step deterministic SQL. The ONE piece SQL cannot express
    * is the skew-thinning filter (`pmod(xxhash64(vec_id, tbl),
    * keepEvery)`), which is a NO-OP until some (tbl, bucket) exceeds
    * maxBucket = 4096 members; the oracle guards that assumption with
    * a poison-row sentinel (the kcore-convergence device) — if any
    * bucket is oversized the oracle self-diagnoses instead of
    * silently hashing a thinning-free answer. Floors stay asserted
    * INSIDE the query via [[RecallAudit.annAudit]] (8/8 planted
    * copies always, plus total ≥38 — observed 40 at sf0.01, 39 at
    * sf0.1), so the driver's `err` field — not just ScalaTest —
    * catches silent degradation. */
  val annLsh: Q = Q(
    "q_ann_lsh",
    (s, dir) => {
      val handles = new graft.CacheHandles
      // annAudit materializes the confirmed result before returning,
      // so the bucketed-signature cache inside annTopK is releasable
      // the moment it hands the frame back
      val out = RecallAudit.annAudit(s, dir,
        floor = RecallAudit.LshFloor, what = "LSH") {
        (q, corpus) => annTopK(q, corpus, handles = handles)
      }
      handles.releaseAll()
      out
    },
    Some(s"""
      WITH qs AS MATERIALIZED (
        SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE vec_id < 8),
      corpus AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        UNION ALL
        SELECT vec_id + 1000000 AS vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id < 8),
      cb AS MATERIALIZED (""" +
      (0 until LshTables).map(t =>
        s"""
        SELECT vec_id, v, $t AS tbl, ${lshBucketSql("v", t)} AS bucket
        FROM corpus""").mkString(" UNION ALL ") + s"""),
      qb0 AS MATERIALIZED (""" +
      (0 until LshTables).map(t =>
        s"""
        SELECT query_id, qv, $t AS tbl, ${lshBucketSql("qv", t)} AS bucket
        FROM qs""").mkString(" UNION ALL ") + s"""),
      qb AS MATERIALIZED (
        SELECT query_id, qv, tbl, xor(bucket, m.mask) AS bucket
        FROM qb0, (VALUES ${probeMasks.map(m => s"($m)").mkString(", ")})
          m(mask)),
      oversized AS (
        SELECT count(*) AS n FROM (
          SELECT tbl, bucket FROM cb GROUP BY tbl, bucket
          HAVING count(*) > 4096)),
      cand AS (
        SELECT DISTINCT c.vec_id, q.query_id,
               list_cosine_similarity(c.v, q.qv) AS sim
        FROM cb c JOIN qb q ON c.tbl = q.tbl AND c.bucket = q.bucket
        WHERE c.vec_id <> q.query_id),
      ann AS (
        SELECT query_id, rank, neighbor_id FROM (
          SELECT query_id, vec_id AS neighbor_id,
                 CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY sim DESC, vec_id ASC) AS BIGINT) AS rank
          FROM cand)
        WHERE rank <= 5),
      exact AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.query_id, c.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY list_cosine_similarity(c.v, q.qv) DESC,
                            c.vec_id ASC) AS r
          FROM corpus c, qs q WHERE c.vec_id <> q.query_id)
        WHERE r <= 5)
      SELECT * FROM (
        SELECT a.query_id, a.rank, a.neighbor_id
        FROM ann a
        WHERE EXISTS (SELECT 1 FROM exact e
                      WHERE e.query_id = a.query_id
                        AND e.neighbor_id = a.neighbor_id)
        UNION ALL
        -- thinning sentinel: the Spark side thins buckets past 4096
        -- members with an xxhash64 coin SQL cannot replay; this
        -- oracle models the thinning-free plan, so an oversized
        -- bucket must fail self-diagnosably, not hash wrong
        SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), CAST(-1 AS BIGINT)
        WHERE (SELECT n FROM oversized) > 0)
      ORDER BY query_id, rank"""))

  /** Embedding-cosine near-duplicate pairs over any (vec_id, v
    * array<double>) frame: 2 LSH tables × 16-bit sign buckets (long
    * codes: near-identical vectors agree on most signs, so 16 bits at
    * 2 tables retrieves sim≳0.99 pairs with high probability while
    * cutting the candidate set by ~2¹⁶/2), then exact cosine
    * verification ≥ minSim. The all-pairs analog of [[annTopK]] —
    * the dedup-by-embedding stage of a training-data pipeline.
    * Shuffle carries only (tbl, bucket, vec_id). */
  def cosineNearDupPairs(emb: DataFrame, minSim: Double): DataFrame = {
    val bits = 16
    def bucket16(v: Column, table: Int): Column =
      (0 until bits).map { p =>
        when(dotLit(v, planes(table * bits + p)) > 0, shiftleft(lit(1), p))
          .otherwise(lit(0))
      }.reduce((a, b) => a.bitwiseOR(b))
    val par = emb.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val embP = emb.repartition(par)
    val banded = embP.select(
      col("vec_id"), col("v"),
      explode(array((0 until 2).map(l =>
        struct(lit(l).as("tbl"), bucket16(col("v"), l).as("bucket"))): _*)).as("e"))
      .select(col("vec_id"), col("e.tbl"), col("e.bucket"))
    val l = banded.alias("l")
    val r = banded.alias("r")
    val cand = l.join(r,
        col("l.tbl") === col("r.tbl") && col("l.bucket") === col("r.bucket") &&
          col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("vec_a"), col("r.vec_id").as("vec_b"))
      .distinct()
    val va = emb.select(col("vec_id").as("vec_a"), col("v").as("va"))
    val vb = emb.select(col("vec_id").as("vec_b"), col("v").as("vb"))
    cand.join(va, "vec_a").join(vb, "vec_b")
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= minSim)
      .select("vec_a", "vec_b", "sim")
      .orderBy("vec_a", "vec_b")
  }

  /** Corpus embeddings are near-uniform random, so at sim≥0.95 the
    * raw corpus yields no pairs — which made the driver's rows-only
    * check vacuous. Five exact duplicates of vec_id 0–4 are planted
    * (ids 1M+) so the expected output is exactly the five
    * (i, 1000000+i) pairs at sim 1.0: a deterministic retrieval check
    * the driver can see (0 rows now MEANS broken), enforced in-query
    * by [[RecallAudit.assertPlantedPairs]] — all 5 planted pairs must
    * be recovered or the query throws into the driver's `err` field.
    * False positives remain impossible (exact-cosine verification ≥
    * minSim). ScalaTest additionally pins jittered near-dup retrieval
    * and noise exclusion. Rows-only per contract. */
  val embedDedup: Q = Q(
    "q_dedup_embedding",
    (s, dir) => {
      val (_, base) = queriesAndBase(s, dir)
      val planted = base.filter(col("vec_id") < 5)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"), col("v"))
      RecallAudit.assertPlantedPairs(
        cosineNearDupPairs(base.unionByName(planted), 0.95),
        "vec_a", "vec_b", plantN = 5, what = "embedding near-dup")
    },
    None)

  /** Cluster-blocked near-duplicate pairs — the SemDeDup shape:
    * k-means-cluster the corpus with the IVF coarse quantizer, then
    * exact-cosine-verify only WITHIN clusters. The alternative
    * blocking strategy to [[cosineNearDupPairs]]'s sign-LSH: LSH
    * blocks by random hyperplanes (recall guaranteed
    * probabilistically, no training), clustering blocks by learned
    * structure (tighter candidate sets on clustered data, needs the
    * training pass). An exact duplicate always shares its source's
    * cluster (identical vector ⇒ identical argmin), so exact-copy
    * recall is structural, not probabilistic.
    *
    * Scale shape: one cluster-keyed shuffle per side; within-cluster
    * pairing is (N/k)² per cluster, so k grows with the corpus
    * (production SemDeDup runs k ≈ √N or larger); a skewed cluster
    * would concentrate quadratic work exactly like a hot LSH bucket,
    * so oversized clusters are thinned deterministically to
    * ~`maxCluster` members by id-hash — the same guard as
    * [[annTopK]]'s `maxBucket` (recall loss only inside clusters
    * beyond the cap; SimilaritySpec pins the bound on a pathological
    * all-identical corpus). */
  def clusterNearDupPairs(emb: DataFrame, centroids: Array[Array[Double]],
      minSim: Double, maxCluster: Int = 65536,
      handles: graft.CacheHandles = new graft.CacheHandles): DataFrame = {
    val assignedAll = handles.track(
      emb.withColumn("cluster", Ivf.clusterOf(col("v"), centroids))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // skew guard, same shape as annTopK's maxBucket: within-cluster
    // pairing is quadratic, so one pathological cluster (a pile of
    // boilerplate duplicates at 100 TB) would own the stage wall-clock;
    // oversized clusters are thinned deterministically by id-hash to
    // ~maxCluster members — bounded work at the cost of recall only
    // inside clusters that exceed the cap (the persisted assignment is
    // shared by the size aggregate and both join sides)
    val sizes = assignedAll.groupBy("cluster").agg(count(lit(1)).as("cluster_n"))
    val keepEvery = greatest(lit(1L),
      ceil(col("cluster_n").cast("double") / maxCluster).cast("long"))
    val assigned = assignedAll.join(broadcast(sizes), Seq("cluster"))
      .filter(pmod(xxhash64(col("vec_id"), col("cluster")), keepEvery) === 0)
    val l = assigned.select(col("cluster"), col("vec_id").as("vec_a"),
      col("v").as("va"))
    val r = assigned.select(col("cluster"), col("vec_id").as("vec_b"),
      col("v").as("vb"))
    l.join(r, Seq("cluster"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= minSim)
      .select("vec_a", "vec_b", "sim")
      .orderBy("vec_a", "vec_b")
  }

  /** Per-application locks so two queries racing the SAME pair-store
    * bootstrap cannot double-write one staging path. */
  private val pairStoreLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Staging-backed ε-pair store: the blocked quadratic join is the
    * dominant cost of every dbscan-family query, and three of them
    * (q_dbscan, q_cluster_stability, q_facility_select) run it on the
    * IDENTICAL (corpus, centroids) at thresholds ⊆ 0.90 — so the 0.90
    * pair list is computed ONCE per application and parquet-staged;
    * later queries read it back (a tighter threshold is a filter of
    * the store: the skew-thinning guard depends only on cluster
    * sizes, never on the sim threshold, so the filtered store is
    * row-identical to a direct tighter-threshold compute). The TAG
    * must uniquely determine (corpus, centroids, minSim) — same
    * keying contract as [[Ivf.trainCentroidsMemo]]; `corpus` and
    * `centroids` are by-name so the read path never builds them.
    * Doubles round-trip parquet bit-exactly, so store vs inline is
    * value-identical. Same staleness contract as [[graft.Staging]]:
    * one application = one corpus snapshot. */
  def pairStoreMemo(s: org.apache.spark.sql.SparkSession, tag: String,
      minSim: Double, corpus: => DataFrame,
      centroids: => Array[Array[Double]]): DataFrame = {
    // the path must be INJECTIVE in (tag, minSim): sanitization alone
    // can collide two raw tags ("a/b" vs "a_b"), and a caller passing
    // a different threshold under a colliding name would silently
    // read pairs computed at the other threshold — so the directory
    // name carries an md5 of the raw tag plus the exact threshold in
    // permille (thresholds here are 2-decimal constants)
    val simKey = math.round(minSim * 1000).toString
    val tagHash = java.security.MessageDigest.getInstance("MD5")
      .digest(tag.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    val path = graft.Staging.dir(s,
      "graft_pairs_" + tag.replaceAll("[^A-Za-z0-9]", "_") +
        s"_${tagHash}_s$simKey")
    val lock = pairStoreLocks.computeIfAbsent(path, _ => new Object)
    lock.synchronized {
      if (!graft.Staging.ready(s, path)) {
        val h = new graft.CacheHandles
        try clusterNearDupPairs(corpus, centroids, minSim, handles = h)
          .write.mode("overwrite").parquet(path)
        finally h.releaseAll()
      }
    }
    s.read.parquet(path)
  }

  /** Driver query for [[clusterNearDupPairs]]: same planted-copy
    * scheme as [[embedDedup]] (5 exact duplicates at ids 1M+), so the
    * expected result contains exactly the five (i, 1e6+i) pairs at
    * sim 1.0 — enforced in-query by
    * [[RecallAudit.assertPlantedPairs]]. Rows-only per contract
    * (trained centroids aren't SQL-expressible). */
  val semanticDedup: Q = Q(
    "q_dedup_semantic",
    (s, dir) => {
      val (_, base) = queriesAndBase(s, dir)
      val planted = base.filter(col("vec_id") < 5)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"), col("v"))
      val corpus = base.unionByName(planted)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val centroids = Ivf.trainCentroidsMemo(s"$dir#sem5", corpus)
      val handles = new graft.CacheHandles
      val out = RecallAudit.assertPlantedPairs(
        clusterNearDupPairs(corpus, centroids, 0.95, handles = handles),
        "vec_a", "vec_b", plantN = 5, what = "semantic (cluster-blocked) dedup")
      // the assert materialized the pair frame; both the corpus cache
      // and the cluster-assignment cache are now dead weight
      corpus.unpersist()
      handles.releaseAll()
      out
    },
    None)

  /** Per-dimension int8 affine quantization audit — the embedding
    * STORAGE compression primitive (PQ compresses for search;
    * int8-per-dim is what vector stores ship for 4× memory cut at
    * ~exact recall): code = round((x − min_d)/((max_d − min_d)/255)),
    * dequant = min_d + code·scale, plus reconstruction-error stats.
    *
    * Fully hash-oracled despite the float arithmetic: per-dim min/max
    * of float-derived doubles are exact; each element contributes ONE
    * rounded code (IEEE ops in identical order both engines, round
    * half-away on non-negative values — the repo-wide cents recipe)
    * and ONE nano-scaled error integer; everything aggregates as
    * BIGINT sums/maxes. Scale shape: one explode + two 64-group
    * aggregates; the bounds frame (64 rows) broadcasts back — the
    * corpus never shuffles twice. */
  val int8Quantize: Q = Q(
    "q_int8_quantize",
    (s, dir) => {
      val exploded = t(s, dir, "embeddings")
        .select(col("vec_id"),
          posexplode(col("embedding").cast("array<double>")))
        .select(col("pos").cast("long").as("dim"), col("col").as("x"))
      val bounds = exploded.groupBy("dim")
        .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      val scale = (col("mx") - col("mn")) / lit(255.0)
      val code = when(col("mx") === col("mn"), lit(0L))
        .otherwise(round((col("x") - col("mn")) / scale, 0).cast("long"))
      val coded = exploded.join(broadcast(bounds), Seq("dim"))
        .withColumn("code", code)
        .withColumn("err_nano",
          round(abs(col("mn") + col("code") * scale - col("x")) * lit(1e9), 0)
            .cast("long"))
      coded.groupBy("dim")
        .agg(min(col("mn")).as("mn"), max(col("mx")).as("mx"),
          count(lit(1)).as("n"),
          sum(col("code")).as("sum_code"),
          max(col("err_nano")).as("max_err_nano"),
          sum(col("err_nano")).as("sum_err_nano"))
        .orderBy("dim")
    },
    Some("""
      WITH ex AS (
        SELECT CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
               CAST(unnest(embedding) AS DOUBLE) AS x
        FROM embeddings),
      b AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM ex GROUP BY dim),
      coded AS (
        SELECT ex.dim, x, mn, mx,
               CASE WHEN mx = mn THEN 0
                    ELSE CAST(round((x - mn) / ((mx - mn) / 255.0)) AS BIGINT)
               END AS code
        FROM ex JOIN b ON ex.dim = b.dim)
      SELECT dim, min(mn) AS mn, max(mx) AS mx,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(code) AS BIGINT) AS sum_code,
             CAST(max(CAST(round(abs(mn + code * ((mx - mn) / 255.0) - x) * 1e9) AS BIGINT)) AS BIGINT) AS max_err_nano,
             CAST(sum(CAST(round(abs(mn + code * ((mx - mn) / 255.0) - x) * 1e9) AS BIGINT)) AS BIGINT) AS sum_err_nano
      FROM coded GROUP BY dim ORDER BY dim"""))

  /** Matryoshka truncation audit: how much of the exact top-k
    * survives when retrieval runs on a PREFIX of the embedding
    * dimensions (16 of 64 here) — the evaluation a pipeline runs
    * before adopting truncated (MRL-style) embeddings for the cheap
    * first-stage scan. Emits per-query overlap counts between the
    * full-dimension top-5 and the 16-dim-prefix top-5.
    *
    * Fully hash-oracled: both rankings are row_number windows over
    * the same deterministic cosine (ties broken by id), and the
    * overlap is an integer join-count — no floats in the output.
    * Scale shape: same broadcast-queries × streamed-corpus pass as
    * [[exactTopK]], twice (once per dimensionality), then a
    * queries×k-sized join — the corpus never shuffles. */
  val matryoshkaAudit: Q = Q(
    "q_matryoshka_audit",
    (s, dir) => {
      val (q, base) = queriesAndBase(s, dir)
      val corpus = base
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val full = exactTopK(q, corpus)
        .select(col("query_id"), col("neighbor_id"))
      val qTrunc = q.select(col("query_id"), slice(col("qv"), 1, 16).as("qv"))
      val bTrunc = corpus.select(col("vec_id"), slice(col("v"), 1, 16).as("v"))
      val trunc = exactTopK(qTrunc, bTrunc)
        .select(col("query_id"), col("neighbor_id"))
      val overlap = full.join(trunc, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("n_kept"))
      val out = full.groupBy("query_id").agg(count(lit(1)).as("k"))
        .join(overlap, Seq("query_id"), "left")
        .select(col("query_id"), col("k"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .orderBy("query_id")
      // materialize the 8-row result (one per query — assertFloor also
      // checks that invariant), then drop the corpus cache both
      // exactTopK passes shared rather than leaving it to clearCache
      val checked = RecallAudit.assertFloor(out, 8, "matryoshka audit")
      corpus.unpersist()
      checked
    },
    Some("""
      WITH fullk AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                                                   CAST(q.embedding AS DOUBLE[])) DESC,
                            b.vec_id ASC) AS rank
          FROM embeddings b, embeddings q
          WHERE q.vec_id < 8 AND b.vec_id <> q.vec_id
        ) WHERE rank <= 5),
      trunck AS (
        SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(CAST(b.embedding[1:16] AS DOUBLE[]),
                                                   CAST(q.embedding[1:16] AS DOUBLE[])) DESC,
                            b.vec_id ASC) AS rank
          FROM embeddings b, embeddings q
          WHERE q.vec_id < 8 AND b.vec_id <> q.vec_id
        ) WHERE rank <= 5)
      SELECT f.query_id,
             CAST(count(*) AS BIGINT) AS k,
             CAST(count(t.neighbor_id) AS BIGINT) AS n_kept
      FROM fullk f LEFT JOIN trunck t
        ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
      GROUP BY f.query_id ORDER BY f.query_id"""))

  /** Embedding QA stats — the sanity pass a pipeline runs before any
    * similarity work (catch zero/NaN/denormalized vectors at ingest).
    * Sequential-fold sums keep the doubles bit-identical to DuckDB's
    * list_sum/list_transform fold, so even the norms hash-match. */
  val vectorStats: Q = Q(
    "q_vector_stats",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      emb.select(
        col("vec_id"),
        size(col("v")).cast("long").as("dim"),
        norm(col("v")).as("l2_norm"),
        (aggregate(col("v"), lit(0.0), (a, x) => a + x) / size(col("v"))).as("mean"),
        array_min(col("v")).as("min_c"),
        array_max(col("v")).as("max_c"))
        .orderBy("vec_id")
    },
    Some("""
      SELECT vec_id,
             CAST(len(v) AS BIGINT) AS dim,
             sqrt(list_sum(list_transform(v, x -> x * x))) AS l2_norm,
             list_sum(v) / len(v) AS mean,
             list_min(v) AS min_c,
             list_max(v) AS max_c
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      ORDER BY vec_id"""))

  /** Distributed Gram matrix XᵀX over the embedding corpus — the
    * front-end of PCA / whitening / OPQ rotation training: 64×64
    * pairwise coordinate products summed over every vector. Exact by
    * quantization: each coordinate becomes round(x·1e6) micro-units
    * (one correctly-rounded double multiply + round, so the BIGINT is
    * engine-identical), and the Gram entries are then exact integer
    * sums — the hash pins all 2 080 upper-triangle cells.
    *
    * Scale shape: ZERO joins and ZERO exploded intermediates — the
    * whole outer product lives inside [[graft.functions.GramAgg]], a
    * typed imperative aggregate whose buffer is one flat
    * long[d(d+1)/2] triangle per task (the first cut exploded
    * d(d+1)/2 struct rows per vector before re-collapsing them:
    * correct and join-free, but the 10M-row intermediate at sf0.1
    * dominated wall-clock). Map-side combine through
    * ObjectHashAggregate means the shuffle carries ONE triangle per
    * task regardless of corpus size; the self-join formulation the
    * oracle SQL runs would shuffle the corpus twice instead. */
  val gramMatrix: Q = Q(
    "q_gram_matrix",
    (s, dir) => {
      val quant = transform(col("embedding").cast("array<double>"),
        x => round(x * 1000000.0, 0).cast("long"))
      t(s, dir, "embeddings")
        .select(quant.as("q"))
        .agg(graft.functions.GramAgg(col("q"), 64).as("g"))
        .select(explode(col("g")).as("c"))
        .select(col("c.i").as("i"), col("c.j").as("j"),
          col("c.n").as("n"), col("c.s").as("gram_micro2"))
        .orderBy("i", "j")
    },
    Some("""
      WITH q AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS i,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
        FROM embeddings)
      SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a.q * b.q) AS BIGINT) AS gram_micro2
      FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY a.i, b.i ORDER BY i, j"""))

  /** INCREMENTAL Gram matrix — the algebraic-merge incremental
    * ([[graft.llm.Dedup.incrementalExact]]'s pattern) applied to the
    * embedding family: G = Σ x·xᵀ is ADDITIVE, so the state is the
    * dim-bounded (i, j, n, s) cell frame of history (d(d+1)/2 rows —
    * 2 080 at d=64, independent of corpus size) and absorbing a delta
    * batch is one [[graft.functions.GramAgg]] pass over the delta
    * plus a cell-wise sum merge. The corpus is never rescanned; the
    * oracle is the FULL Gram recompute, so the driver hash re-proves
    * state+delta ≡ full every round. The merged Gram feeds the same
    * consumers as [[gramMatrix]] (PCA covariance, whitening) — this
    * is how a 100 TB pipeline keeps covariance current under daily
    * embedding arrivals. */
  val gramIncremental: Q = Q(
    "q_gram_incremental",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val cut = emb.agg(expr(
        "max(vec_id) - (max(vec_id) - min(vec_id) + 1) div 8").as("c"))
        .head().getLong(0)
      val quant = transform(col("embedding").cast("array<double>"),
        x => round(x * 1000000.0, 0).cast("long"))
      def gramOf(df: DataFrame): DataFrame =
        df.select(quant.as("q"))
          .agg(graft.functions.GramAgg(col("q"), 64).as("g"))
          .select(explode(col("g")).as("c"))
          .select(col("c.i").as("i"), col("c.j").as("j"),
            col("c.n").as("n"), col("c.s").as("s"))
      val stateDir = graft.Staging.dir(s,
        "graft_gram_state_" + dir.replaceAll("[^A-Za-z0-9]", "_"))
      if (!graft.Staging.ready(s, stateDir)) {
        gramOf(emb.filter(col("vec_id") <= cut))
          .write.mode("overwrite").parquet(stateDir)
      }
      s.read.parquet(stateDir)
        .unionByName(gramOf(emb.filter(col("vec_id") > cut)))
        .groupBy("i", "j")
        .agg(sum(col("n")).as("n"), sum(col("s")).as("gram_micro2"))
        .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
          col("n"), col("gram_micro2"))
        .orderBy("i", "j")
    },
    Some("""
      WITH q AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS i,
               CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
        FROM embeddings)
      SELECT CAST(a.i AS BIGINT) AS i, CAST(b.i AS BIGINT) AS j,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(a.q * b.q) AS BIGINT) AS gram_micro2
      FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY a.i, b.i ORDER BY i, j"""))

  /** MARGIN-BASED MUTUAL NEAREST NEIGHBORS — the bitext-mining pair
    * extractor (Artetxe–Schwenk): two corpora sides, and a pair
    * (a, b) is emitted only when b is a's nearest neighbor AND a is
    * b's, scored by the ratio margin 2·cos(a,b)/(avgₖ(a)+avgₖ(b))
    * that downweights hubs sitting near everything. Sides here are
    * the even/odd halves of the embedding table; the probe side is a
    * BOUNDED batch (even vec_id < 64) — exactly how production
    * mining runs (FAISS per probe microbatch, mutuality checked per
    * batch), so the pair frame is |batch|×N, linear in the corpus,
    * never all-pairs. At 100 TB the batch loop is the outer driver
    * and each batch broadcast-joins the corpus unchanged; the
    * IVF/LSH family covers the sublinear path.
    *
    * Determinism: each cosine rounds ONCE to integer micro
    * (the [[graft.llm.Retrieval.ndcgEval]] per-term discipline);
    * k-NN averages are truncated integer divisions of micro sums;
    * the margin is a sign-split BIGINT division so `div`/`//` agree
    * even on negative-cosine pairs. */
  val mutualNn: Q = Q(
    "q_mutual_nn",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val probes = emb.filter(col("vec_id") % 2 === 0 && col("vec_id") < 64)
        .select(col("vec_id").as("a"), col("v").as("va"))
      val corpus = emb.filter(col("vec_id") % 2 === 1)
        .select(col("vec_id").as("b"), col("v").as("vb"))
      val pairs = corpus.crossJoin(broadcast(probes))
        .withColumn("cos_micro",
          round(cosine(col("va"), col("vb")) * 1000000.0, 0).cast("long"))
        .select("a", "b", "cos_micro")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val wA = Window.partitionBy("a").orderBy(col("cos_micro").desc, col("b").asc)
      val wB = Window.partitionBy("b").orderBy(col("cos_micro").desc, col("a").asc)
      val kA = pairs.withColumn("r", row_number().over(wA)).filter(col("r") <= 4)
      val kB = pairs.withColumn("r", row_number().over(wB)).filter(col("r") <= 4)
      val nnA = kA.groupBy("a").agg(
        max(when(col("r") === 1, col("b"))).as("b"),
        sum(col("cos_micro")).as("sum_a4"))
      val nnB = kB.groupBy("b").agg(
        max(when(col("r") === 1, col("a"))).as("a"),
        sum(col("cos_micro")).as("sum_b4"))
      // 2·cos/((sumA+sumB)/4) = 8·cos/(sumA+sumB): the k-NN averages
      // never materialize, so no per-average floor crosses an engine
      nnA.join(nnB, Seq("a", "b"))
        .join(pairs, Seq("a", "b"))
        .selectExpr("a", "b", "cos_micro",
          """CASE WHEN sum_a4 + sum_b4 <= 0 THEN CAST(NULL AS BIGINT)
                  WHEN cos_micro >= 0
                  THEN (8000000 * cos_micro) div (sum_a4 + sum_b4)
                  ELSE -((8000000 * -cos_micro) div (sum_a4 + sum_b4))
             END AS margin_ppm""")
        .orderBy("a")
    },
    Some("""
      WITH pairs AS (
        SELECT a.vec_id AS a, b.vec_id AS b,
               CAST(round(1000000.0 *
                 list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])))
                 AS BIGINT) AS cos_micro
        FROM embeddings a, embeddings b
        WHERE a.vec_id % 2 = 0 AND a.vec_id < 64 AND b.vec_id % 2 = 1),
      ka AS (SELECT *, row_number() OVER (PARTITION BY a
               ORDER BY cos_micro DESC, b ASC) AS r FROM pairs),
      kb AS (SELECT *, row_number() OVER (PARTITION BY b
               ORDER BY cos_micro DESC, a ASC) AS r FROM pairs),
      nna AS (SELECT a, max(CASE WHEN r = 1 THEN b END) AS b,
                     CAST(sum(cos_micro) AS BIGINT) AS sum_a4
              FROM ka WHERE r <= 4 GROUP BY a),
      nnb AS (SELECT b, max(CASE WHEN r = 1 THEN a END) AS a,
                     CAST(sum(cos_micro) AS BIGINT) AS sum_b4
              FROM kb WHERE r <= 4 GROUP BY b)
      SELECT nna.a, nna.b, p.cos_micro,
             CAST(CASE WHEN sum_a4 + sum_b4 <= 0 THEN NULL
               WHEN p.cos_micro >= 0
               THEN (8000000 * p.cos_micro) // (sum_a4 + sum_b4)
               ELSE -((8000000 * -p.cos_micro) // (sum_a4 + sum_b4))
             END AS BIGINT) AS margin_ppm
      FROM nna JOIN nnb ON nna.a = nnb.a AND nna.b = nnb.b
      JOIN pairs p ON p.a = nna.a AND p.b = nna.b
      ORDER BY nna.a"""))

  val all: Seq[Q] = Seq(cosineTopK, annLsh, embedDedup, semanticDedup,
    vectorStats, gramMatrix, gramIncremental, int8Quantize, matryoshkaAudit,
    mutualNn)
}
