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

  /** Brute-force cosine top-k: broadcast the (tiny) query set against
    * the full corpus — the fact side streams through map-side, one
    * shuffle of 8×N (query_id, sim) pairs into the per-query top-k
    * window. At 100 TB the broadcast side is unchanged and the scan
    * side scales linearly; no cross-corpus shuffle ever happens. */
  val cosineTopK: Q = Q(
    "q_cosine_topk",
    (s, dir) => {
      val (q, base) = queriesAndBase(s, dir)
      val w = Window.partitionBy("query_id")
        .orderBy(col("sim").desc, col("vec_id").asc)
      base.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("sim", cosine(col("v"), col("qv")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
        .orderBy("query_id", "rank")
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
  def annTopK(q: DataFrame, base: DataFrame, k: Int = 5): DataFrame = {
    val qb = bucketed(q, "query_id", "qv").drop("qv")
    val bb = bucketed(base, "vec_id", "v").drop("v")
    val cand = bb.join(broadcast(qb), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id").distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id").asc)
    cand
      .join(base, Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("sim", cosine(col("v"), col("qv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** Approximate → rows-only check (no oracle); behavior pinned in
    * ScalaTest on planted structure. */
  val annLsh: Q = Q(
    "q_ann_lsh",
    (s, dir) => {
      val (q, base) = queriesAndBase(s, dir)
      annTopK(q, base)
    },
    None)

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

  /** Corpus embeddings are near-uniform random, so at sim≥0.95 this
    * is expected (and correct) to be empty on the harness data; the
    * ScalaTest suite pins retrieval on planted near-identical
    * vectors. Rows-only per contract. */
  val embedDedup: Q = Q(
    "q_dedup_embedding",
    (s, dir) => {
      val (_, base) = queriesAndBase(s, dir)
      cosineNearDupPairs(base, 0.95)
    },
    None)

  val all: Seq[Q] = Seq(cosineTopK, annLsh, embedDedup)
}
