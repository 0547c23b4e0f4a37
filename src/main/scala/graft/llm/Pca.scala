package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** PCA over the embedding corpus — the dimensionality-reduction /
  * whitening front-end of embedding pipelines (decorrelate before
  * product quantization, OPQ-style rotations, drift dashboards).
  *
  * The classic big-data PCA decomposition: moments are distributed,
  * the eigenproblem is not. ONE [[graft.functions.GramAgg]] pass over
  * AUGMENTED vectors [1, x] yields exact integer count, coordinate
  * sums, and the full Gram triangle simultaneously (the 1-column's
  * cross products ARE the sums) — so mean and covariance come from a
  * single scan with zero joins and a fixed-size shuffle. The dense
  * d×d eigensolve (cyclic Jacobi, fixed sweep order, pure function of
  * the exact integer moments) runs on the driver where a 64×64
  * problem belongs; the top-p eigenvectors broadcast back as
  * literals into one codegen'd projection scan
  * ([[graft.functions.DotProduct]]). A 100 TB corpus pays: one
  * Gram scan + one projection scan.
  *
  * Determinism: the Gram/second-moment stage is exact BIGINT
  * micro-unit arithmetic (engine-identical); Jacobi is a fixed
  * instruction sequence on those integers, so eigenpairs are
  * bit-identical run to run; each eigenvector's sign is fixed by
  * "largest-magnitude coordinate positive" (ties to the lowest
  * index); projections are per-row ordered folds rounded to micro
  * units. Rows-only per contract (an eigensolve is not one DuckDB
  * query) — so the query SELF-CHECKS: eigenvalues must be
  * non-increasing, eigenvectors orthonormal to 1e-9, and each
  * projected component's population variance must match its
  * eigenvalue within 2% (one aggregate action over exact integer
  * sums) — a wrong rotation, a dropped centering, or a scrambled
  * eigen-order all trip the in-query floor, not just a spec. */
object Pca {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix.
    * Returns (eigenvalues, eigenvectors as rows). Fixed sweep order
    * and count — a pure, deterministic function of the input. */
  private[graft] def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            off = math.max(off, math.abs(apq))
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val tSign = if (theta >= 0) 1.0 else -1.0
            val tt = tSign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tt * tt + 1.0)
            val s = tt * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), Array.tabulate(d, d)((i, j) => v(j)(i)))
  }

  /** Exact integer moments → covariance (natural units) + row count.
    * One GramAgg pass over [1e6, q₁…q_d] micro-vectors. */
  private[graft] def covariance(emb: DataFrame, d: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val quant = transform(col("embedding").cast("array<double>"),
      x => round(x * 1000000.0, 0).cast("long"))
    val aug = concat(array(lit(1000000L)), quant)
    val cells = emb
      .select(aug.as("q"))
      .agg(graft.functions.GramAgg(col("q"), d + 1).as("g"))
      .select(explode(col("g")).as("c"))
      .select(col("c.i"), col("c.j"), col("c.n"), col("c.s"))
      .collect() // (d+1)(d+2)/2 rows — bounded by dimension, not corpus
    val s = Array.ofDim[Double](d + 1, d + 1)
    var n = 0L
    cells.foreach { r =>
      val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
      s(i)(j) = r.getLong(3).toDouble; s(j)(i) = s(i)(j)
      n = r.getLong(2)
    }
    val mu = Array.tabulate(d)(j => s(0)(j + 1) / 1e6 / n) // micro units
    val cov = Array.tabulate(d, d) { (i, j) =>
      (s(i + 1)(j + 1) / n - mu(i) * mu(j)) / 1e12
    }
    (n, mu.map(_ / 1e6), cov)
  }

  /** Top-p principal components of every embedding, micro-rounded. */
  val pcaProject: Q = Q(
    "q_pca_project",
    (s, dir) => {
      val d = 64; val p = 4
      val emb = t(s, dir, "embeddings")
      val (n, mu, cov) = covariance(emb, d)
      val (eig, vecs) = jacobiEigen(cov)
      val order = (0 until d).sortBy(i => (-eig(i), i)).take(p)
      val top = order.map { i =>
        val v = vecs(i)
        // deterministic sign: largest-|coordinate| positive
        val m = v.indices.maxBy(j => (math.abs(v(j)), -j))
        (eig(i), if (v(m) < 0) v.map(-_) else v)
      }
      // self-check 1: orthonormal, ordered spectrum
      for (a <- top.indices; b <- a until top.length) {
        val dot = (0 until d).map(j => top(a)._2(j) * top(b)._2(j)).sum
        val want = if (a == b) 1.0 else 0.0
        if (math.abs(dot - want) > 1e-9)
          throw new IllegalStateException(
            s"PCA degraded: eigenvectors not orthonormal (v$a . v$b = $dot)")
      }
      if (top.sliding(2).exists(w => w.length == 2 && w(0)._1 < w(1)._1))
        throw new IllegalStateException("PCA degraded: spectrum not sorted")
      val vd = col("embedding").cast("array<double>")
      val out = top.zipWithIndex.foldLeft(emb.select(col("vec_id"), vd.as("v"))) {
        case (df, ((_, vec), k)) =>
          val shift = (0 until d).map(j => mu(j) * vec(j)).sum
          df.withColumn(s"pc${k + 1}",
            round((graft.functions.DotProduct(col("v"), typedLit(vec.toSeq)) - lit(shift))
              * 1000000.0, 0).cast("long"))
      }.drop("v").orderBy("vec_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // self-check 2: projected variance tracks the eigenvalue (2%)
      val aggCols = (1 to p).flatMap(k => Seq(
        sum(col(s"pc$k")).as(s"s$k"),
        sum(col(s"pc$k") * col(s"pc$k")).as(s"ss$k")))
      val sums = out.agg(aggCols.head, aggCols.tail: _*).head()
      for (k <- 1 to p) {
        val sm = sums.getLong(2 * (k - 1)); val ss = sums.getLong(2 * k - 1)
        val varMicro2 = (ss.toDouble - sm.toDouble * sm / n) / n
        val lamMicro2 = top(k - 1)._1 * 1e12
        if (lamMicro2 > 1e6 && math.abs(varMicro2 - lamMicro2) > 0.02 * lamMicro2)
          throw new IllegalStateException(
            s"PCA degraded: pc$k variance $varMicro2 != eigenvalue $lamMicro2")
      }
      out
    },
    None)

  val all: Seq[Q] = Seq(pcaProject)
}
