package graft

import graft.llm.Pca

/** The driver-side Jacobi eigensolve and the distributed moment pass
  * must together reproduce textbook PCA: exact reconstruction,
  * orthonormal basis, variance-ordered spectrum, deterministic
  * output. (The declared query additionally self-checks projected
  * variance against the spectrum in-query.) */
class PcaSpec extends SparkSpec {

  private def matmul(a: Array[Array[Double]], b: Array[Array[Double]]) = {
    val (n, m, p) = (a.length, b.length, b(0).length)
    Array.tabulate(n, p)((i, j) =>
      (0 until m).map(k => a(i)(k) * b(k)(j)).sum)
  }

  test("jacobi reconstructs a known symmetric matrix: A = V' diag(w) V") {
    val a = Array(
      Array(4.0, 1.0, 0.5, 0.0),
      Array(1.0, 3.0, 0.25, 0.1),
      Array(0.5, 0.25, 2.0, 0.3),
      Array(0.0, 0.1, 0.3, 1.0))
    val (w, v) = Pca.jacobiEigen(a)
    // rows of v are eigenvectors: A ≈ Σ w_i v_i v_iᵀ
    val rec = Array.ofDim[Double](4, 4)
    for (i <- 0 until 4; r <- 0 until 4; c <- 0 until 4)
      rec(r)(c) += w(i) * v(i)(r) * v(i)(c)
    for (r <- 0 until 4; c <- 0 until 4)
      assert(math.abs(rec(r)(c) - a(r)(c)) < 1e-10, s"($r,$c)")
    // orthonormal
    for (i <- 0 until 4; j <- 0 until 4) {
      val dot = (0 until 4).map(k => v(i)(k) * v(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-10)
    }
  }

  test("covariance moments equal a direct driver-side computation") {
    val emb = Tables.load(spark, sf001, "embeddings")
    val (n, mu, cov) = Pca.covariance(emb, 64)
    val rows = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.round(x.toDouble * 1e6) / 1e6).toArray)
    assert(n == rows.length)
    val muRef = Array.tabulate(64)(j => rows.map(_(j)).sum / n)
    for (j <- 0 until 64)
      assert(math.abs(mu(j) - muRef(j)) < 1e-9, s"mu($j)")
    for (i <- 0 until 64 by 13; j <- i until 64 by 13) {
      val cRef = rows.map(r => (r(i) - muRef(i)) * (r(j) - muRef(j))).sum / n
      // micro-quantized integer moments vs double fold: agreement is
      // bounded by the quantization, not float summation order
      assert(math.abs(cov(i)(j) - cRef) < 1e-6, s"cov($i,$j)")
    }
  }

  test("declared query is deterministic and variance-ordered") {
    val a = Pca.pcaProject.fn(spark, sf001).collect()
    val b = Pca.pcaProject.fn(spark, sf001).collect()
    assert(a.toSeq == b.toSeq)
    val n = a.length.toDouble
    val vars = (1 to 4).map { k =>
      val xs = a.map(_.getLong(k).toDouble)
      val m = xs.sum / n
      xs.map(x => (x - m) * (x - m)).sum / n
    }
    assert(vars == vars.sorted.reverse, s"unordered: $vars")
  }

  test("JL projection: sign convention reproducible, norm ratios inside the k=16 envelope") {
    import org.apache.spark.sql.functions._
    val out = llm.Pca.jlProject.fn(spark, sf001).collect()
    assert(out.nonEmpty)
    // reproduce p_0 for the first vector with an independent spelling
    // of the md5-parity sign matrix — pins the (i,j) orientation
    val first = out.head
    val vecId = first.getLong(0)
    val emb = Tables.load(spark, sf001, "embeddings")
      .filter(col("vec_id") === vecId).select("embedding")
      .head().getSeq[Float](0)
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(i: Int, j: Int): Long = {
      val hex = md.digest(s"${i}_${j}".getBytes("UTF-8")).map("%02x".format(_)).mkString
      if (hex.charAt(0).toInt % 2 == 0) 1L else -1L
    }
    val want = emb.zipWithIndex.map { case (x, i) =>
      math.round(x.toDouble * 1e6) * sign(i, 0)
    }.sum
    assert(first.getAs[Long]("p0_micro") == want)
    // JL guarantee, audited: E[ratio] = 1000; with k = 16 the χ²
    // tails put every vector inside [100, 4000] with overwhelming
    // probability and the corpus mean within ±15%
    val ratios = out.map(_.getAs[Long]("jl_ratio_permille"))
    assert(ratios.forall(r => r >= 100 && r <= 4000),
      s"ratio outside envelope: ${ratios.min}..${ratios.max}")
    val mean = ratios.sum.toDouble / ratios.length
    assert(mean > 850 && mean < 1150, s"mean ratio $mean drifted from 1000")
  }
}
