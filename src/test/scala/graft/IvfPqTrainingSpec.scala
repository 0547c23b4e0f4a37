package graft

import org.apache.spark.sql.functions._
import graft.functions.PqEncode
import graft.llm.{Ivf, Pq}

/** Distributed Lloyd's training must be bit-identical to a sequential
  * driver-side loop over the same ordered sample: same seeds, same
  * assignment score (dot − ‖c‖²/2, first-best-wins), per-cluster sums
  * folded in ascending vec_id order, same mean division. */
class IvfPqTrainingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf001, "embeddings")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def sampleVecs(n: Int): Array[Array[Double]] =
    emb.orderBy("vec_id").limit(n).select("v").as[Array[Double]].collect()

  private def bits(a: Array[Double]): Seq[Long] =
    a.toSeq.map(java.lang.Double.doubleToRawLongBits)

  /** Sequential reference: identical math to the distributed path. */
  private def refCentroids(sample: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    var cents = sample.take(k).map(_.clone())
    for (_ <- 0 until iters) {
      val norms = cents.map(c => c.map(x => x * x).sum / 2)
      val sums = Array.fill(k)(new Array[Double](sample.head.length))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0; var bestScore = Double.NegativeInfinity
        for (c <- cents.indices) {
          var dot = 0.0; var i = 0
          while (i < v.length) { dot += v(i) * cents(c)(i); i += 1 }
          val score = dot - norms(c)
          if (score > bestScore) { bestScore = score; best = c }
        }
        counts(best) += 1
        var i = 0; while (i < v.length) { sums(best)(i) += v(i); i += 1 }
      }
      cents = cents.indices.map(c =>
        if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c))).toArray
    }
    cents
  }

  private def refCodebooks(sample: Array[Array[Double]], m: Int, k: Int,
      iters: Int): Array[Array[Array[Double]]] = {
    val d = sample.head.length; val sub = d / m
    var cb = Array.tabulate(m)(j =>
      sample.take(k).map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub)))
    for (_ <- 0 until iters) {
      val norms = cb.map(_.map(c => c.map(x => x * x).sum / 2))
      val sums = Array.fill(m, k)(new Array[Double](sub))
      val counts = Array.fill(m, k)(0L)
      sample.foreach { v =>
        for (j <- 0 until m) {
          var best = 0; var bestScore = Double.NegativeInfinity
          for (c <- 0 until k) {
            var dot = 0.0; var i = 0
            while (i < sub) { dot += v(j * sub + i) * cb(j)(c)(i); i += 1 }
            val score = dot - norms(j)(c)
            if (score > bestScore) { bestScore = score; best = c }
          }
          counts(j)(best) += 1
          var i = 0; while (i < sub) { sums(j)(best)(i) += v(j * sub + i); i += 1 }
        }
      }
      cb = Array.tabulate(m)(j => Array.tabulate(k)(c =>
        if (counts(j)(c) == 0) cb(j)(c) else sums(j)(c).map(_ / counts(j)(c))))
    }
    cb
  }

  test("T001 distributed IVF centroids bit-identical to sequential reference") {
    val got = Ivf.trainCentroids(emb, k = 16, iters = 5, sampleN = 2000)
    val want = refCentroids(sampleVecs(2000), k = 16, iters = 5)
    assert(got.length == want.length)
    for (c <- got.indices)
      assert(bits(got(c)) == bits(want(c)), s"centroid $c differs")
  }

  test("T002 distributed PQ codebooks bit-identical to sequential reference") {
    val got = Pq.trainCodebooks(emb, m = 8, k = 16, iters = 5, sampleN = 2000)
    val want = refCodebooks(sampleVecs(2000), m = 8, k = 16, iters = 5)
    for (j <- got.indices; c <- got(j).indices)
      assert(bits(got(j)(c)) == bits(want(j)(c)), s"cell ($j,$c) differs")
  }

  test("T004 trainingSample passes small corpora through whole") {
    val ids = Ivf.trainingSample(emb, sampleN = 2000)
      .select("vec_id").as[Long].collect().sorted
    assert(ids.length === emb.count())
  }

  test("T005 trainingSample md5-bucket path: unbiased, deterministic, ~sampleN") {
    // synthetic 8000-row corpus, ids deliberately ingest-ordered so a
    // prefix sample would see only the "early" shard
    val big = spark.range(8000).select(col("id").as("vec_id"),
      array(lit(1.0), lit(2.0)).as("v"))
    val s1 = Ivf.trainingSample(big, sampleN = 2000)
      .select("vec_id").as[Long].collect().sorted
    val s2 = Ivf.trainingSample(big, sampleN = 2000)
      .select("vec_id").as[Long].collect().sorted
    assert(s1.toSeq === s2.toSeq, "sample must be bit-identical across runs")
    // expected 2000 of 8000; binomial(8000, ~0.25) stays well inside
    assert(s1.length > 1700 && s1.length < 2300, s"got ${s1.length}")
    // unbiased across ingest order: roughly half the sample under the
    // id midpoint (a prefix sample would put 100% there)
    val early = s1.count(_ < 4000)
    assert(early > s1.length * 35 / 100 && early < s1.length * 65 / 100,
      s"$early of ${s1.length} below id midpoint — ingest-order bias")
    // the rule is the documented pure function of vec_id: first 4 md5
    // hex chars of the id string as a 16-bit bucket under the ceil cut
    val mdRef = java.security.MessageDigest.getInstance("MD5")
    val keep = (2000L * 65536L + 7999L) / 8000L
    def bucket(id: Long): Long = {
      val hex = mdRef.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 4), 16)
    }
    val want = (0L until 8000L).filter(bucket(_) < keep)
    assert(s1.toSeq === want, "sample must equal the documented md5 rule")
  }

  test("T006 centroids trained on a bucket sample are run-to-run bit-identical") {
    val big = spark.range(4000).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(15)),
        i => sin(col("id") * (i + lit(1)))).as("v"))
    val a = Ivf.trainCentroids(big, k = 4, iters = 3, sampleN = 1000)
    val b = Ivf.trainCentroids(big, k = 4, iters = 3, sampleN = 1000)
    for (c <- a.indices) assert(bits(a(c)) == bits(b(c)), s"centroid $c differs")
  }

  test("T007 training memo returns bit-identical artifacts and caches per key") {
    // memoization must be a pure cost optimization: the memoized
    // artifact bit-equals a fresh training run on the same input, the
    // second lookup returns the cached instance (no retraining), and
    // distinct keys never collide
    val fresh = Ivf.trainCentroids(emb, k = 4, iters = 2, sampleN = 500)
    val memo1 = Ivf.trainCentroidsMemo("spec#memoA", emb, k = 4, iters = 2, sampleN = 500)
    val memo2 = Ivf.trainCentroidsMemo("spec#memoA", emb, k = 4, iters = 2, sampleN = 500)
    for (c <- fresh.indices)
      assert(bits(fresh(c)) == bits(memo1(c)), s"memoized centroid $c differs from fresh")
    assert(memo1 eq memo2, "same key must return the cached instance")
    // hyperparameters ride the key: a different k cannot collide
    val memoK8 = Ivf.trainCentroidsMemo("spec#memoA", emb, k = 8, iters = 2, sampleN = 500)
    assert(memoK8.length == 8 && memo1.length == 4)
    val cbFresh = Pq.trainCodebooks(emb, m = 8, k = 4, iters = 2, sampleN = 500)
    val cbMemo = Pq.trainCodebooksMemo("spec#memoB", emb, m = 8, k = 4, iters = 2, sampleN = 500)
    for (j <- cbFresh.indices; c <- cbFresh(j).indices)
      assert(bits(cbFresh(j)(c)) == bits(cbMemo(j)(c)), s"memoized codebook ($j,$c) differs")
    assert(cbMemo eq Pq.trainCodebooksMemo("spec#memoB", emb, m = 8, k = 4, iters = 2, sampleN = 500))
  }

  test("T003 PqEncode compares by codebook value, not array reference") {
    val cbA = Array.tabulate(2, 4, 8)((j, c, i) => j * 32 + c * 8 + i * 0.5)
    val cbB = Array.tabulate(2, 4, 8)((j, c, i) => j * 32 + c * 8 + i * 0.5)
    val child = org.apache.spark.sql.catalyst.expressions.Literal
      .create(Seq.tabulate(16)(_.toDouble),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))
    val a = PqEncode(child, cbA)
    val b = PqEncode(child, cbB)
    assert(a == b, "deep-equal codebooks must make expressions equal")
    assert(a.hashCode == b.hashCode)
    assert(a.semanticEquals(b))
    val c2 = PqEncode(child, cbA.map(_.map(_.map(_ + 1.0))))
    assert(a != c2)
  }
}
