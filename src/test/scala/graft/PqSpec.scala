package graft

import org.apache.spark.sql.functions._
import graft.llm.{Pq, Similarity}

/** Product-quantization codec + search behavior: expression ≡
  * reference encoder, reconstruction quality, and planted-cluster
  * retrieval on data where PQ is supposed to shine. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def refEncode(v: Array[Double],
      cb: Array[Array[Array[Double]]]): Seq[Int] = {
    val sub = cb(0)(0).length
    cb.indices.map { j =>
      var best = 0; var bestScore = Double.NegativeInfinity
      for (c <- cb(j).indices) {
        var dot = 0.0
        for (i <- 0 until sub) dot += v(j * sub + i) * cb(j)(c)(i)
        val score = dot - cb(j)(c).map(x => x * x).sum / 2
        if (score > bestScore) { bestScore = score; best = c }
      }
      best
    }
  }

  private lazy val emb = Tables.load(spark, sf001, "embeddings")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("PqEncode expression (codegen) == driver-side reference encoder") {
    val cb = Pq.trainCodebooks(emb)
    val got = emb.limit(100)
      .select(col("vec_id"), Pq.encode(col("v"), cb).as("code"))
      .as[(Long, Seq[Int])].collect().toMap
    val want = emb.limit(100).as[(Long, Array[Double])].collect()
      .map { case (id, v) => id -> refEncode(v, cb) }.toMap
    assert(got.keySet == want.keySet)
    for ((id, code) <- want) assert(got(id) == code, s"vec $id")
  }

  test("training is deterministic (two runs, identical codebooks)") {
    val a = Pq.trainCodebooks(emb)
    val b = Pq.trainCodebooks(emb)
    assert(a.map(_.map(_.toSeq).toSeq).toSeq == b.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("reconstruction preserves direction: mean cosine(v, decode(encode(v))) high") {
    val cb = Pq.trainCodebooks(emb)
    val mean = emb
      .select(Similarity.cosine(col("v"),
        Pq.reconstruct(Pq.encode(col("v"), cb), cb)).as("c"))
      .agg(avg(col("c"))).head().getDouble(0)
    info(f"mean reconstruction cosine: $mean%.4f")
    assert(mean > 0.55, f"reconstruction too lossy: $mean%.4f")
  }

  test("PQ search retrieves planted cluster structure") {
    // 4 well-separated clusters in 64-dim: center ± small noise.
    // Queries are cluster members; their top-k must stay in-cluster —
    // the regime PQ is built for (clustered data quantizes cleanly).
    val rnd = new scala.util.Random(11)
    val centers = Array.tabulate(4, 64)((c, d) => math.sin(c * 997 + d) * 3)
    val rows = (0 until 200).map { i =>
      val c = i % 4
      (i.toLong, centers(c).map(_ + rnd.nextGaussian() * 0.1).toSeq)
    }
    val base = rows.toDF("vec_id", "v")
    val q = rows.take(4)
      .map { case (id, v) => (id, v) }.toDF("query_id", "qv")
    val cb = Pq.trainCodebooks(base.select(col("vec_id"), col("v")), sampleN = 200)
    val hits = Pq.pqTopK(q, base, cb, k = 5)
      .as[(Long, Long, Long)].collect()
    assert(hits.nonEmpty)
    // every retrieved neighbor must share the query's cluster (id mod 4)
    for ((qid, _, nid) <- hits)
      assert(nid % 4 == qid % 4, s"query $qid retrieved off-cluster $nid")
  }

  test("IVF-PQ recall audit floor: planted copies are retrievable through both levels") {
    // the composed index must at minimum recover the planted exact
    // copy of each query (same cell as the query by construction,
    // zero residual distance) plus most true neighbors — the driver
    // row count IS recall/40; pin a conservative floor here
    val rows = llm.IvfPq.annIvfPq.fn(spark, sf001).collect()
    assert(rows.length >= 30, s"IVF-PQ recall ${rows.length}/40 below floor")
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.size == 8, "every query returns confirmed hits")
    // the planted copy (query_id + 1000000) is cosine-1 identical, so
    // it must appear among each query's confirmed neighbors
    byQuery.foreach { case (qid, hs) =>
      assert(hs.exists(_.getAs[Long]("neighbor_id") == qid + 1000000L),
        s"query $qid lost its planted copy")
    }
  }
}
