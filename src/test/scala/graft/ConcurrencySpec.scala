package graft

import java.util.concurrent.Executors
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Concurrent-session safety: the operators that historically touched
  * session-level state (connected components' iteration parallelism,
  * streaming's state-partition narrowing, staged landing zones) now
  * scope it to cloned sessions / per-app staging — this suite PROVES
  * the isolation by running them simultaneously against queries that
  * would mis-plan under a mutated `spark.sql.shuffle.partitions` and
  * asserting every result is identical to its sequential run. */
class ConcurrencySpec extends SparkSpec {

  private def rows(name: String): Seq[Seq[Any]] =
    SparkEntry.queries(name)(spark, sf001).collect().toSeq.map(_.toSeq)

  test("conf-scoping operators run concurrently without cross-talk") {
    // sequential ground truth first
    val names = Seq(
      "q_dedup_clusters", // cloned-session CC with narrowed parallelism
      "q_pagerank",       // cloned-session iterative rounds
      "q_stream_window",  // narrowed streaming clone + staging dir
      "q_group_agg",      // plain query that must keep the session default
      "q_topk_per_key")   // ObjectHashAggregate path
    val expected = names.map(n => n -> rows(n)).toMap
    val before = spark.conf.get("spark.sql.shuffle.partitions")

    val pool = Executors.newFixedThreadPool(names.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futures = names.map(n => Future(n -> rows(n)))
      val got = Await.result(Future.sequence(futures), Duration("300s")).toMap
      names.foreach { n =>
        assert(got(n) == expected(n), s"$n diverged under concurrency")
      }
    } finally pool.shutdown()
    // and the shared session's own conf never moved
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }

  test("concurrent Lloyd's trainings stay deterministic, parent conf untouched") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the training clone narrows shuffle parallelism (Ivf.sampleSession);
    // two trainings racing plus a parent-session query must neither
    // cross-talk nor move the parent's conf
    val emb = (0 until 600).map(i =>
      (i.toLong, Array.tabulate(64)(d => math.sin(i * 64 + d)))).toDF("vec_id", "v")
      .persist()
    emb.count()
    val seqCentroids = llm.Ivf.trainCentroids(emb, k = 8, iters = 3, sampleN = 400)
    val seqCodebooks = llm.Pq.trainCodebooks(emb, m = 8, k = 8, iters = 3, sampleN = 400)
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val pool = Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fc = Future(llm.Ivf.trainCentroids(emb, k = 8, iters = 3, sampleN = 400))
      val fb = Future(llm.Pq.trainCodebooks(emb, m = 8, k = 8, iters = 3, sampleN = 400))
      val fq = Future(rows("q_group_agg"))
      val (c, b, q) = (Await.result(fc, Duration("120s")),
        Await.result(fb, Duration("120s")), Await.result(fq, Duration("120s")))
      def bits(a: Array[Double]) = a.toSeq.map(java.lang.Double.doubleToRawLongBits)
      for (i <- c.indices) assert(bits(c(i)) == bits(seqCentroids(i)))
      for (j <- b.indices; i <- b(j).indices)
        assert(bits(b(j)(i)) == bits(seqCodebooks(j)(i)))
      assert(q == rows("q_group_agg"))
    } finally pool.shutdown()
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
    emb.unpersist()
  }
}
