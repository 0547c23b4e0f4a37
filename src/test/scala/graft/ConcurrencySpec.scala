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
}
