package graft

import org.apache.spark.sql.DataFrame

/** Collector for persisted INTERMEDIATE frames whose release must wait
  * until the caller materializes the returned lazy plan.
  *
  * The dedup/ANN library functions persist mid-pipeline frames
  * (shingle tables, signatures, cluster assignments) that the
  * returned DataFrame still references — unpersisting inside the
  * function would evict the cache before the first job runs. Each
  * such function takes a `CacheHandles` (defaulting to a fresh,
  * never-released one) and `track`s every persist; query bodies that
  * materialize their result in-query (the [[llm.RecallAudit]] floor
  * asserts) then call [[releaseAll]] so a long-lived application
  * doesn't accumulate one corpus-sized cache entry per invocation.
  * Callers that skip release (the ScalaTest suites, ad-hoc use) fall
  * back to the harness contract: Bench/Verify `clearCache()` after
  * each query materializes.
  */
final class CacheHandles {
  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Register a persisted frame for deferred release; returns it. */
  def track(df: DataFrame): DataFrame = synchronized { tracked += df; df }

  /** Unpersist every tracked frame (lazy, safe to call once the
    * caller's result is materialized) and forget them. */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(_.unpersist())
    tracked.clear()
  }
}
