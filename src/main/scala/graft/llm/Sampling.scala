package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Dataset-splitting and sampling operators for a training-data
  * pipeline: deterministic hash-based train/valid/test assignment and
  * exact stratified sampling.
  *
  * Both are scan-shaped and fully oracled — the properties that matter
  * at 100 TB are (a) the split is a pure function of the row key, so
  * re-runs, backfills, and incremental batches land every document in
  * the same split without coordination (no rand(), no persisted
  * assignment table), and (b) the stratified sample is one window
  * shuffle keyed by stratum, not a per-stratum driver loop.
  */
object Sampling {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Deterministic 0–99 bucket from the md5 hex of the key: the first
    * two hex chars feed an ascii-weighted mod — every engine with md5,
    * substr, and ascii computes the identical bucket, making the split
    * portable across Spark, DuckDB, and any backfill script. */
  def hashBucket(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val hex = md5(key.cast("string").cast("binary"))
    (ascii(substring(hex, 1, 1)) * 256 + ascii(substring(hex, 2, 1))) % 100
  }

  /** 80/10/10 train/valid/test assignment, summarized per split so the
    * oracle hash-checks the full assignment function (counts + id
    * extremes shift if ANY document changes split). */
  val trainTestSplit: Q = Q(
    "q_train_test_split",
    (s, dir) => {
      val b = hashBucket(col("doc_id"))
      val split = when(b < 80, "train").when(b < 90, "valid").otherwise("test")
      t(s, dir, "documents")
        .select(col("doc_id"), split.as("split"))
        .groupBy("split")
        .agg(count(lit(1)).as("cnt"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy("split")
    },
    Some("""
      SELECT split, CAST(count(*) AS BIGINT) AS cnt,
             CAST(min(doc_id) AS BIGINT) AS min_id,
             CAST(max(doc_id) AS BIGINT) AS max_id
      FROM (
        SELECT doc_id,
               CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split
        FROM (
          SELECT doc_id,
                 (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 256 +
                  ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100 AS b
          FROM documents
        )
      ) GROUP BY split ORDER BY split"""))

  /** Exact stratified sample: first `perStratum` events of each
    * event_type in (event-time, id) order — one window shuffle keyed
    * by the stratum column; no driver-side loop over strata, so a
    * thousand strata cost the same plan as five. */
  def stratifiedSample(df: DataFrame, stratum: String, perStratum: Int): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(col("ts").asc, col("event_id").asc)
    df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= perStratum)
  }

  val stratified: Q = Q(
    "q_stratified_sample",
    (s, dir) =>
      stratifiedSample(t(s, dir, "events"), "event_type", 50)
        .select("event_type", "rn", "event_id")
        .orderBy("event_type", "rn"),
    Some("""
      SELECT event_type, rn, event_id FROM (
        SELECT event_type, event_id,
               CAST(row_number() OVER (PARTITION BY event_type
                    ORDER BY ts ASC, event_id ASC) AS BIGINT) AS rn
        FROM events
      ) WHERE rn <= 50
      ORDER BY event_type, rn"""))

  /** Quality-weighted (importance) sampling: each document is kept
    * with probability `min(n_chars, 1000)/1000` — longer docs are
    * likelier to survive, the standard quality-proportional
    * downsampling for training mixes. The coin is a deterministic
    * md5-derived value in [0,1000) (hex chars 3–4, independent of
    * [[hashBucket]]'s chars 1–2), so the sample is a pure function of
    * the key: reproducible across runs, engines, and backfills — no
    * rand(), no seed coordination. Output aggregates per source so
    * the oracle hash pins the COMPLETE keep/drop assignment (any
    * flipped doc shifts counts or id extremes). */
  val weighted: Q = Q(
    "q_weighted_sample",
    (s, dir) => {
      val hex = md5(col("doc_id").cast("string").cast("binary"))
      val coin = (ascii(substring(hex, 3, 1)) * 256 + ascii(substring(hex, 4, 1))) % 1000
      val keep = coin < least(col("n_chars"), lit(1000L))
      t(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("total"),
          sum(when(keep, 1L).otherwise(0L)).as("kept"),
          min(when(keep, col("doc_id"))).as("min_kept_id"),
          max(when(keep, col("doc_id"))).as("max_kept_id"))
        .orderBy("source")
    },
    Some("""
      SELECT source, CAST(count(*) AS BIGINT) AS total,
             CAST(sum(CASE WHEN coin < least(n_chars, 1000) THEN 1 ELSE 0 END) AS BIGINT) AS kept,
             CAST(min(CASE WHEN coin < least(n_chars, 1000) THEN doc_id END) AS BIGINT) AS min_kept_id,
             CAST(max(CASE WHEN coin < least(n_chars, 1000) THEN doc_id END) AS BIGINT) AS max_kept_id
      FROM (
        SELECT *, (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) * 256 +
                   ascii(substr(md5(CAST(doc_id AS VARCHAR)), 4, 1))) % 1000 AS coin
        FROM documents
      ) GROUP BY source ORDER BY source"""))

  val all: Seq[Q] = Seq(trainTestSplit, stratified, weighted)
}
