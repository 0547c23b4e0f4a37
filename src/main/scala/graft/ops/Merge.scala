package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Incremental snapshot maintenance — the upsert/merge the reference
  * sidesteps by full-snapshot-replace (SURVEY.md §2i: its daily run
  * overwrites one S3 key). At 100 TB you cannot rewrite the world
  * per day; you merge a small delta into the standing snapshot.
  */
object Merge {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Keep-latest-version upsert: union base ∪ delta, keep the highest
    * `version` row per key. One hash shuffle on the key (window +
    * row_number), no driver involvement.
    *
    * Scale shape: shuffle volume is base+delta for this generic form.
    * Production pins the base bucketed/sorted by key (ops/Sinks
    * bucketedTable) so the merge co-locates: only the delta (≪ base)
    * shuffles, and compaction rewrites just the touched buckets —
    * same plan, layout-assisted. The deterministic tiebreaker demands
    * of the driver oracle (unique (key, version) pairs) mirror what a
    * real CDC stream guarantees via log offsets. */
  def upsertLatest(base: DataFrame, delta: DataFrame,
      keys: Seq[String], version: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(version).desc)
    base.unionByName(delta)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Driver query: orders as the day-0 snapshot (version 0), a
    * deterministic 1-in-7 "price correction" delta (version 1, +10%
    * in exact integer cents), merged keep-latest. The output carries
    * every key with its surviving version + price, so the hash fails
    * if merge drops, duplicates, or mis-versions any row. */
  val incrementalMerge: Q = Q(
    "q_incremental_merge",
    (s, dir) => {
      val base = t(s, dir, "orders")
        .select(col("o_orderkey"), lit(0L).as("version"),
          round(col("o_totalprice") * 100, 0).cast("long").as("total_cents"),
          col("o_orderstatus"))
      val delta = base.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), lit(1L).as("version"),
          (col("total_cents") + expr("total_cents div 10")).as("total_cents"),
          col("o_orderstatus"))
      upsertLatest(base, delta, Seq("o_orderkey"), "version")
        .orderBy("o_orderkey")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey, CAST(0 AS BIGINT) AS version,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
               o_orderstatus
        FROM orders),
      delta AS (
        SELECT o_orderkey, CAST(1 AS BIGINT) AS version,
               total_cents + total_cents // 10 AS total_cents, o_orderstatus
        FROM base WHERE o_orderkey % 7 = 0),
      merged AS (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
        FROM (SELECT * FROM base UNION ALL SELECT * FROM delta))
      SELECT o_orderkey, version, total_cents, o_orderstatus
      FROM merged WHERE rn = 1 ORDER BY o_orderkey"""))

  val all: Seq[Q] = Seq(incrementalMerge)
}
