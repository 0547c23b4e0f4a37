package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Slowly-changing-dimension maintenance — the history side of the
  * warehouse surface [[Merge]] covers the latest-state side of. The
  * reference replaces its whole snapshot daily (lambda_function.py:205-230
  * overwrites one S3 key), which forgets history; SCD Type 2 is what a
  * warehouse keeps instead: one row per (key, unchanged-attribute run)
  * with an effective-version interval and a current flag.
  */
object Scd {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Generic SCD2 build: given stacked snapshots
    * `(key, ver, attrs...)`, collapse per-key runs of identical
    * attributes into intervals `[eff_from, eff_to]` with
    * `is_current`. Change detection is `lag` over the per-key version
    * order; run ids are a running sum of change flags; interval ends
    * come from `lead` of the NEXT run's start.
    *
    * Scale shape: every window partitions by the dimension key — ONE
    * hash shuffle on `key` pays for change detection, run grouping,
    * and interval stitching (the run groupBy and the lead window
    * reuse the same hash partitioning; Spark plans a single
    * Exchange). Snapshots bucketed by key at write time ([[Sinks]]
    * layout) make the build shuffle-free. Nothing is driver-side and
    * no window is unpartitioned. */
  def scd2(snaps: DataFrame, key: String, ver: String,
      attrs: Seq[String], currentMark: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ver)
    val changed = attrs
      .map(a => col(a) =!= lag(col(a), 1).over(w))
      .reduce(_ || _) || lag(col(ver), 1).over(w).isNull
    val runs = snaps
      .withColumn("__chg", when(changed, 1L).otherwise(0L))
      .withColumn("__run", sum(col("__chg"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(key), col("__run"))
      .agg(
        min(col(ver)).as("eff_from"),
        // attrs are constant within a run; min is the deterministic pick
        attrs.map(a => min(col(a)).as(a)): _*)
    val wk = Window.partitionBy(key).orderBy("eff_from")
    runs
      .withColumn("eff_to",
        coalesce(lead(col("eff_from"), 1).over(wk) - 1, lit(currentMark)))
      .withColumn("is_current",
        when(col("eff_to") === currentMark, 1L).otherwise(0L))
      .drop("__run")
  }

  /** Driver query: three deterministic order snapshots —
    * v0 the base, v1 reprices keys ≡0 (mod 7) +10% exact cents
    * ([[Merge]]'s delta recipe), v2 flips keys ≡0 (mod 5) to a
    * 'R'eturned status. Keys hit by neither rule collapse to ONE
    * current row spanning [0, current]; keys hit by both carry three.
    * The oracle re-derives the same intervals with the same window
    * algebra, so every interval boundary and flag is in the hash. */
  val scd2Orders: Q = Q(
    "q_scd2",
    (s, dir) => {
      val base = t(s, dir, "orders").select(
        col("o_orderkey").as("key"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        col("o_orderstatus").as("status"))
      val s0 = base.select(col("key"), lit(0L).as("ver"), col("cents"), col("status"))
      val s1 = base.select(col("key"), lit(1L).as("ver"),
        when(col("key") % 7 === 0, col("cents") + expr("cents div 10"))
          .otherwise(col("cents")).as("cents"),
        col("status"))
      val s2 = base.select(col("key"), lit(2L).as("ver"),
        when(col("key") % 7 === 0, col("cents") + expr("cents div 10"))
          .otherwise(col("cents")).as("cents"),
        when(col("key") % 5 === 0, lit("R")).otherwise(col("status")).as("status"))
      scd2(s0.unionAll(s1).unionAll(s2), "key", "ver",
          Seq("cents", "status"), currentMark = 99L)
        .select(col("key"), col("eff_from"), col("eff_to"),
          col("cents"), col("status"), col("is_current"))
        .orderBy("key", "eff_from")
    },
    Some("""
      WITH base AS (
        SELECT o_orderkey AS key,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               o_orderstatus AS status
        FROM orders),
      snaps AS (
        SELECT key, CAST(0 AS BIGINT) AS ver, cents, status FROM base
        UNION ALL
        SELECT key, CAST(1 AS BIGINT) AS ver,
               CASE WHEN key % 7 = 0 THEN cents + cents // 10 ELSE cents END,
               status
        FROM base
        UNION ALL
        SELECT key, CAST(2 AS BIGINT) AS ver,
               CASE WHEN key % 7 = 0 THEN cents + cents // 10 ELSE cents END,
               CASE WHEN key % 5 = 0 THEN 'R' ELSE status END
        FROM base),
      flagged AS (
        SELECT *,
               CASE WHEN lag(ver) OVER w IS NULL
                      OR cents <> lag(cents) OVER w
                      OR status <> lag(status) OVER w
                    THEN 1 ELSE 0 END AS chg
        FROM snaps
        WINDOW w AS (PARTITION BY key ORDER BY ver)),
      runs AS (
        SELECT *, CAST(sum(chg) OVER (PARTITION BY key ORDER BY ver
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run
        FROM flagged),
      grouped AS (
        SELECT key, run, CAST(min(ver) AS BIGINT) AS eff_from,
               min(cents) AS cents, min(status) AS status
        FROM runs GROUP BY key, run),
      stitched AS (
        SELECT key, eff_from,
               coalesce(lead(eff_from) OVER (PARTITION BY key ORDER BY eff_from) - 1,
                        99) AS eff_to,
               cents, status
        FROM grouped)
      SELECT key, eff_from, CAST(eff_to AS BIGINT) AS eff_to, cents, status,
             CAST(CASE WHEN eff_to = 99 THEN 1 ELSE 0 END AS BIGINT) AS is_current
      FROM stitched
      ORDER BY key, eff_from"""))

  val all: Seq[Q] = Seq(scd2Orders)
}
