package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Analytic-function breadth (SURVEY.md §2e was a single row_number
  * proof; this is the full ranking/offset/frame surface) plus date
  * extraction and lateral explode — each picked for identical ANSI
  * semantics on both engines.
  */
object WindowSuite {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Ranking + offset + frame functions over a deterministic
    * (unique-key) window order. One shuffle on the partition key. */
  val windowFuncs: Q = Q(
    "q_window_suite",
    (s, dir) => {
      val w = Window.partitionBy("o_orderstatus").orderBy(col("o_orderkey").asc)
      val running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_orderkey"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .select(
          col("o_orderstatus"), col("o_orderkey"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          percent_rank().over(w).as("prnk"),
          ntile(4).over(w).cast("long").as("quartile"),
          lag(col("cents"), 1).over(w).as("prev_cents"),
          lead(col("cents"), 2, -1L).over(w).as("next2_cents"),
          sum(col("cents")).over(running).as("running_cents"),
          count(lit(1)).over(running).as("running_cnt"))
        .orderBy("o_orderstatus", "o_orderkey")
    },
    Some("""
      SELECT o_orderstatus, o_orderkey,
             CAST(rank() OVER w AS BIGINT) AS rnk,
             CAST(dense_rank() OVER w AS BIGINT) AS drnk,
             percent_rank() OVER w AS prnk,
             CAST(ntile(4) OVER w AS BIGINT) AS quartile,
             lag(cents, 1) OVER w AS prev_cents,
             lead(cents, 2, -1) OVER w AS next2_cents,
             CAST(sum(cents) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents,
             CAST(count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cnt
      FROM (SELECT o_orderstatus, o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderkey ASC)
      ORDER BY o_orderstatus, o_orderkey"""))

  /** Date-part extraction suite. `weekday()+1` on the Spark side is
    * DuckDB's `isodow` (Mon=1..Sun=7) — Spark's `dayofweek` counts
    * from Sunday, a cross-engine trap pinned here deliberately. */
  val dateParts: Q = Q(
    "q_date_parts",
    (s, dir) => {
      val d = col("o_orderdate").cast("date")
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          year(d).cast("long").as("y"),
          quarter(d).cast("long").as("q"),
          month(d).cast("long").as("m"),
          dayofmonth(d).cast("long").as("dom"),
          (weekday(d) + 1).cast("long").as("iso_dow"),
          last_day(d).as("month_end"),
          add_months(d, 1).as("next_month"),
          date_trunc("month", d).cast("date").as("month_start"))
        .orderBy("o_orderkey")
    },
    Some("""
      SELECT o_orderkey,
             CAST(year(d) AS BIGINT) AS y,
             CAST(quarter(d) AS BIGINT) AS q,
             CAST(month(d) AS BIGINT) AS m,
             CAST(day(d) AS BIGINT) AS dom,
             CAST(isodow(d) AS BIGINT) AS iso_dow,
             last_day(d) AS month_end,
             CAST(d + INTERVAL 1 MONTH AS DATE) AS next_month,
             CAST(date_trunc('month', d) AS DATE) AS month_start
      FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
      ORDER BY o_orderkey"""))

  /** Lateral explode (generator) — tokens of the first 50 docs.
    * Duplicate (doc_id, token) rows are legitimate bag semantics;
    * the sort is total over the multiset either way. */
  val explodeTokens: Q = Q(
    "q_explode_tokens",
    (s, dir) =>
      t(s, dir, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          explode(split(trim(col("text")), "\\s+")).as("token"))
        .orderBy("doc_id", "token"),
    Some("""
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      FROM documents WHERE doc_id < 50
      ORDER BY doc_id, token"""))

  /** Event-time RANGE frame: per-user trailing-1-hour moving sum and
    * event count — the frame is bounded by a TIME interval, not a row
    * count, so bursts widen the window's row membership (the property
    * a rows-frame can't express). Spark's rangeBetween needs a
    * numeric ordering column, so the frame orders on epoch seconds
    * (exact long); DuckDB mirrors with RANGE ... PRECEDING over the
    * same integer. One shuffle on the partition key; ties inside a
    * range frame aggregate identically on both engines because the
    * frame is value-bounded (peer rows share the frame), unlike a
    * rows-frame where tie order would diverge. */
  val movingAvg: Q = Q(
    "q_moving_avg",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("epoch_s"))
        .rangeBetween(-3600L, 0L)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("epoch_s"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .select(col("user_id"), col("event_id"), col("epoch_s"),
          sum(col("cents")).over(w).as("trail_1h_cents"),
          count(lit(1)).over(w).as("trail_1h_n"))
        .orderBy("user_id", "epoch_s", "event_id")
    },
    Some("""
      SELECT user_id, event_id, epoch_s,
             CAST(sum(cents) OVER w AS BIGINT) AS trail_1h_cents,
             CAST(count(*) OVER w AS BIGINT) AS trail_1h_n
      FROM (
        SELECT user_id, event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
                   RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, epoch_s, event_id"""))

  val all: Seq[Q] = Seq(windowFuncs, dateParts, explodeTokens, movingAvg)
}
