package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Semi-structured + event-time operators over the `events` table:
  * JSON property extraction (SURVEY.md §2h F12 generalized to a data
  * column) and tumbling-window aggregation — the batch twin of the
  * Structured Streaming window (graft.streaming), sharing semantics so
  * a stream job's output can be oracle-checked against this query.
  */
object Events {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** JSON extraction + grouped aggregation: `get_json_object` is the
    * engine-native path (codegen, no UDF); money-style double sums go
    * through exact cents (SURVEY.md §7.5). */
  val jsonExtract: Q = Q(
    "q_json_extract",
    (s, dir) =>
      t(s, dir, "events")
        .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS BIGINT)"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"),
          sum(round(col("value") * 100, 0).cast("long")).as("sum_value_cents"))
        .orderBy("event_type"),
    Some("""
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(k) AS BIGINT) AS sum_k,
             CAST(min(k) AS BIGINT) AS min_k,
             CAST(max(k) AS BIGINT) AS max_k,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
      FROM (SELECT *, try_cast(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
      GROUP BY event_type ORDER BY event_type"""))

  /** Tumbling event-time window (1 hour) × event_type — expressed with
    * date_trunc so the oracle is dialect-shared. In streaming mode the
    * identical aggregation runs with `window($"ts", "1 hour")` + a
    * watermark (see graft.streaming.EventStream); this batch query is
    * its replay/backfill form. */
  val hourlyWindow: Q = Q(
    "q_time_window",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(
          date_trunc("hour", col("ts")).as("window_start"),
          col("event_type"))
        .agg(
          count(lit(1)).as("cnt"),
          sum(round(col("value") * 100, 0).cast("long")).as("sum_value_cents"))
        .orderBy("window_start", "event_type"),
    Some("""
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
      FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""))

  /** Sessionization-lite: per-user event ordering with lag-based
    * session cut at 30 min idle — window-function capability on
    * event-time (SURVEY.md §2e extension). Session ids are emitted as
    * (user_id, session_seq). */
  val sessionize: Q = Q(
    "q_sessionize",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > 1800, 1L)
            .otherwise(0L))
        .withColumn("session_seq", sum(col("new_session")).over(running))
        .groupBy("user_id", "session_seq")
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
        .orderBy("user_id", "session_seq")
    },
    Some("""
      SELECT user_id, session_seq,
             CAST(count(*) AS BIGINT) AS n_events,
             min(ts) AS session_start, max(ts) AS session_end
      FROM (
        SELECT user_id, ts,
               CAST(sum(new_session) OVER (PARTITION BY user_id
                    ORDER BY ts ASC, event_id ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        FROM (
          SELECT user_id, ts, event_id,
                 CASE WHEN prev_ts IS NULL
                        OR date_diff('second', prev_ts, ts) > 1800
                      THEN 1 ELSE 0 END AS new_session
          FROM (
            SELECT user_id, ts, event_id,
                   lag(ts, 1) OVER (PARTITION BY user_id
                        ORDER BY ts ASC, event_id ASC) AS prev_ts
            FROM events)))
      GROUP BY user_id, session_seq ORDER BY user_id, session_seq"""))

  val all: Seq[Q] = Seq(jsonExtract, hourlyWindow, sessionize)
}
