package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Parity queries — one per operator row of SURVEY.md §2, transplanted
  * onto the driver's TPC-H-ish corpus (role mapping in FIXTURES.md §B).
  *
  * Scale notes apply to every query here: they are single declarative
  * DataFrame chains, so Catalyst pushes filters/projections into the
  * parquet scan; the only shuffles are those semantically required
  * (global sorts, aggregations). Broadcast is requested explicitly for
  * dimension joins.
  */
object Parity {
  import Recency.AsOf

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** E3 flagship (reference ATHENA_SQL `lambda_function.py:173-179`):
    * recency-scored scan → filter score>=4 → 5-col project → top-10 by
    * date. Catalyst plans `TakeOrderedAndProject` — no full sort, and
    * at 100 TB only per-partition top-10 heaps reach the driver.
    */
  val recencyTopK: Q = Q(
    "q_recency_topk",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.withColumn("days", Recency.daysSince(lit(AsOf), col("o_orderdate")))
        .withColumn("recency_score", Recency.score(col("days")).cast("long"))
        .filter(col("recency_score") >= 4)
        .select("o_orderkey", "o_orderpriority", "o_orderdate", "o_orderstatus", "recency_score")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        .limit(10)
    },
    Some(s"""
      SELECT o_orderkey, o_orderpriority, o_orderdate, o_orderstatus, recency_score
      FROM (
        SELECT *, CAST(CASE WHEN d <= 30 THEN 5 WHEN d <= 90 THEN 4
                            WHEN d <= 180 THEN 3 WHEN d <= 365 THEN 2
                            ELSE 1 END AS BIGINT) AS recency_score
        FROM (SELECT *, date_diff('day', CAST(o_orderdate AS DATE), DATE '$AsOf') AS d
              FROM orders)
      )
      WHERE recency_score >= 4
      ORDER BY o_orderdate DESC, o_orderkey DESC
      LIMIT 10"""))

  /** P1 substring-containment disjunction filter (reference `:57-63`):
    * null guard + case-sensitive `contains` OR-chain. Both predicates
    * push to the scan as Catalyst `Contains`. */
  val containsFilter: Q = Q(
    "q_contains_filter",
    (s, dir) =>
      t(s, dir, "orders")
        .filter(col("o_orderpriority").isNotNull &&
          (col("o_orderpriority").contains("URGENT") || col("o_orderpriority").contains("HIGH")))
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey"),
    Some("""
      SELECT o_orderkey, o_orderpriority FROM orders
      WHERE o_orderpriority IS NOT NULL
        AND (contains(o_orderpriority, 'URGENT') OR contains(o_orderpriority, 'HIGH'))
      ORDER BY o_orderkey"""))

  /** P2/F1/F2 flatten-project with trim + upper (reference `:67-81`,
    * `:91`): narrow projection prunes the parquet scan to 3 columns. */
  val trimProject: Q = Q(
    "q_trim_project",
    (s, dir) =>
      t(s, dir, "customer")
        .select(
          col("c_custkey"),
          trim(coalesce(col("c_name"), lit(""))).as("name"),
          upper(col("c_mktsegment")).as("segment"))
        .orderBy("c_custkey"),
    Some("""
      SELECT c_custkey, trim(coalesce(c_name, '')) AS name,
             upper(c_mktsegment) AS segment
      FROM customer ORDER BY c_custkey"""))

  /** P3 drop-null quality filter (reference `:86`):
    * `na.drop(subset)` ≡ conjunctive IS NOT NULL — pushed to the scan. */
  val dropNull: Q = Q(
    "q_dropna",
    (s, dir) =>
      t(s, dir, "events")
        .na.drop(Seq("event_type", "value", "ts"))
        .select("event_id", "event_type")
        .orderBy("event_id"),
    Some("""
      SELECT event_id, event_type FROM events
      WHERE event_type IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
      ORDER BY event_id"""))

  /** J1 dimension lookup as a broadcast left-outer equi join + default
    * (reference naics_map `:94-99`). `broadcast()` is explicit: at
    * 100 TB the fact side never shuffles — the dim ships to executors.
    */
  val dimJoin: Q = Q(
    "q_dim_join",
    (s, dir) => {
      val nation = t(s, dir, "nation")
      val region = t(s, dir, "region")
      nation
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"), "left")
        .select(
          col("n_nationkey"), col("n_name"),
          coalesce(col("r_name"), lit("Other")).as("region_name"))
        .orderBy("n_nationkey")
    },
    Some("""
      SELECT n_nationkey, n_name, coalesce(r_name, 'Other') AS region_name
      FROM nation LEFT JOIN region ON n_regionkey = r_regionkey
      ORDER BY n_nationkey"""))

  /** F9 literal-map lookup + default (reference `.map().fillna()`
    * `:99`) — the pure-expression alternative to J1: `try_element_at`
    * over an inline map (ANSI-safe), no join at all. */
  val mapLookup: Q = Q(
    "q_map_lookup",
    (s, dir) =>
      t(s, dir, "nation")
        .select(
          col("n_nationkey"),
          coalesce(
            try_element_at(
              map(lit(0), lit("ZONE-A"), lit(1), lit("ZONE-B"), lit(2), lit("ZONE-C")),
              col("n_regionkey")),
            lit("Other")).as("zone"))
        .orderBy("n_nationkey"),
    Some("""
      SELECT n_nationkey,
             CASE WHEN n_regionkey = 0 THEN 'ZONE-A'
                  WHEN n_regionkey = 1 THEN 'ZONE-B'
                  WHEN n_regionkey = 2 THEN 'ZONE-C'
                  ELSE 'Other' END AS zone
      FROM nation ORDER BY n_nationkey"""))

  /** U1 bag union of page batches (reference `:47`) + O3 source
    * truncation `[:MAX_RECORDS]` (reference `:54`): union-all of two
    * disjoint filtered scans, deterministic order, limit 500. Union is
    * a zero-shuffle narrow op; the limit short-circuits the sort via
    * TakeOrderedAndProject. */
  val unionLimit: Q = Q(
    "q_union_limit",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val pageA = o.filter(col("o_orderpriority") === "1-URGENT")
      val pageB = o.filter(col("o_orderpriority") === "5-LOW")
      pageA.unionByName(pageB)
        .select("o_orderkey", "o_orderpriority")
        .orderBy("o_orderkey")
        .limit(500)
    },
    Some("""
      SELECT o_orderkey, o_orderpriority FROM (
        SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT * FROM orders WHERE o_orderpriority = '5-LOW'
      ) ORDER BY o_orderkey LIMIT 500"""))

  /** A1 count (reference `:123,:211`): full-scan count — at scale this
    * is metadata-only for parquet (row-group counts), no data read. */
  val countAll: Q = Q(
    "q_count",
    (s, dir) => t(s, dir, "lineitem").agg(count(lit(1)).as("cnt")),
    Some("SELECT CAST(count(*) AS BIGINT) AS cnt FROM lineitem"))

  /** O1 global multi-key sort (reference `:115`) with the unique
    * tiebreaker SURVEY §7.5 requires. Range-partitioned SortExec —
    * scales as a single shuffle. */
  val multiKeySort: Q = Q(
    "q_multikey_sort",
    (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_orderdate")
        .orderBy(col("o_orderpriority").desc, col("o_orderdate").desc, col("o_orderkey").desc),
    Some("""
      SELECT o_orderkey, o_orderpriority, o_orderdate FROM orders
      ORDER BY o_orderpriority DESC, o_orderdate DESC, o_orderkey DESC"""))

  /** F4/F10/F11 date scalar family: format (reference `:21`), parse
    * round-trip with null-on-failure (`:87`), lookback window (`:18-21`).
    * All codegen'd built-ins; `try_to_timestamp` keeps ANSI mode safe. */
  val dateScalars: Q = Q(
    "q_date_scalars",
    (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "MM/dd/yyyy").as("posted_fmt"),
          try_to_timestamp(date_format(col("o_orderdate"), "MM/dd/yyyy"), lit("MM/dd/yyyy"))
            .as("parsed_back"),
          date_sub(col("o_orderdate").cast("date"), 5).as("lookback_start"),
          Recency.daysSince(lit(AsOf), col("o_orderdate")).cast("long").as("days_since"))
        .orderBy("o_orderkey"),
    Some(s"""
      SELECT o_orderkey,
             strftime(o_orderdate, '%m/%d/%Y') AS posted_fmt,
             strptime(strftime(o_orderdate, '%m/%d/%Y'), '%m/%d/%Y') AS parsed_back,
             CAST(CAST(o_orderdate AS DATE) - INTERVAL 5 DAY AS DATE) AS lookback_start,
             CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '$AsOf') AS BIGINT) AS days_since
      FROM orders ORDER BY o_orderkey"""))

  /** F6/F7/F8 derived-flag family: null-safe boolean derivation,
    * CaseWhen ladder, non-blank test — the reference's two row-wise
    * UDFs (`:90,:114`) as pure codegen expressions. */
  val flagLadder: Q = Q(
    "q_flag_ladder",
    (s, dir) => {
      val days = Recency.daysSince(lit(AsOf), col("o_orderdate"))
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          Recency.isRecent(days, 90).as("is_recent"),
          Recency.score(days).cast("long").as("recency_score"),
          Recency.nonBlank(col("o_orderpriority")).as("has_priority"))
        .orderBy("o_orderkey")
    },
    Some(s"""
      SELECT o_orderkey,
             coalesce(date_diff('day', CAST(o_orderdate AS DATE), DATE '$AsOf') <= 90, false) AS is_recent,
             CAST(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), DATE '$AsOf') <= 30 THEN 5
                       WHEN date_diff('day', CAST(o_orderdate AS DATE), DATE '$AsOf') <= 90 THEN 4
                       WHEN date_diff('day', CAST(o_orderdate AS DATE), DATE '$AsOf') <= 180 THEN 3
                       WHEN date_diff('day', CAST(o_orderdate AS DATE), DATE '$AsOf') <= 365 THEN 2
                       ELSE 1 END AS BIGINT) AS recency_score,
             (o_orderpriority IS NOT NULL AND trim(o_orderpriority) <> '') AS has_priority
      FROM orders ORDER BY o_orderkey"""))

  val all: Seq[Q] = Seq(
    recencyTopK, containsFilter, trimProject, dropNull, dimJoin, mapLookup,
    unionLimit, countAll, multiKeySort, dateScalars, flagLadder)
}
