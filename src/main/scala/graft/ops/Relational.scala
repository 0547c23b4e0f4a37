package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Relational capability proofs — absent from the reference (SURVEY.md
  * §2c/§2d/§2e/§2g "Absent" rows) but mandatory for a usable analytics
  * engine; each flagged "extension" per SURVEY.md §7.3 step 2.
  *
  * Float determinism rule (SURVEY.md §7.5): money sums go through
  * `ROUND(x*100) AS BIGINT` cents so partial-aggregation order can
  * never change a hash-compared value; `l_quantity` is integer-valued
  * so its double sum is exact.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def cents(c: String) = round(col(c) * 100, 0).cast("long")

  /** TPC-H-Q1-style grouped aggregation: hash partial+final agg with
    * map-side combine — the shuffle carries one row per (flag,status)
    * per partition, not per input row. AQE coalesces post-shuffle
    * partitions at small SF; at 100 TB the same plan holds. */
  val groupAgg: Q = Q(
    "q_group_agg",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("l_quantity")).as("sum_qty"),
          sum(cents("l_extendedprice")).as("sum_price_cents"),
          min(col("l_shipdate")).as("min_ship"),
          max(col("l_shipdate")).as("max_ship"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(count(*) AS BIGINT) AS cnt,
             sum(l_quantity) AS sum_qty,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
             min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Multi-way join + aggregation (orders ⋈ customer ⋈ nation):
    * customer and nation are broadcast (dims), so the 100 TB fact table
    * never shuffles for the join — only the final tiny group-by does. */
  val joinAgg: Q = Q(
    "q_join_agg",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          count(lit(1)).as("order_cnt"),
          sum(cents("o_totalprice")).as("revenue_cents"))
        .orderBy("n_name")
    },
    Some("""
      SELECT n_name,
             CAST(count(*) AS BIGINT) AS order_cnt,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""))

  /** Left-semi join: customers holding at least one urgent order.
    * Semi joins dedup the probe side inside the join — no distinct
    * shuffle afterwards. */
  val semiJoin: Q = Q(
    "q_semi_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, c_mktsegment FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey"""))

  /** Left-anti join: customers with no urgent orders. */
  val antiJoin: Q = Q(
    "q_anti_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey"""))

  /** Window function capability (SURVEY.md §2e): latest 2 orders per
    * customer by row_number with a fully deterministic frame order.
    * One shuffle on the partition key; no global sort. */
  val windowTopN: Q = Q(
    "q_window_topn",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 2)
        .select("o_custkey", "rn", "o_orderkey", "o_orderdate")
        .orderBy("o_custkey", "rn")
    },
    Some("""
      SELECT o_custkey, rn, o_orderkey, o_orderdate FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS BIGINT) AS rn
        FROM orders
      ) WHERE rn <= 2
      ORDER BY o_custkey, rn"""))

  /** Set operations (SURVEY.md §2g): INTERSECT — high-balance customers
    * that actually placed orders. Distinct semantics on both engines. */
  val intersectKeys: Q = Q(
    "q_intersect",
    (s, dir) => {
      val haveOrders = t(s, dir, "orders").select(col("o_custkey").as("custkey"))
      val rich = t(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey"))
      haveOrders.intersect(rich).orderBy("custkey")
    },
    Some("""
      SELECT o_custkey AS custkey FROM orders
      INTERSECT
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
      ORDER BY custkey"""))

  /** EXCEPT — customers that never bought from the BUILDING segment
    * side: order-holders minus negative-balance customers. */
  val exceptKeys: Q = Q(
    "q_except",
    (s, dir) => {
      val haveOrders = t(s, dir, "orders").select(col("o_custkey").as("custkey"))
      val negative = t(s, dir, "customer").filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("custkey"))
      haveOrders.except(negative).orderBy("custkey")
    },
    Some("""
      SELECT o_custkey AS custkey FROM orders
      EXCEPT
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
      ORDER BY custkey"""))

  /** DISTINCT projection (SURVEY.md §2d "distinct"). */
  val distinctPairs: Q = Q(
    "q_distinct",
    (s, dir) =>
      t(s, dir, "orders")
        .select("o_orderstatus", "o_orderpriority")
        .distinct()
        .orderBy("o_orderstatus", "o_orderpriority"),
    Some("""
      SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
      ORDER BY o_orderstatus, o_orderpriority"""))

  /** ROLLUP grouping sets (SURVEY.md §2d): subtotal + grand-total rows.
    * Null ordering pinned explicitly on both sides (Spark ASC default
    * is NULLS FIRST; DuckDB's is not — SURVEY.md §7.5 dialect drift). */
  val rollupAgg: Q = Q(
    "q_rollup",
    (s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(count(*) AS BIGINT) AS cnt, sum(l_quantity) AS sum_qty
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  /** Approximate distinct-count capability (HLL-class, SURVEY.md §2d
    * "Absent" row): exact oracle via COUNT(DISTINCT), Spark side uses
    * exact count_distinct here; `approx_count_distinct` is exercised
    * (un-oracled) in the ScalaTest suite since its sketch values are
    * engine-specific. */
  val distinctCount: Q = Q(
    "q_distinct_count",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count_distinct(col("l_partkey")).as("distinct_parts"))
        .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS distinct_parts
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Approximate distinct count (HLL++, SURVEY.md §2d HLL row) with a
    * driver-checkable bound: the Spark side emits the exact count and
    * a boolean asserting the sketch landed within 5% of it; the
    * oracle emits the exact count and literal TRUE. The hash compare
    * therefore FAILS if the sketch ever drifts out of range — a real
    * accuracy check on an engine-specific value no cross-engine
    * oracle could reproduce directly. rsd=0.02 ⇒ the 5% bound is
    * ~2.5σ. At 100 TB this is the count-distinct to reach for: fixed
    * sketch size per group, map-side combinable, no exact-distinct
    * expansion shuffle. */
  val approxDistinct: Q = Q(
    "q_approx_distinct",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count_distinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")).cast("double") /
            col("exact_parts") <= 0.05).as("within_5pct"))
        .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             TRUE AS within_5pct
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** TPC-H-Q1-shaped pricing summary: the canonical scan-heavy
    * aggregate — one pass over lineitem, shipdate filter pushed to the
    * scan, 2-key groupBy with 8 aggregates, all map-side combinable
    * (the reduce shuffle carries 4 rows). Money sums in exact cents /
    * basis points; the averages divide those exact sums, so the
    * doubles are bit-identical across engines. */
  val tpchQ1: Q = Q(
    "q_tpch_q1",
    (s, dir) => {
      def cents(c: org.apache.spark.sql.Column) = round(c * 100, 0).cast("long")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_cents"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_cents"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))).as("sum_charge_cents"),
          sum(round(col("l_discount") * 10000, 0).cast("long")).as("sum_disc_bp"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_qty_cents"), col("sum_base_cents"),
          col("sum_disc_cents"), col("sum_charge_cents"),
          (col("sum_qty_cents").cast("double") / 100.0 / col("count_order")).as("avg_qty"),
          (col("sum_base_cents").cast("double") / 100.0 / col("count_order")).as("avg_price"),
          (col("sum_disc_bp").cast("double") / 10000.0 / col("count_order")).as("avg_disc"),
          col("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
             CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
             CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_qty,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / count(*) AS avg_price,
             CAST(sum(CAST(round(l_discount * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 / count(*) AS avg_disc,
             CAST(count(*) AS BIGINT) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** UNPIVOT (wide → long): part metrics melted into (metric, value)
    * rows via `Dataset.unpivot` — a Generate (expand) over the row,
    * no shuffle beyond the declared ORDER BY. Values are cast to a
    * common type up front (unpivot requires it); cents-exact so the
    * doubles hash identically. The oracle uses the portable
    * UNION ALL formulation rather than DuckDB's UNPIVOT syntax. */
  val unpivotParts: Q = Q(
    "q_unpivot",
    (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          round(col("p_retailprice") * 100, 0).cast("long").as("retail_cents"),
          col("p_size").cast("long").as("size_units"))
        .unpivot(Array(col("p_partkey")),
          Array(col("retail_cents"), col("size_units")),
          "metric", "value")
        .orderBy("p_partkey", "metric"),
    Some("""
      SELECT p_partkey, metric, value FROM (
        SELECT p_partkey, 'retail_cents' AS metric,
               CAST(round(p_retailprice * 100) AS BIGINT) AS value FROM part
        UNION ALL
        SELECT p_partkey, 'size_units' AS metric,
               CAST(p_size AS BIGINT) AS value FROM part
      ) ORDER BY p_partkey, metric"""))

  /** TPC-H-Q3-shaped flagship: segment-filtered customer ⋈ orders ⋈
    * lineitem, revenue per order, top-10. The fact-side joins key on
    * custkey/orderkey; customer is broadcast; the per-order aggregate
    * is map-side combinable; the final top-10 is
    * TakeOrderedAndProject (per-partition heaps, no global sort). */
  val tpchQ3: Q = Q(
    "q_tpch_q3",
    (s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("2000-01-01").cast("date"))
      val l = t(s, dir, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0)
          .cast("long")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey").asc)
        .limit(10)
    },
    Some("""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
             CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING' AND o_orderdate < DATE '2000-01-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue_cents DESC, l_orderkey ASC
      LIMIT 10"""))

  /** TPC-H-Q5-shaped 6-way join: region-filtered nation ⋈ supplier ⋈
    * customer ⋈ orders ⋈ lineitem, revenue per nation. The only
    * fact-fact shuffle is lineitem ⋈ orders on orderkey; supplier,
    * nation, and region are broadcast, and customer is left to the
    * optimizer (auto-broadcast at harness scale; at 100 TB AQE picks
    * a shuffle join for it — the plan degrades gracefully instead of
    * OOMing on a forced broadcast). The c_nationkey = s_nationkey
    * constraint is Q5's "local supplier" semantics. */
  val tpchQ5: Q = Q(
    "q_tpch_q5",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(c, o("o_custkey") === c("c_custkey") &&
          c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0)
          .cast("long")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("n_name").asc)
    },
    Some("""
      SELECT n_name,
             CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name
      ORDER BY revenue_cents DESC, n_name ASC"""))

  /** TPC-H-Q18-shaped HAVING over grouped sums: large-quantity orders
    * (per-order lineitem quantity sum > 300) joined back to customer.
    * The HAVING runs as a filter over a map-side-combinable aggregate
    * BEFORE the joins — the fact table collapses to qualifying
    * orderkeys first, so downstream joins see ~1% of the rows. */
  val tpchQ18: Q = Q(
    "q_tpch_q18",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val big = t(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      o.join(big, o("o_orderkey") === big("l_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), cents("o_totalprice").as("total_cents"),
          col("sum_qty"))
        .orderBy(col("total_cents").desc, col("o_orderkey").asc)
        .limit(100)
    },
    Some("""
      SELECT c_name, c_custkey, o_orderkey, o_orderdate,
             CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents, sum_qty
      FROM orders
      JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING sum(l_quantity) > 300) big
        ON o_orderkey = big.l_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY total_cents DESC, o_orderkey ASC
      LIMIT 100"""))

  /** CUBE grouping sets — all 4 subtotal combinations. */
  val cubeAgg: Q = Q(
    "q_cube",
    (s, dir) =>
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
    Some("""
      SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS cnt
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""))

  /** Correlated scalar subquery — Catalyst decorrelates it into a
    * left-outer aggregate join (no per-row re-execution; `.explain`
    * shows the rewritten join). The SQL surface is the point, so this
    * one goes through `spark.sql`. */
  val scalarSubquery: Q = Q(
    "q_scalar_subquery",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""
        SELECT c_custkey,
               CAST((SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS BIGINT) AS order_cnt,
               (SELECT CAST(max(round(o_totalprice * 100)) AS BIGINT)
                FROM orders WHERE o_custkey = c_custkey) AS max_cents
        FROM customer ORDER BY c_custkey""")
    },
    Some("""
      SELECT c_custkey,
             CAST((SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS BIGINT) AS order_cnt,
             (SELECT CAST(max(round(o_totalprice * 100)) AS BIGINT)
              FROM orders WHERE o_custkey = c_custkey) AS max_cents
      FROM customer ORDER BY c_custkey"""))

  /** Pivot — per-status counts spread across priority columns. The
    * oracle spells it as portable conditional aggregation; Spark's
    * `pivot` names result columns by value, matched with quoted
    * aliases. */
  val pivotAgg: Q = Q(
    "q_pivot",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("o_orderstatus"),
    Some("""
      SELECT o_orderstatus,
             CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS "1-URGENT",
             CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS "2-HIGH",
             CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS "3-MEDIUM",
             CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS "4-NOT SPECIFIED",
             CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS "5-LOW"
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Explicit GROUPING SETS with grouping() flags — the flags
    * disambiguate subtotal-produced nulls from real nulls, which the
    * plain rollup/cube queries cannot; also pins deterministic
    * ordering across the mixed null pattern. Through spark.sql (the
    * SQL surface is the natural home for grouping sets). */
  val groupingSets: Q = Q(
    "q_grouping_sets",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
               CAST(count(*) AS BIGINT) AS cnt
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_priority,
                 o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
    },
    Some("""
      SELECT o_orderstatus, o_orderpriority,
             CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
             CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY g_status, g_priority,
               o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""))

  /** Grouped top-k via the bounded-heap [[graft.functions.TopKAgg]]
    * typed aggregate — the scalable alternative to `q_window_topn`'s
    * `row_number() <= k` formulation. The window form shuffles every
    * row and sorts each key partition; the aggregate form keeps ≤ k
    * rows per key per task map-side and shuffles only those (the
    * grouped analog of TakeOrderedAndProject's per-partition heaps).
    * Same answer, hash-checked against the window oracle; the
    * equivalence on adversarial tie distributions is property-tested
    * in PropertySpec. */
  val topkPerKey: Q = Q(
    "q_topk_per_key",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(graft.functions.TopKAgg(cents("o_totalprice"), col("o_orderkey"), 3).as("top"))
        .select(col("o_orderpriority"), posexplode(col("top")))
        .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rank"),
          col("col.sort_key").as("total_cents"), col("col.id").as("o_orderkey"))
        .orderBy("o_orderpriority", "rank"),
    Some("""
      SELECT o_orderpriority, CAST(rn AS BIGINT) AS rank, total_cents, o_orderkey
      FROM (
        SELECT o_orderpriority,
               CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
               o_orderkey,
               row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                             o_orderkey ASC) AS rn
        FROM orders)
      WHERE rn <= 3
      ORDER BY o_orderpriority, rank"""))

  val all: Seq[Q] = Seq(
    groupAgg, joinAgg, semiJoin, antiJoin, windowTopN,
    intersectKeys, exceptKeys, distinctPairs, rollupAgg, distinctCount,
    approxDistinct, tpchQ1, tpchQ3, tpchQ5, tpchQ18, cubeAgg, scalarSubquery, unpivotParts,
    pivotAgg, groupingSets, topkPerKey)
}
