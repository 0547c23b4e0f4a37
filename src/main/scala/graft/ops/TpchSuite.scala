package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** TPC-H-shaped breadth beyond Q1/Q3/Q5/Q18 (ops/Relational): the
  * remaining canonical plan shapes an analytics engine must get right
  * — pushed-filter scan-agg (Q6), EXISTS decorrelation (Q4),
  * fact-fact-dim top-k (Q10), conditional aggregation (Q12), and a
  * two-sum ratio over a selective join (Q14).
  *
  * Queries reference the TPC-H numbers they are shaped after; where
  * the synthetic schema lacks a column (l_commitdate / l_receiptdate /
  * l_shipmode), the predicate is adapted but the PLAN SHAPE under
  * test — semi-join existence check, CASE-sum pivot — is preserved.
  * Money arithmetic follows the repo-wide exact-cents discipline so
  * every aggregate hash-matches DuckDB bit-for-bit.
  */
object TpchSuite {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Q6: the pure scan-aggregate — every predicate pushes to the
    * parquet scan (PushedFilters shows all four), zero shuffle before
    * the single-row partial+final aggregate. The canonical "is the
    * scan doing the work" probe: at 100 TB this query is I/O-bound or
    * it is wrong. */
  val q6: Q = Q(
    "q_tpch_q6",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(cents(col("l_extendedprice") * col("l_discount"))).as("revenue_cents"),
          count(lit(1)).as("n_rows")),
    Some("""
      SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24"""))

  /** Q4-shaped order-priority check: orders in a quarter that have at
    * least one late-shipping lineitem (adapted existence predicate:
    * l_shipdate > o_orderdate stands in for commitdate < receiptdate,
    * which the synthetic schema lacks). The EXISTS lowers to a LEFT
    * SEMI hash join on orderkey with the non-equi conjunct as a join
    * filter — the fact table never duplicates rows into the
    * aggregate, which is the property Q4 exists to test. */
  val q4: Q = Q(
    "q_tpch_q4",
    (s, dir) => {
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""))

  /** Q10: returned-item revenue, top 20 customers. Join order chosen
    * for scale: the returnflag filter prunes lineitem at the scan,
    * lineitem ⋈ orders is the one fact-fact shuffle, customer joins
    * the ~quarter-filtered result (auto-broadcast at harness scale,
    * AQE-shuffled when customer outgrows the threshold), nation is an
    * explicit broadcast. Top-20 is TakeOrderedAndProject. */
  val q10: Q = Q(
    "q_tpch_q10",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"), col("c_mktsegment"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("c_custkey").asc)
        .limit(20)
    },
    Some("""
      SELECT c_custkey, c_name, n_name, c_mktsegment,
             CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY c_custkey, c_name, n_name, c_mktsegment
      ORDER BY revenue_cents DESC, c_custkey ASC
      LIMIT 20"""))

  /** Q12-shaped conditional aggregation: one pass over the
    * shipdate-windowed join, priority classes pivoted into two
    * CASE-sums per group (l_linestatus stands in for the missing
    * l_shipmode as the grouping column). Both sums ride the same
    * map-side-combinable aggregate — no second scan, no join
    * duplication. */
  val q12: Q = Q(
    "q_tpch_q12",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      val high = col("o_orderpriority") === "1-URGENT" ||
        col("o_orderpriority") === "2-HIGH"
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_linestatus")
    },
    Some("""
      SELECT l_linestatus,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_linestatus
      ORDER BY l_linestatus"""))

  /** Q14: promo revenue share — two exact-cents sums over one
    * month-windowed lineitem ⋈ part join (part broadcast: it's a dim),
    * ratio computed once from the exact integers so the double is
    * bit-identical across engines. */
  val q14: Q = Q(
    "q_tpch_q14",
    (s, dir) => {
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .agg(
          sum(when(col("p_type").startsWith("PROMO"),
            cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .otherwise(0L)).as("promo_cents"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("total_cents"))
        .select(col("promo_cents"), col("total_cents"),
          (col("promo_cents").cast("double") * 100.0 /
            col("total_cents").cast("double")).as("promo_pct"))
    },
    Some("""
      SELECT CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                           THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS promo_cents,
             CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents,
             CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                           THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
                           ELSE 0 END) AS DOUBLE) * 100.0 /
               CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) AS promo_pct
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'"""))

  /** Q19: the disjunctive (OR-of-ANDs) predicate join. The equi-key
    * (partkey) must still drive a hash join with the disjunction as a
    * post-join filter — a planner that degrades to a nested-loop over
    * the OR branches is wrong at any scale. Each branch pairs a part
    * attribute with a lineitem attribute, so neither side can
    * evaluate the disjunction alone. */
  val q19: Q = Q(
    "q_tpch_q19",
    (s, dir) => {
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem")
      val branch1 = col("p_brand") === "Brand#12" &&
        col("p_size").between(1, 5) && col("l_quantity").between(1, 11)
      val branch2 = col("p_brand") === "Brand#23" &&
        col("p_size").between(1, 10) && col("l_quantity").between(10, 20)
      val branch3 = col("p_brand") === "Brand#34" &&
        col("p_size").between(1, 15) && col("l_quantity").between(20, 30)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .filter(branch1 || branch2 || branch3)
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_cents"),
          count(lit(1)).as("n_rows"))
    },
    Some("""
      SELECT CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"""))

  /** Q15-shaped top supplier: quarterly revenue per supplier, keep
    * the supplier(s) achieving the maximum — an aggregate compared
    * against the aggregate-of-the-aggregate. The max is a 1-row
    * broadcast against the revenue table (computed once, not per
    * row); exact-cents revenue makes the equality portable. */
  val q15: Q = Q(
    "q_tpch_q15",
    (s, dir) => {
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("total_rev_cents"))
      val top = rev.agg(max(col("total_rev_cents")).as("max_rev"))
      val su = t(s, dir, "supplier")
      rev.join(broadcast(top), col("total_rev_cents") === col("max_rev"))
        .join(su, col("l_suppkey") === su("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev_cents"))
        .orderBy("s_suppkey")
    },
    Some("""
      WITH rev AS (
        SELECT l_suppkey,
               CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_rev_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_rev_cents
      FROM rev JOIN supplier ON l_suppkey = s_suppkey
      WHERE total_rev_cents = (SELECT max(total_rev_cents) FROM rev)
      ORDER BY s_suppkey"""))

  /** Q22-shaped: above-average customers with no orders, per nation.
    * The average comparison is CROSS-MULTIPLIED into pure integer
    * arithmetic (bal_cents · n > total_cents, both BIGINT) so no
    * division-derived double ever enters the hash — the portable way
    * to compare against a mean exactly. The no-orders test is a LEFT
    * ANTI join on custkey; the global (n, total) pair is a 1-row
    * broadcast. */
  val q22: Q = Q(
    "q_tpch_q22",
    (s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          cents(col("c_acctbal")).as("bal_cents"))
      val pos = c.filter(col("bal_cents") > 0)
        .agg(count(lit(1)).as("n_pos"), sum(col("bal_cents")).as("total_cents"))
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
      c.crossJoin(broadcast(pos))
        .filter(col("bal_cents") * col("n_pos") > col("total_cents"))
        .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"), sum(col("bal_cents")).as("sum_bal_cents"))
        .orderBy("c_nationkey")
    },
    Some("""
      WITH c AS (
        SELECT c_custkey, c_nationkey,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        FROM customer),
      pos AS (
        SELECT CAST(count(*) AS BIGINT) AS n_pos,
               CAST(sum(bal_cents) AS BIGINT) AS total_cents
        FROM c WHERE bal_cents > 0)
      SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
             CAST(sum(bal_cents) AS BIGINT) AS sum_bal_cents
      FROM c, pos
      WHERE bal_cents * n_pos > total_cents
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
      GROUP BY c_nationkey ORDER BY c_nationkey"""))

  /** Q17: small-quantity-order revenue — each lineitem compares
    * against 20% of ITS PART's average quantity. The correlated
    * aggregate decorrelates into a per-part (count, sum) join, and
    * the `qty < 0.2·avg` comparison cross-multiplies into pure
    * BIGINT arithmetic (`5·qty·cnt < sum_qty`, all exact cents —
    * same no-division discipline as Q22). avg_yearly divides the
    * exact total once at the end. */
  val q17: Q = Q(
    "q_tpch_q17",
    (s, dir) => {
      val l = t(s, dir, "lineitem")
      val p = t(s, dir, "part").filter(col("p_brand") === "Brand#23")
      val perPart = l.groupBy(col("l_partkey").as("pp_partkey"))
        .agg(count(lit(1)).as("cnt"),
          sum(cents(col("l_quantity"))).as("sum_qty_cents"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(perPart, l("l_partkey") === col("pp_partkey"))
        .filter(cents(col("l_quantity")) * 5 * col("cnt") < col("sum_qty_cents"))
        .agg(sum(cents(col("l_extendedprice"))).as("total_cents"),
          count(lit(1)).as("n_rows"))
        .select(col("total_cents"), col("n_rows"),
          (col("total_cents").cast("double") / 7.0).as("avg_yearly_cents"))
    },
    Some("""
      WITH pp AS (
        SELECT l_partkey AS pp_partkey, CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents
        FROM lineitem GROUP BY l_partkey)
      SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 7.0 AS avg_yearly_cents
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN pp ON l_partkey = pp_partkey
      WHERE p_brand = 'Brand#23'
        AND CAST(round(l_quantity * 100) AS BIGINT) * 5 * cnt < sum_qty_cents"""))

  /** Q13: customer order-count distribution — LEFT OUTER join so
    * zero-order customers survive with count 0, then a second
    * aggregate histograms customers by order count. The double
    * aggregation (per-customer, then per-count) is the shape to get
    * right: both levels are map-side combinable and the second
    * input is already one row per customer. The join filter
    * (non-URGENT orders) must stay in the JOIN's ON clause — moving
    * it to WHERE would silently turn the outer join inner, which is
    * Q13's classic trap. */
  val q13: Q = Q(
    "q_tpch_q13",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
      val perCust = c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""
      SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey)
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC"""))

  /** Q7: bilateral shipping volume between two nations, by year. The
    * shape under test: a 4-way fact chain (lineitem–supplier,
    * lineitem–orders–customer) closed by TWO broadcast joins against
    * the same dim (nation, aliased per side) with a disjunctive
    * nation-pair predicate that neither side can evaluate alone. At
    * scale both nation joins are broadcasts, so the only shuffles are
    * the two fact-fact joins; the pair filter prunes before the
    * aggregate. Year extraction groups on a derived column without
    * breaking map-side combine. */
  val q7: Q = Q(
    "q_tpch_q7",
    (s, dir) => {
      val n1 = t(s, dir, "nation").select(col("n_nationkey").as("n1_key"),
        col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").select(col("n_nationkey").as("n2_key"),
        col("n_name").as("cust_nation"))
      val su = t(s, dir, "supplier")
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      val pair = (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1")
      l.join(su, l("l_suppkey") === su("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter(pair)
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some("""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
             CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      GROUP BY 1, 2, 3
      ORDER BY 1, 2, 3"""))

  /** Q8: national market share — the ratio of one nation's revenue to
    * all revenue per year, over a 6-table join (region restricts the
    * CUSTOMER side; the supplier side stays global so the conditional
    * numerator is decided per row by the supplier's nation). Both
    * numerator and denominator ride one aggregate as exact cents;
    * the share divides once at the end. region→nation→customer is a
    * broadcast chain — the region filter reaches the customer join
    * key without touching a fact shuffle. */
  val q8: Q = Q(
    "q_tpch_q8",
    (s, dir) => {
      val r = t(s, dir, "region").filter(col("r_name") === "EUROPE")
      val nCust = t(s, dir, "nation").select(col("n_nationkey").as("nc_key"),
        col("n_regionkey").as("nc_region"))
      val nSupp = t(s, dir, "nation").select(col("n_nationkey").as("ns_key"),
        col("n_name").as("supp_nation"))
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val p = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
      val vol = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(nCust), col("c_nationkey") === col("nc_key"))
        .join(broadcast(r), col("nc_region") === r("r_regionkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(nSupp), col("s_nationkey") === col("ns_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(sum(when(col("supp_nation") === "NATION_3", vol).otherwise(0L))
          .as("nation_cents"),
          sum(vol).as("total_cents"))
        .select(col("o_year"), col("nation_cents"), col("total_cents"),
          (col("nation_cents").cast("double") / col("total_cents").cast("double"))
            .as("mkt_share"))
        .orderBy("o_year")
    },
    Some("""
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             CAST(sum(CASE WHEN ns.n_name = 'NATION_3'
                           THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS nation_cents,
             CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS total_cents,
             CAST(sum(CASE WHEN ns.n_name = 'NATION_3'
                           THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
                           ELSE 0 END) AS DOUBLE) /
               CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) AS mkt_share
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation nc ON c_nationkey = nc.n_nationkey
      JOIN region ON nc.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ns ON s_nationkey = ns.n_nationkey
      WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY 1
      ORDER BY 1"""))

  /** Q9-shaped product-type profit by nation and year. The synthetic
    * schema has no partsupp, so supply cost is adapted to
    * 10% of p_retailprice per unit (reference Q9 uses
    * ps_supplycost·l_quantity); the PLAN SHAPE — a name-filtered part
    * dim broadcast into the fact, supplier nation resolved via two
    * more joins, profit aggregated by (nation, year) — is preserved.
    * Profit stays exact: both terms are rounded to cents BEFORE the
    * subtraction, so the Spark and DuckDB sums are bit-identical. */
  val q9: Q = Q(
    "q_tpch_q9",
    (s, dir) => {
      val p = t(s, dir, "part").filter(col("p_name").contains("gear"))
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      val profit = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) -
        cents(col("p_retailprice") * lit(0.1) * col("l_quantity"))
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .join(su, l("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === n("n_nationkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(sum(profit).as("profit_cents"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some("""
      SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
                      - CAST(round(p_retailprice * 0.1 * l_quantity * 100) AS BIGINT)) AS BIGINT) AS profit_cents
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      WHERE p_name LIKE '%gear%'
      GROUP BY 1, 2
      ORDER BY nation, o_year DESC"""))

  /** Q21-shaped waiting-supplier count: suppliers whose lineitem was
    * the ONLY late one in a multi-supplier finished order. Lateness is
    * adapted (shipped >30 days after order date — the schema lacks
    * commit/receipt dates) but the signature double self-join
    * survives: an EXISTS (some other supplier in the order → LEFT
    * SEMI on orderkey with suppkey≠ as join filter) stacked with a
    * NOT EXISTS (no OTHER late supplier → LEFT ANTI on the same key
    * shape). Both self-joins shuffle lineitem by orderkey once each;
    * neither duplicates fact rows into the aggregate. */
  val q21: Q = Q(
    "q_tpch_q21",
    (s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      val l = t(s, dir, "lineitem")
      val flagged = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .select(l("l_orderkey"), l("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("late"))
      val l1 = flagged.filter(col("late"))
        .select(col("l_orderkey").as("k1"), col("l_suppkey").as("s1"))
      val l2 = l.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
      val l3 = flagged.filter(col("late"))
        .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
      val su = t(s, dir, "supplier")
      l1.join(l2, col("k1") === col("k2") && col("s1") =!= col("s2"), "left_semi")
        .join(l3, col("k1") === col("k3") && col("s1") =!= col("s3"), "left_anti")
        .join(su, col("s1") === su("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey").asc)
        .limit(20)
    },
    Some("""
      WITH flagged AS (
        SELECT l_orderkey, l_suppkey,
               l_shipdate > o_orderdate + INTERVAL 30 DAY AS late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F')
      SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
      FROM flagged l1
      JOIN supplier ON l1.l_suppkey = s_suppkey
      WHERE l1.late
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM flagged l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.late)
      GROUP BY s_suppkey, s_name
      ORDER BY numwait DESC, s_suppkey ASC
      LIMIT 20"""))

  /** Q20-shaped excess-shipper list: suppliers that shipped MORE THAN
    * TWICE the per-supplier average quantity of some name-filtered
    * part in 1996 (the synthetic schema has no partsupp, so shipped
    * quantity stands in for stocked quantity; the reference's
    * availqty > ½·Σqty becomes qty·n_supp > 2·Σqty). The shape under
    * test: an EXISTS whose subject is itself an AGGREGATE over a
    * second aggregate's threshold — two stacked groupBys joined on
    * the part key, the comparison cross-multiplied into exact-cents
    * BIGINTs (the no-division discipline of Q17/Q22), and the
    * surviving (supp, part) pairs collapsed into a LEFT SEMI against
    * the supplier dim so no supplier row ever duplicates. */
  val q20: Q = Q(
    "q_tpch_q20",
    (s, dir) => {
      val p = t(s, dir, "part").filter(col("p_name").contains("gear"))
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(broadcast(p), col("l_partkey") === p("p_partkey"))
      val perSupp = l.groupBy(col("l_partkey").as("ps_part"), col("l_suppkey").as("ps_supp"))
        .agg(sum(cents(col("l_quantity"))).as("supp_qty_cents"))
      val perPart = perSupp.groupBy(col("ps_part").as("pp_part"))
        .agg(sum(col("supp_qty_cents")).as("part_qty_cents"),
          count(lit(1)).as("n_supp"))
      val excess = perSupp.join(perPart, col("ps_part") === col("pp_part"))
        .filter(col("supp_qty_cents") * col("n_supp") > col("part_qty_cents") * 2)
        .select(col("ps_supp"))
      val su = t(s, dir, "supplier")
      su.join(excess, su("s_suppkey") === col("ps_supp"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy("s_suppkey")
    },
    Some("""
      WITH l AS (
        SELECT l_partkey, l_suppkey, CAST(round(l_quantity * 100) AS BIGINT) AS qty_cents
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE '%gear%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'),
      per_supp AS (
        SELECT l_partkey AS ps_part, l_suppkey AS ps_supp,
               CAST(sum(qty_cents) AS BIGINT) AS supp_qty_cents
        FROM l GROUP BY 1, 2),
      per_part AS (
        SELECT ps_part AS pp_part, CAST(sum(supp_qty_cents) AS BIGINT) AS part_qty_cents,
               CAST(count(*) AS BIGINT) AS n_supp
        FROM per_supp GROUP BY 1)
      SELECT s_suppkey, s_name
      FROM supplier
      WHERE EXISTS (
        SELECT 1 FROM per_supp JOIN per_part ON ps_part = pp_part
        WHERE ps_supp = s_suppkey
          AND supp_qty_cents * n_supp > part_qty_cents * 2)
      ORDER BY s_suppkey"""))

  /** Q11-shaped important-part list: parts whose shipped value
    * exceeds a FRACTION OF THE GLOBAL TOTAL (reference Q11 uses
    * partsupp stock value; shipped lineitem value stands in). The
    * shape under test: HAVING compared against a scalar subquery of
    * the SAME aggregation — the global total must be computed once
    * (a 1-row broadcast against the per-part aggregate), never
    * per-group, and the threshold comparison cross-multiplies into
    * exact BIGINT arithmetic (value·20000 > total·11 — 1.1× the mean
    * share, splitting the part population ~1:2) so no
    * division-derived double enters the hash. */
  val q11: Q = Q(
    "q_tpch_q11",
    (s, dir) => {
      val perPart = t(s, dir, "lineitem")
        .groupBy("l_partkey")
        .agg(sum(cents(col("l_extendedprice"))).as("value_cents"))
      val total = perPart.agg(sum(col("value_cents")).as("total_cents"))
      perPart.crossJoin(broadcast(total))
        .filter(col("value_cents") * 20000 > col("total_cents") * 11)
        .select(col("l_partkey"), col("value_cents"))
        .orderBy(col("value_cents").desc, col("l_partkey").asc)
    },
    Some("""
      WITH per_part AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_cents
        FROM lineitem GROUP BY l_partkey)
      SELECT l_partkey, value_cents
      FROM per_part
      WHERE value_cents * 20000 > (SELECT sum(value_cents) FROM per_part) * 11
      ORDER BY value_cents DESC, l_partkey ASC"""))

  /** Q16-shaped supplier diversity count: distinct suppliers per
    * (brand, type, size) over the lineitem part-supplier relation
    * (the schema's stand-in for partsupp), EXCLUDING a blocklisted
    * supplier set via LEFT ANTI before the count. The shape: the
    * exclusion must anti-join the (part, supp) pairs BEFORE the
    * count-distinct aggregate (post-hoc subtraction can't know which
    * groups a blocked supplier touched), and count(DISTINCT) over the
    * deduplicated pair relation is two-phase — partial distinct on
    * (group, supp), then merge — so the shuffle carries pairs, not
    * lineitems. */
  val q16: Q = Q(
    "q_tpch_q16",
    (s, dir) => {
      val p = t(s, dir, "part").filter(col("p_size").isin(1, 5, 9, 13))
      val blocked = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("b_key"))
      val pairs = t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === p("p_partkey"))
        .select(col("p_brand"), col("p_type"), col("p_size"), col("l_suppkey"))
        .join(broadcast(blocked), col("l_suppkey") === col("b_key"), "left_anti")
      pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
          col("p_type").asc, col("p_size").asc)
    },
    Some("""
      SELECT p_brand, p_type, p_size,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_size IN (1, 5, 9, 13)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC"""))

  /** Q2-shaped minimum-cost supplier: for every size-filtered part,
    * the EUROPE supplier with the lowest total shipped cost for that
    * part (shipped lineitem cost stands in for ps_supplycost). The
    * signature shape: a correlated MIN over a dim-restricted
    * subquery, decorrelated into a per-part aggregate joined back on
    * (part, cost = min_cost) — the same equality-against-an-aggregate
    * discipline as Q15, but per group instead of global, and the
    * region restriction must apply INSIDE the min (a supplier outside
    * EUROPE must not set the floor). Ties on min cost keep all
    * achieving suppliers, exactly as the reference query does. */
  val q2: Q = Q(
    "q_tpch_q2",
    (s, dir) => {
      val p = t(s, dir, "part").filter(col("p_size") === 9)
      val r = t(s, dir, "region").filter(col("r_name") === "EUROPE")
      val n = t(s, dir, "nation")
      val su = t(s, dir, "supplier")
      val perPS = t(s, dir, "lineitem")
        .join(broadcast(p), col("l_partkey") === p("p_partkey"))
        .join(su, col("l_suppkey") === su("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("p_partkey").as("partkey"), col("s_suppkey").as("suppkey"),
          col("s_name"), col("n_name"), col("s_acctbal"))
        .agg(sum(cents(col("l_extendedprice"))).as("cost_cents"))
      val minPerPart = perPS.groupBy(col("partkey").as("m_part"))
        .agg(min(col("cost_cents")).as("min_cost"))
      perPS.join(minPerPart,
          col("partkey") === col("m_part") && col("cost_cents") === col("min_cost"))
        .select(col("partkey"), col("suppkey"), col("s_name"), col("n_name"),
          cents(col("s_acctbal")).as("bal_cents"), col("cost_cents"))
        .orderBy(col("bal_cents").desc, col("n_name").asc, col("s_name").asc,
          col("partkey").asc)
    },
    Some("""
      WITH per_ps AS (
        SELECT p_partkey AS partkey, s_suppkey AS suppkey, s_name, n_name, s_acctbal,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cost_cents
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE p_size = 9 AND r_name = 'EUROPE'
        GROUP BY 1, 2, 3, 4, 5),
      min_per_part AS (
        SELECT partkey AS m_part, CAST(min(cost_cents) AS BIGINT) AS min_cost
        FROM per_ps GROUP BY partkey)
      SELECT partkey, suppkey, s_name, n_name,
             CAST(round(s_acctbal * 100) AS BIGINT) AS bal_cents, cost_cents
      FROM per_ps JOIN min_per_part
        ON partkey = m_part AND cost_cents = min_cost
      ORDER BY bal_cents DESC, n_name ASC, s_name ASC, partkey ASC"""))

  val all: Seq[Q] =
    Seq(q2, q4, q6, q7, q8, q9, q10, q11, q12, q13, q14, q16, q19, q15, q17,
      q20, q21, q22)
}
