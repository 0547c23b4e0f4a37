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

  val all: Seq[Q] = Seq(q4, q6, q10, q12, q14)
}
