package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{Q, Tables}

/** SQL entry point (reference E3, `run_athena_query`
  * `lambda_function.py:173-203`): the reference ships its final query
  * as ANSI SQL text to Athena; here the same text runs through
  * `spark.sql` over catalog-registered views — parse → analyze →
  * optimize → execute inside the one SparkSession, no remote engine,
  * no polling loop.
  *
  * The query text is the flagship E3 SQL transplanted onto the
  * corpus (same shape as [[Parity.recencyTopK]], built declaratively
  * there, as SQL text here) — Catalyst plans both identically:
  * parquet scan with pushed CASE filter → TakeOrderedAndProject. */
object Sql {

  /** Register the named corpus tables as temp views (S4: the catalog
    * IS the crawler). Each registration costs a parquet footer read,
    * so callers name only the tables their statement uses. */
  def register(spark: SparkSession, dir: String, tables: String*): Unit =
    tables.foreach { t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }

  /** Register every corpus table — the interactive-session surface
    * (a user exploring via `spark.sql` wants the whole catalog). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    register(spark, dir, Tables.all: _*)

  val FlagshipSql: String = s"""
    SELECT o_orderkey, o_orderpriority, o_orderdate, o_orderstatus, recency_score
    FROM (
      SELECT *, CAST(CASE WHEN d <= 30 THEN 5 WHEN d <= 90 THEN 4
                          WHEN d <= 180 THEN 3 WHEN d <= 365 THEN 2
                          ELSE 1 END AS BIGINT) AS recency_score
      FROM (SELECT *, datediff(DATE '${Recency.AsOf}', CAST(o_orderdate AS DATE)) AS d
            FROM orders)
    )
    WHERE recency_score >= 4
    ORDER BY o_orderdate DESC, o_orderkey DESC
    LIMIT 10"""

  /** E3 through the SQL surface. The oracle is the DuckDB dialect of
    * the same statement (datediff argument order differs). */
  val sqlFlagship: Q = Q(
    "q_sql_flagship",
    (s, dir) => {
      register(s, dir, "orders")
      s.sql(FlagshipSql)
    },
    Some(s"""
      SELECT o_orderkey, o_orderpriority, o_orderdate, o_orderstatus, recency_score
      FROM (
        SELECT *, CAST(CASE WHEN d <= 30 THEN 5 WHEN d <= 90 THEN 4
                            WHEN d <= 180 THEN 3 WHEN d <= 365 THEN 2
                            ELSE 1 END AS BIGINT) AS recency_score
        FROM (SELECT *, date_diff('day', CAST(o_orderdate AS DATE), DATE '${Recency.AsOf}') AS d
              FROM orders)
      )
      WHERE recency_score >= 4
      ORDER BY o_orderdate DESC, o_orderkey DESC
      LIMIT 10"""))

  /** Correlated LATERAL subquery through the SQL surface: top-3
    * orders per BUILDING-segment customer, written the way an
    * analyst writes it — `FROM customer, LATERAL (SELECT ... WHERE
    * o_custkey = c_custkey ORDER BY ... LIMIT 3)` — and left to the
    * optimizer. Catalyst DECORRELATES the lateral into a ranked
    * window over a hash join (DuckDB plans the same shape), so the
    * per-row subquery the text describes never executes per row:
    * at 100 TB this is one shuffle on the join key plus a bounded
    * per-key sort, not O(customers) subplans. The per-group LIMIT
    * inside a lateral is the SQL idiom the window-function spelling
    * (`q_window_topn`) expresses relationally — declaring BOTH
    * surfaces and hash-matching them against the same engine pins
    * that the dialect intersection really is one semantics. */
  val lateralTopK: Q = Q(
    "q_lateral_topk",
    (s, dir) => {
      register(s, dir, "customer", "orders")
      s.sql("""
        SELECT c.c_custkey, t.o_orderkey,
               CAST(round(t.o_totalprice * 100) AS BIGINT) AS price_cents
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 3) t
        WHERE c.c_mktsegment = 'BUILDING'
        ORDER BY c.c_custkey, price_cents DESC, t.o_orderkey""")
    },
    Some("""
      SELECT c.c_custkey, t.o_orderkey,
             CAST(round(t.o_totalprice * 100) AS BIGINT) AS price_cents
      FROM customer c,
      LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
               WHERE o.o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 3) t
      WHERE c.c_mktsegment = 'BUILDING'
      ORDER BY c.c_custkey, price_cents DESC, t.o_orderkey"""))

  val all: Seq[Q] = Seq(sqlFlagship, lateralTopK)
}
