package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Typed `Dataset[T]` surface — compile-time-checked row types via
  * case-class `Encoder`s, per the build brief ("Dataset[T] where type
  * safety helps; DataFrame where schema is dynamic").
  *
  * The engine's position, demonstrated here: typed FILTERS stay on
  * the optimized path when expressed as column predicates on a typed
  * Dataset (schema checked at compile time, no lambda serde), while
  * typed LAMBDAS (`ds.map(f)`) insert deserialize→JVM→serialize
  * boundaries that break codegen and column pruning — so the query
  * uses a typed Dataset for its shape guarantees and keeps every
  * transformation declarative. TypedApiSpec pins the semantic
  * equivalence of the lambda form; the declared query ships the
  * column form, which is what a 100 TB run must do.
  */
object TypedApi {

  /** The orders row type (timestamp as java.sql.Timestamp — the
    * external type Spark's encoder maps TimestampType to). */
  final case class OrderRow(
      o_orderkey: Long,
      o_custkey: Long,
      o_orderstatus: String,
      o_totalprice: Double,
      o_orderdate: java.sql.Timestamp,
      o_orderpriority: String)

  /** Compact per-status revenue summary type. */
  final case class StatusRevenue(o_orderstatus: String, n: Long, revenue_cents: Long)

  def orders(s: SparkSession, dir: String): Dataset[OrderRow] = {
    import s.implicits._
    Tables.load(s, dir, "orders").as[OrderRow]
  }

  /** Typed pipeline: Dataset[OrderRow] → filter → typed aggregate to
    * Dataset[StatusRevenue]. Every step is columnar-declarative, so
    * the plan is identical to the DataFrame form (filters push to the
    * scan; the encoder only validates the schema at compile/bind
    * time). */
  def revenueByStatus(ds: Dataset[OrderRow]): Dataset[StatusRevenue] = {
    import ds.sparkSession.implicits._
    ds.filter(col("o_totalprice") > 1000.0)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("revenue_cents"))
      .as[StatusRevenue]
  }

  val typedPipeline: Q = Q(
    "q_typed_pipeline",
    (s, dir) =>
      revenueByStatus(orders(s, dir)).toDF()
        .orderBy("o_orderstatus"),
    Some("""
      SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM orders WHERE o_totalprice > 1000.0
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  val all: Seq[Q] = Seq(typedPipeline)
}
