package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * Scale note: each table is a plain parquet directory/file scan —
  * Spark's vectorized parquet reader splits it by
  * `spark.sql.files.maxPartitionBytes`, so the same code paths run
  * unchanged on a 1000-executor cluster over 100 TB: filters and
  * column pruning declared downstream reach the scan
  * (`PushedFilters` / `ReadSchema` in `.explain`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark's reader
    // rejects; read nanos as long and truncate to micros — the same
    // truncation DuckDB applies, so oracle comparisons stay exact.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" &&
      df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }
}

/** Per-application staging paths: every scratch directory an operator
  * writes carries the applicationId, so two harness runs on the same
  * machine can never clobber each other's staging (each Spark app has
  * a unique id; within one app, reuse across queries is intended —
  * overwrite mode refreshes the content). */
object Staging {
  def dir(s: SparkSession, name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/${name}_${s.sparkContext.applicationId}"
}

/** One registered query: Spark builder + optional DuckDB oracle SQL.
  *
  * Determinism contract (SURVEY.md §5): pinned as-of dates (never
  * `current_date()`), total ordering via unique tiebreaker keys, and
  * SQL restricted to the Spark∩DuckDB ANSI intersection. Computed
  * integer columns are cast to BIGINT on BOTH sides so the driver's
  * hash compare sees identical physical types.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
