package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Sink surface (SURVEY.md §2a S2/S3/S6): parquet, CSV, and
  * partitioned-parquet writers.
  *
  * The reference writes one parquet file to local disk then uploads
  * it to S3 as a separate step (`lambda_function.py:120-128`); in
  * Spark the path IS the sink — `s3a://bucket/key` writes straight to
  * object storage from the executors, so S2+S3 collapse into one
  * call. S6 (Athena's CSV results) is `write.csv`.
  *
  * Scale notes: [[partitionedParquet]] is the 100 TB layout tool —
  * hive-style `partitionBy` directories give downstream readers
  * partition pruning (a date-filtered scan touches only matching
  * directories). Callers control file count via the upstream
  * partitioning; these helpers do not repartition, because the right
  * file size policy (`maxRecordsPerFile`, AQE coalescing) is a
  * session concern.
  */
object Sinks {

  /** S2/S3: snapshot-replace parquet write (the reference's
    * full-overwrite semantics at a fixed key, `:15,122`). */
  def parquetSnapshot(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** S2 at scale: partitioned layout for partition-pruned reads. */
  def partitionedParquet(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** S6: CSV result export (header on, like Athena result files). */
  def csvResults(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** S4: catalog registration — Spark's catalog replaces the Glue
    * crawler entirely (`:130-138`): the schema is already known. */
  def registerView(df: DataFrame, name: String): Unit =
    df.createOrReplaceTempView(name)

  /** Bucketed catalog table: the 100 TB co-located-join tool. Two
    * tables bucketed (and sorted) on the same key join with NO
    * exchange on either side — the shuffle is paid once at write
    * time and amortized over every subsequent join/aggregation on
    * that key. Verified by plan inspection in SinksSpec. */
  def bucketedTable(df: DataFrame, name: String, buckets: Int, key: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a fresh (in-memory) catalog forgets tables but the filesystem
    // keeps their directories; clear an orphaned location or
    // saveAsTable refuses with LOCATION_ALREADY_EXISTS
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    // Writer-side clustering: repartition by the bucket key into
    // exactly `buckets` partitions. Spark's bucket id is the same
    // Murmur3-hash pmod used by HashPartitioning, so each write task
    // then holds exactly one bucket and emits ONE file — without this
    // every upstream task writes a fragment per bucket it touches
    // (tasks × buckets small files, the classic bucketed-write
    // amplification).
    df.repartition(buckets, col(key))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(name)
  }

  /** Partition-pruning proof, end to end: events written hive-layout
    * partitioned by event date ([[partitionedParquet]]), read back
    * with a single-date filter, aggregated. The date filter resolves
    * against the directory layout — the scan lists ONE date directory
    * out of 30 (`PartitionFilters` in the plan, asserted in
    * PlanSpec), which is the 100 TB mechanism that turns a day-scoped
    * query over years of data into a 0.1% scan. The repartition by
    * event_date before the write yields one file per date directory
    * (writer-side clustering), not #tasks × #dates fragments.
    *
    * The oracle runs the same filter+aggregate over the ORIGINAL
    * unpartitioned table, so the round trip through the partitioned
    * layout is itself under hash check. */
  val partitionPruned: Q = Q(
    "q_partition_pruned",
    (s: SparkSession, dir: String) => {
      val out = graft.Staging.dir(s, "graft_events_by_date")
      val ev = Tables.load(s, dir, "events")
        .withColumn("event_date", to_date(col("ts")))
      partitionedParquet(ev.repartition(col("event_date")), out, "event_date")
      s.read.parquet(out)
        .filter(col("event_date") === lit(java.sql.Date.valueOf("2024-01-15")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
      FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'
      GROUP BY event_type ORDER BY event_type"""))

  /** Bucketed-table lifecycle under oracle check: orders and customer
    * written as 8-bucket tables on the customer key, then joined and
    * aggregated ON that key. Both the join and the per-customer
    * aggregation can consume the bucketing (zero added Exchange on
    * the sort-merge path — pinned in SinksSpec with broadcast off);
    * the oracle compares the result against a plain join+GROUP BY on
    * the raw parquet, so the write→catalog→read round trip is itself
    * hash-checked. At 100 TB this is the pay-the-shuffle-once layout
    * for any fact table repeatedly joined on one key. */
  val bucketedJoin: Q = Q(
    "q_bucketed_join",
    (s: SparkSession, dir: String) => {
      bucketedTable(Tables.load(s, dir, "orders"), "graft_orders_b", 8, "o_custkey")
      bucketedTable(Tables.load(s, dir, "customer"), "graft_customer_b", 8, "c_custkey")
      s.table("graft_orders_b")
        .join(s.table("graft_customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_mktsegment")
        .agg(count(lit(1)).as("order_cnt"),
          sum(round(col("o_totalprice") * 100, 0).cast("long")).as("revenue_cents"))
        .orderBy("c_custkey")
    },
    Some("""
      SELECT c_custkey, c_mktsegment, CAST(count(*) AS BIGINT) AS order_cnt,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey"""))

  /** ORC sink/source round trip under hash check: the supplier table
    * written as ORC (Spark's built-in alternative columnar format —
    * same vectorized reader and predicate-pushdown machinery as
    * parquet), read back with a pushed filter, aggregated, and
    * compared against the oracle computed on the ORIGINAL parquet
    * table — so the ORC write+read must be lossless for the hash to
    * match. */
  val orcRoundTrip: Q = Q(
    "q_orc_roundtrip",
    (s: SparkSession, dir: String) => {
      val out = graft.Staging.dir(s, "graft_supplier_orc")
      Tables.load(s, dir, "supplier").write.mode("overwrite").orc(out)
      s.read.orc(out)
        .filter(col("s_acctbal") > 0)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("s_acctbal") * 100, 0).cast("long")).as("bal_cents"))
        .orderBy("s_nationkey")
    },
    Some("""
      SELECT s_nationkey, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
      FROM supplier WHERE s_acctbal > 0
      GROUP BY s_nationkey ORDER BY s_nationkey"""))

  /** CSV sink/source round trip (S6 surface, promoted to an oracled
    * query): write `part` as headered CSV, read it back under an
    * EXPLICIT StructType (CSV carries no types — production always
    * declares the schema; inference is a second full scan and a
    * type-drift hazard), aggregate, and hash-compare against the
    * oracle over the ORIGINAL parquet — a lossless-round-trip proof.
    * Doubles survive because Spark writes the shortest
    * representation that parses back to the same IEEE value. */
  val csvRoundTrip: Q = Q(
    "q_csv_roundtrip",
    (s: SparkSession, dir: String) => {
      val out = graft.Staging.dir(s, "graft_part_csv")
      Tables.load(s, dir, "part").write.mode("overwrite")
        .option("header", "true").csv(out)
      s.read.schema(
          "p_partkey BIGINT, p_name STRING, p_brand STRING, p_type STRING, " +
            "p_size INT, p_retailprice DOUBLE")
        .option("header", "true").csv(out)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("cnt"),
          sum(col("p_size").cast("long")).as("size_sum"),
          sum(round(col("p_retailprice") * 100, 0).cast("long")).as("retail_cents"))
        .orderBy("p_brand")
    },
    Some("""
      SELECT p_brand, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CAST(p_size AS BIGINT)) AS BIGINT) AS size_sum,
             CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS retail_cents
      FROM part GROUP BY p_brand ORDER BY p_brand"""))

  /** JSON-lines sink/source round trip: write `customer` as JSON,
    * read back under an explicit schema (same rationale as CSV), and
    * hash-check an aggregate against the original table. JSON is the
    * interchange format of the reference's ingest side (S1/F12);
    * this proves the WRITE direction preserves values exactly. */
  val jsonRoundTrip: Q = Q(
    "q_json_roundtrip",
    (s: SparkSession, dir: String) => {
      val out = graft.Staging.dir(s, "graft_customer_json")
      Tables.load(s, dir, "customer").write.mode("overwrite").json(out)
      s.read.schema(
          "c_custkey BIGINT, c_name STRING, c_nationkey INT, " +
            "c_acctbal DOUBLE, c_mktsegment STRING")
        .json(out)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("c_acctbal") * 100, 0).cast("long")).as("bal_cents"),
          min(col("c_custkey")).as("min_key"))
        .orderBy("c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents,
             CAST(min(c_custkey) AS BIGINT) AS min_key
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Schema evolution across parquet generations: generation v1 wrote
    * 3 columns, generation v2 added `o_orderpriority` — the normal
    * life of any long-lived lake table. `mergeSchema` reconciles the
    * footers at read time and back-fills the missing column with
    * nulls for v1 rows, so old data keeps serving without a rewrite.
    * The aggregate pins exactly that: null-priority count == the v1
    * generation's row count, totals lossless across both generations.
    *
    * Scale note: mergeSchema footer reconciliation costs one metadata
    * pass over file footers (driver-side, proportional to file count,
    * not bytes) — on a 100 TB table you enable it per-read or declare
    * the merged schema in the catalog instead of rescanning. */
  val schemaEvolution: Q = Q(
    "q_schema_evolution",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"),
        col("o_orderpriority"))
      val out = graft.Staging.dir(s, "graft_orders_evolving")
      // generation 1: the schema before the column existed
      o.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_custkey", "cents")
        .write.mode("overwrite").parquet(s"$out/gen=1")
      // generation 2: the widened schema
      o.filter(col("o_orderkey") % 2 === 1)
        .write.mode("overwrite").parquet(s"$out/gen=2")
      s.read.option("mergeSchema", "true").parquet(out)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("o_orderpriority").isNull, 1L).otherwise(0L)).as("n_legacy"),
          sum(col("cents")).as("total_cents"),
          max(col("o_orderpriority")).as("max_priority"))
        .orderBy("o_custkey")
    },
    Some("""
      SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_legacy,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
             max(CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END) AS max_priority
      FROM orders GROUP BY o_custkey ORDER BY o_custkey"""))

  val all: Seq[Q] = Seq(partitionPruned, bucketedJoin, orcRoundTrip,
    csvRoundTrip, jsonRoundTrip, schemaEvolution)
}
