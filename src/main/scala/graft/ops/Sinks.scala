package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode}

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
  def bucketedTable(df: DataFrame, name: String, buckets: Int, key: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(name)
}
