package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.ZOrderValue

/** Multi-dimensional data layout: Z-order clustering of a write so
  * 2-D box predicates prune row groups / files on either predicate
  * column. Complements [[Sinks.partitionedParquet]] (1-D directory
  * pruning) and [[Sinks.bucketedTable]] (join co-location) as the
  * third layout tool of the 100 TB kit.
  */
object Layout {

  /** Write `df` clustered by the Z-order of two key columns:
    * range-partition on the Morton value (each output file owns a
    * contiguous Z-range ≈ a tile in key space), sort within
    * partitions so row groups inside each file are tiles too. The
    * layout changes WHERE rows land, never WHAT they are — readers
    * need no knowledge of it; they just observe tighter min/max
    * stats. */
  def zorderWrite(df: DataFrame, colA: org.apache.spark.sql.Column,
      colB: org.apache.spark.sql.Column, path: String, numFiles: Int): Unit = {
    val z = ZOrderValue(colA.cast("long"), colB.cast("long"))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Driver query: lineitem Z-ordered on (l_partkey, l_suppkey), read
    * back through a 2-D box predicate and aggregated. The result is
    * layout-INVARIANT — the oracle runs the same box aggregate on the
    * original table — so the hash proves the clustered write is
    * lossless; the layout's pruning effect (per-file key ranges
    * tighten vs a linear sort) is pinned separately in LayoutSpec,
    * and the box filter itself still pushes to the scan
    * (PushedFilters on both columns) where the Z-layout turns it
    * into row-group skips. */
  val zorderLayout: Q = Q(
    "q_zorder_layout",
    (s: SparkSession, dir: String) => {
      val out = graft.Staging.dir(s, "graft_lineitem_zorder")
      // suppkey's domain is ~20× narrower than partkey's — scale it up
      // so both dimensions contribute comparable bit positions to the
      // Morton value (raw widths would let partkey's high bits dominate
      // and degenerate the tiling toward a linear partkey sort)
      zorderWrite(Tables.load(s, dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"),
        col("l_partkey"), col("l_suppkey") * 20, out, 8)
      s.read.parquet(out)
        .filter(col("l_partkey") >= 100 && col("l_partkey") < 400 &&
          col("l_suppkey") >= 10 && col("l_suppkey") < 60)
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("price_cents"),
          sum(round(col("l_quantity") * 100, 0).cast("long")).as("qty_cents"))
        .orderBy("l_suppkey")
    },
    Some("""
      SELECT l_suppkey, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
             CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
      FROM lineitem
      WHERE l_partkey >= 100 AND l_partkey < 400
        AND l_suppkey >= 10 AND l_suppkey < 60
      GROUP BY l_suppkey ORDER BY l_suppkey"""))

  /** Small-file compaction: rewrite a fragmented directory into
    * size-targeted files. The silent killer of 100 TB pipelines is a
    * producer that emits per-task files (here simulated with a
    * 64-way write of one sf-table): every downstream scan pays file
    * listing, footer reads, and scheduler overhead per fragment.
    * Compaction = read → repartition(⌈bytes/target⌉) → rewrite; the
    * target count derives from actual input bytes, so the same code
    * yields one file here and thousands at scale. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val src = spark.read.parquet(inPath)
    // size via the Hadoop FileSystem API, not java.io.File — the
    // input may live on any scheme (s3a://, hdfs://, file:), and the
    // FS object is resolved per URI (Hadoop caches instances)
    val hconf = spark.sessionState.newHadoopConf()
    val bytes = src.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(hconf).getFileStatus(p).getLen
    }.sum
    val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    src.repartition(nOut).write.mode("overwrite").parquet(outPath)
    nOut
  }

  /** Driver query: fragment events 64 ways, compact, aggregate the
    * compacted copy against the oracle over the original table —
    * layout-invariant, so the hash proves compaction is lossless
    * (the file-count collapse itself is pinned in LayoutSpec). */
  val compactFiles: Q = Q(
    "q_compact_files",
    (s: SparkSession, dir: String) => {
      val fragged = graft.Staging.dir(s, "graft_events_fragmented")
      val compacted = graft.Staging.dir(s, "graft_events_compacted")
      Tables.load(s, dir, "events")
        .select("event_id", "event_type", "value")
        .repartition(64)
        .write.mode("overwrite").parquet(fragged)
      compact(s, fragged, compacted)
      s.read.parquet(compacted)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("value") * 100, 0).cast("long")).as("value_cents"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
             CAST(min(event_id) AS BIGINT) AS min_id,
             CAST(max(event_id) AS BIGINT) AS max_id
      FROM events GROUP BY event_type ORDER BY event_type"""))

  val all: Seq[Q] = Seq(zorderLayout, compactFiles)
}
