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
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_lineitem_zorder"
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

  val all: Seq[Q] = Seq(zorderLayout)
}
