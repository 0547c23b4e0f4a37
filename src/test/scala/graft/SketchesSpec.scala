package graft

import org.apache.spark.sql.functions._

/** Sketch-operator invariants beyond the driver's bound-checked hash
  * (ops.Sketches). */
class SketchesSpec extends SparkSpec {

  test("CMS estimates never undercount any key (not just the top-10)") {
    val li = Tables.load(spark, sf001, "lineitem")
    val skBytes = li
      .select(expr("count_min_sketch(l_partkey, 0.001d, 0.99d, 42) AS sk"))
      .head().getAs[Array[Byte]]("sk")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))
    val exact = li.groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(exact.nonEmpty)
    exact.foreach { case (key, cnt) =>
      assert(cms.estimateCount(key) >= cnt,
        s"CMS undercounted key $key: ${cms.estimateCount(key)} < $cnt")
    }
  }

  test("merging per-shard HLL sketches == sketching the whole column") {
    val o = Tables.load(spark, sf001, "orders")
    val merged = o.groupBy("o_orderpriority")
      .agg(expr("hll_sketch_agg(o_custkey)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .head().getLong(0)
    val direct = o
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))").as("est"))
      .head().getLong(0)
    assert(merged == direct,
      s"sketch merge must be lossless vs direct sketching: $merged vs $direct")
    val exact = o.agg(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact <= 0.05,
      s"estimate $merged drifted >5% from exact $exact")
  }

  test("bloom prune: no false negatives, genuine pruning, result == plain join") {
    val dim = Tables.load(spark, sf001, "supplier")
      .filter(col("s_nationkey") === 3).select(col("s_suppkey"))
    val bf = dim.agg(graft.functions.BloomAgg
        .build(xxhash64(col("s_suppkey")), 1000L, 16384L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val li = Tables.load(spark, sf001, "lineitem").select(col("l_suppkey"))
    val total = li.count()
    val pass = li.filter(graft.functions.BloomAgg
      .mightContain(lit(bf), xxhash64(col("l_suppkey")))).count()
    val matched = li.join(dim, col("l_suppkey") === col("s_suppkey")).count()
    assert(pass >= matched, "a Bloom filter can never drop a true match")
    assert(pass < total, s"the filter must actually prune ($pass of $total passed)")
    // and the full query's exact confirming join erases false positives
    val got = ops.Sketches.bloomPrune.fn(spark, sf001)
      .agg(sum(col("n_lines"))).head().getLong(0)
    assert(got == matched)
  }
}
