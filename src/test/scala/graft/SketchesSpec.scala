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
}
