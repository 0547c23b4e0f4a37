package graft

import org.apache.spark.sql.functions._
import graft.llm.Drift

/** PSI drift monitoring: zero-ish on identically-distributed shards,
  * loud exactly on a planted shifted dimension, and always
  * non-negative (every (p−q)·ln(p/q) term has matching signs). */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("declared query: PSI non-negative, quiet on the harness corpus") {
    val rows = Drift.embeddingDrift.fn(spark, sf001).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L, s"negative psi_num at dim ${r.getLong(0)}")
      assert(r.getDouble(3) < 0.15,
        s"same-distribution shards report drift at dim ${r.getLong(0)}: $r")
    }
  }

  test("a planted shift on one dimension is the loudest by far") {
    // resolve each id's shard with the SAME expression the operator
    // uses, then give shard B a +5.0 shift on dim 0 only
    val ids = (0L until 800L).toDF("vec_id")
    val inA = ids.select(col("vec_id"), Drift.shardA.as("a")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val emb = (0L until 800L).map { i =>
      val base = Array.tabulate(4)(d => ((i * 7 + d * 13) % 19).toFloat / 19f)
      if (!inA(i)) base(0) += 5.0f
      (i, base.toSeq)
    }.toDF("vec_id", "embedding")
    val out = Drift.psi(emb, bins = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(0L) > 1.0, s"planted shift invisible: ${out(0L)}")
    (1L to 3L).foreach(d =>
      assert(out(d) < 0.15, s"phantom drift at dim $d: ${out(d)}"))
    assert(out(0L) > 10 * (1L to 3L).map(out).max)
  }

  test("psi is deterministic run to run") {
    val a = Drift.embeddingDrift.fn(spark, sf001).collect().toSeq
    val b = Drift.embeddingDrift.fn(spark, sf001).collect().toSeq
    assert(a == b)
  }
}
