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

  // --- Jensen–Shannon divergence on the event-type mix -----------------

  private def jsdOf(rows: Seq[(String, Long)]): Double = {
    val df = rows.toDF("event_type", "user_id")
    val out = Drift.jsd(df).collect()
    assert(out.nonEmpty)
    // jsd is a window total — identical on every row; assert that too
    val vals = out.map(_.getAs[Double]("jsd")).distinct
    assert(vals.length == 1, s"jsd differs across rows: ${vals.toSeq}")
    vals.head
  }

  test("jsd near zero when both cohorts share the same mix") {
    // even/odd user ids get identical type counts
    val rows = for {
      t <- Seq("a", "b", "c"); i <- 0 until 200
    } yield (t, i.toLong) // parity alternates evenly within each type
    val v = jsdOf(rows)
    assert(v >= 0.0 && v < 0.01, s"same-mix cohorts report jsd $v")
  }

  test("jsd approaches ln 2 on disjoint mixes and never exceeds it") {
    // cohort A (even ids) only sees type "x", cohort B only "y"
    val rows = (0 until 400).map(i =>
      (if (i % 2 == 0) "x" else "y", i.toLong))
    val v = jsdOf(rows)
    assert(v > 0.5 && v <= math.log(2.0) + 1e-9,
      s"disjoint-mix jsd out of (0.5, ln 2]: $v")
  }

  test("jsd is symmetric under cohort swap") {
    val skewed = (0 until 300).map { i =>
      val t = if (i % 2 == 0) { if (i % 3 == 0) "a" else "b" }
              else { if (i % 5 == 0) "a" else "c" }
      (t, i.toLong)
    }
    val swapped = skewed.map { case (t, id) => (t, id + 1) }
    val v1 = jsdOf(skewed)
    val v2 = jsdOf(swapped)
    assert(math.abs(v1 - v2) < 1e-9, s"asymmetric jsd: $v1 vs $v2")
    assert(v1 > 0.01, s"skewed mixes should register: $v1")
  }

  test("declared query: q_js_divergence sane on the harness corpus") {
    val rows = Drift.jsDivergence.fn(spark, sf001).collect()
    assert(rows.nonEmpty)
    val jsd = rows.head.getAs[Double]("jsd")
    assert(jsd >= 0.0 && jsd <= math.log(2.0) + 1e-9, s"jsd out of range: $jsd")
    // md5-free parity split of real traffic: mix should be near-identical
    assert(jsd < 0.05, s"parity cohorts of the same corpus drifted: $jsd")
  }

  test("wasserstein: identical cohorts give 0, a pure shift by d gives exactly d") {
    import spark.implicits._
    val a = (1 to 100).map(i => (i * 7L, true))
    val ident = (a ++ a.map { case (v, _) => (v, false) }).toDF("spend", "in_a")
    val r0 = graft.llm.Drift.w1(ident).head()
    assert(r0.getLong(2) == 0L && r0.getLong(3) == 0L, s"identical cohorts: $r0")
    val d = 250L
    val shifted = (a ++ a.map { case (v, _) => (v + d, false) }).toDF("spend", "in_a")
    val r1 = graft.llm.Drift.w1(shifted).head()
    assert(r1.getLong(3) == 1000L * d,
      s"pure shift must cost exactly the shift: ${r1.getLong(3)} vs ${1000L * d}")
  }
}
