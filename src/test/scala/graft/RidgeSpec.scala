package graft

import org.apache.spark.sql.functions._
import graft.llm.Ridge

/** Ridge closed form: the solver against hand-checkable systems, the
  * oracled query against an independently computed solution, and the
  * GramAgg variant's fit floor. */
class RidgeSpec extends SparkSpec {

  test("solve: known 3x3 system, pivoting path included") {
    // x = (1, -2, 3); first pivot forces a row swap (a00 = 0)
    val a = Array(
      Array(0.0, 2.0, 1.0),
      Array(4.0, 1.0, -1.0),
      Array(2.0, -3.0, 2.0))
    val x = Array(1.0, -2.0, 3.0)
    val b = a.map(row => row.zip(x).map { case (p, q) => p * q }.sum)
    val got = Ridge.solve(a, b)
    x.indices.foreach(i => assert(math.abs(got(i) - x(i)) < 1e-12,
      s"x($i) = ${got(i)}"))
    // singular matrix must throw, not return garbage
    val sing = Array(Array(1.0, 2.0), Array(2.0, 4.0))
    assertThrows[IllegalStateException](Ridge.solve(sing, Array(1.0, 1.0)))
  }

  test("q_ridge betas match an independent driver-side normal-equations solve") {
    val rows = Ridge.ridgeDocs.fn(spark, sf001).collect()
    assert(rows.length == 100)
    val b0 = rows.head.getAs[Long]("b0_micro")
    val b1 = rows.head.getAs[Long]("b1_micro")
    val b2 = rows.head.getAs[Long]("b2_micro")
    // recompute the moments straight off the table, solve with the
    // independent Gaussian-elimination path, compare micro-rounded
    val f = Tables.load(spark, sf001, "documents").select(
      col("n_chars").cast("double").as("x1"),
      expr("cast(length(text) - length(replace(text, ' ', '')) as double)").as("x2"),
      expr("cast(length(text) - length(replace(text, 'e', '')) as double)").as("y"))
    val m = f.agg(count(lit(1)).cast("double").as("n"),
      sum("x1").as("sx1"), sum("x2").as("sx2"), sum("y").as("sy"),
      sum(col("x1") * col("x1")).as("s11"), sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("y")).as("s1y"), sum(col("x2") * col("y")).as("s2y"))
      .head()
    val lam = 1000.0
    val a = Array(
      Array(m.getDouble(0) + lam, m.getDouble(1), m.getDouble(2)),
      Array(m.getDouble(1), m.getDouble(4) + lam, m.getDouble(5)),
      Array(m.getDouble(2), m.getDouble(5), m.getDouble(6) + lam))
    val c = Array(m.getDouble(3), m.getDouble(7), m.getDouble(8))
    val beta = Ridge.solve(a, c)
    // Cramer vs elimination differ in rounding path — micro agreement
    // to ±1 ulp of the rounded micro unit is the right bar
    assert(math.abs(beta(0) * 1e6 - b0) <= 1, s"b0: ${beta(0) * 1e6} vs $b0")
    assert(math.abs(beta(1) * 1e6 - b1) <= 1, s"b1: ${beta(1) * 1e6} vs $b1")
    assert(math.abs(beta(2) * 1e6 - b2) <= 1, s"b2: ${beta(2) * 1e6} vs $b2")
  }

  test("q_ridge predictions genuinely fit: SSE well under the mean baseline") {
    // evaluate the fitted line on ALL docs, not just the 100 emitted
    val rows = Ridge.ridgeDocs.fn(spark, sf001)
      .select(col("y").cast("double"),
        col("pred_micro").cast("double") / 1e6).collect()
    val (ys, ps) = (rows.map(_.getDouble(0)), rows.map(_.getDouble(1)))
    val mean = ys.sum / ys.length
    val sseMean = ys.map(v => (v - mean) * (v - mean)).sum
    val sse = ys.zip(ps).map { case (y, p) => (y - p) * (y - p) }.sum
    // 'e'-count tracks text length tightly; the fit must explain most variance
    assert(sse < 0.5 * sseMean, s"fit too weak: SSE $sse vs baseline $sseMean")
  }

  test("q_conformal: realized coverage sits near the 1-alpha target") {
    val r = Ridge.conformal.fn(spark, sf001).head()
    val nCal = r.getAs[Long]("n_cal")
    val qhat = r.getAs[Long]("qhat_micro")
    val nTest = r.getAs[Long]("n_test")
    val cov = r.getAs[Long]("coverage_permille")
    assert(nCal > 100 && nTest > 100, "folds must be populated")
    assert(qhat > 0, "zero-width interval means a degenerate residual set")
    // marginal guarantee is >= 900 in expectation; realized coverage
    // on a fixed dataset fluctuates — a collapse below 850 or a
    // vacuous 1000 both indicate a broken quantile
    assert(cov >= 850 && cov < 1000, s"coverage $cov out of the sane band")
  }

  test("q_ridge_embed: audits pass, output deterministic, SSE beats baseline") {
    val a = Ridge.ridgeEmbed.fn(spark, sf001).collect()
    val b = Ridge.ridgeEmbed.fn(spark, sf001).collect()
    assert(a.nonEmpty && a.toSeq == b.toSeq)
    // labels are 0..9 — predictions should land in a sane band around them
    val preds = a.map(_.getAs[Long]("pred_micro") / 1e6)
    assert(preds.forall(p => p > -20 && p < 30), "predictions off the label scale")
  }

  test("q_conformal_stratified: every stratum earns its own finite radius and sane coverage") {
    val rows = Ridge.conformalStratified.fn(spark, sf001).collect()
    assert(rows.length >= 2, "expected multiple lang strata")
    rows.foreach { r =>
      val lang = r.getAs[String]("lang")
      assert(r.getAs[Long]("qhat_micro") > 0, s"$lang degenerate radius")
      assert(r.getAs[Long]("n_cal") > 0 && r.getAs[Long]("n_test") > 0, lang)
      val cov = r.getAs[Long]("coverage_permille")
      // per-stratum guarantee is >= 900 in expectation; small strata
      // fluctuate more than the marginal test, so the band is wider
      assert(cov >= 750 && cov <= 1000, s"$lang coverage $cov out of band")
    }
    // stratification must actually differentiate: radii are per-group
    // order statistics of different residual sets
    assert(rows.map(_.getAs[Long]("qhat_micro")).distinct.length >= 2,
      "all strata produced one identical radius - stratification inert")
  }
}
