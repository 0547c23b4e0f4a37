package graft

import org.apache.spark.sql.functions._

/** DP noisy counts + k-anonymity audit invariants beyond the oracle
  * hash. */
class PrivacySpec extends SparkSpec {

  test("dp counts: noise is bounded, nonzero somewhere, and deterministic") {
    val run1 = SparkEntry.queries("q_dp_counts")(spark, sf001)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val run2 = SparkEntry.queries("q_dp_counts")(spark, sf001)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(run1.toSeq == run2.toSeq, "noise draw must be deterministic")
    // |Laplace⁻¹(u)| ≤ ln(2·65536) at the 16-bit draw's extremes
    val bound = (math.log(2 * 65536.0) * 1e6).toLong + 1
    run1.foreach { case (_, _, t, noisy) =>
      val noise = noisy - t * 1000000L
      assert(math.abs(noise) <= bound, s"noise $noise exceeds inverse-CDF bound")
    }
    assert(run1.count { case (_, _, t, noisy) => noisy != t * 1000000L } > run1.length / 2,
      "most cells should carry nonzero noise")
  }

  test("k-anonymity: suppression flag is exactly class_n < 10, classes tile the table") {
    val out = SparkEntry.queries("q_k_anonymity")(spark, sf001).collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    assert(out.forall { case (n, s) => (n < 10) == (s == 1L) })
    val total = out.map(_._1).sum
    assert(total == Tables.load(spark, sf001, "customer").count())
  }
}
