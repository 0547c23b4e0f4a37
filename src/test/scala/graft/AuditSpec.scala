package graft

import org.apache.spark.sql.functions._
import graft.llm.{Drift, Events, Retrieval}
import graft.ops.{FuzzyJoin, Profile}

/** Value-level pins for the audit/eval operator family added in
  * round 11b: KS drift, permutation test, Benford, sorted-neighborhood
  * ER, and MRR. Each test asserts a property the DuckDB hash oracle
  * cannot express on its own (sensitivity to planted effects,
  * internal consistency between columns, determinism). */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  // ---- KS drift -------------------------------------------------

  test("KS: identical cohorts do not drift; a planted shift does") {
    // same spend distribution in both cohorts → D small, no flag
    val same = (0L until 600L).map(i => (i % 100 * 10, i % 2 == 0))
      .toDF("spend", "in_a")
    val quiet = Drift.ks(same).collect().head
    assert(!quiet.getBoolean(4), s"identical cohorts flagged: $quiet")

    // cohort B shifted +500 on every user → D = n (CDFs disjoint)
    val shifted = (0L until 600L)
      .map(i => (i % 100 * 10 + (if (i % 2 == 0) 0 else 5000), i % 2 == 0))
      .toDF("spend", "in_a")
    val loud = Drift.ks(shifted).collect().head
    assert(loud.getBoolean(4), s"disjoint cohorts not flagged: $loud")
    // fully disjoint supports: |F1-F2| reaches 1 → d_num = n1*n2
    assert(loud.getLong(2) == loud.getLong(0) * loud.getLong(1), loud.toString)
    assert(loud.getLong(3) == 1000000L, loud.toString)
  }

  test("KS driver query: one row, consistent ppm arithmetic") {
    val r = Drift.ksDrift.fn(spark, sf001).collect()
    assert(r.length == 1)
    val row = r.head
    val (n1, n2, d) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(d >= 0 && d <= n1 * n2)
    assert(row.getLong(3) == d * 1000000L / (n1 * n2))
  }

  // ---- permutation test -----------------------------------------

  test("permutation test: 64 rows, partitions cover all users, deterministic") {
    val rows = Events.permutationTest.fn(spark, sf001).collect()
    assert(rows.length == 64)
    val users = rows.map(r => r.getLong(1) + r.getLong(2)).distinct
    assert(users.length == 1, s"permutations saw different user totals: ${users.toSeq}")
    val again = Events.permutationTest.fn(spark, sf001).collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("permutation test: a null effect is not significant") {
    // cohort assignment is user parity but spend is IDENTICAL per
    // user id pair construction → observed gap 0 → every permutation
    // trivially ≥ observed (p-value 1, the correct null verdict)
    val users = (0L until 400L).map(i => (i, 1000L)).toDF("user_id", "spend")
    val obs = users
      .agg(sum(when(col("user_id") % 2 === 0, col("spend")).otherwise(0L)).as("s1"),
        count(when(col("user_id") % 2 === 0, 1)).as("n1"),
        sum(when(col("user_id") % 2 =!= 0, col("spend")).otherwise(0L)).as("s2"),
        count(when(col("user_id") % 2 =!= 0, 1)).as("n2"))
      .collect().head
    assert(obs.getLong(0) * obs.getLong(3) == obs.getLong(2) * obs.getLong(1))
  }

  // ---- Benford --------------------------------------------------

  test("benford: digits 1-9, shares sum to ~1e6, counts sum to n") {
    val rows = Profile.benford.fn(spark, sf001).collect()
    val digits = rows.map(_.getInt(0)).toSeq
    assert(digits.forall(d => d >= 1 && d <= 9), digits.toString)
    assert(digits == digits.sorted && digits.distinct == digits)
    // obs_micro uses BIGINT floor division: sum is ≤ 1e6, within 9
    val shareSum = rows.map(_.getLong(2)).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - 9, shareSum.toString)
    rows.foreach { r =>
      assert(r.getLong(4) == math.abs(r.getLong(2) - r.getLong(3)), r.toString)
    }
  }

  test("benford: a genuinely logarithmic sample passes the audit") {
    // powers of a multiplicative process follow Benford closely:
    // spend_i = floor(10^(frac(i*phi)*3)) over 3 decades
    val phi = (math.sqrt(5.0) - 1) / 2
    val vals = (1 to 5000).map { i =>
      val f = (i * phi) % 1.0
      math.pow(10.0, 2 + f * 3).toLong
    }
    val df = vals.toDF("cents")
      .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("obs"))
    val obs = df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = obs.values.sum.toDouble
    val exp = Map(1 -> 0.30103, 2 -> 0.17609, 3 -> 0.12494, 4 -> 0.09691,
      5 -> 0.07918, 6 -> 0.06695, 7 -> 0.05799, 8 -> 0.05115, 9 -> 0.04576)
    exp.foreach { case (d, p) =>
      val share = obs.getOrElse(d, 0L) / n
      assert(math.abs(share - p) < 0.02, s"digit $d: $share vs $p")
    }
  }

  // ---- sorted-neighborhood ER -----------------------------------

  test("sorted neighborhood: pairs respect the window and distance bound") {
    val rows = FuzzyJoin.sortedNeighborhood.fn(spark, sf001).collect()
    assert(rows.nonEmpty, "no candidate pairs at all")
    rows.foreach { r =>
      assert(r.getLong(4) >= 1 && r.getLong(4) <= 4, r.toString)
      assert(r.getInt(5) <= 1, r.toString)
      assert(r.getLong(0) != r.getLong(1), r.toString)
    }
    // suffix-sorted neighbors: keys 1000 apart share the reversed
    // prefix, so at least one cross-thousand match must surface
    assert(rows.exists(r => math.abs(r.getLong(0) - r.getLong(1)) >= 100),
      "sort key failed to bring distant keys together")
  }

  test("sorted neighborhood: candidate count is hard-bounded by w*n") {
    val n = Tables.load(spark, sf001, "customer").count()
    val pairs = FuzzyJoin.sortedNeighborhood.fn(spark, sf001).count()
    assert(pairs <= 4 * n, s"$pairs pairs exceeds w*n = ${4 * n}")
  }

  // ---- MRR ------------------------------------------------------

  test("MRR: reciprocal-rank arithmetic and hit monotonicity") {
    val rows = Retrieval.mrrEval.fn(spark, sf001).collect()
    assert(rows.length == 3) // one per query doc
    rows.foreach { r =>
      val first = r.getLong(1)
      val rr = r.getLong(2)
      if (first == 0L) assert(rr == 0L, r.toString)
      else assert(rr == 1000000L / first, r.toString)
      val (h1, h5, h10) = (r.getLong(4), r.getLong(5), r.getLong(6))
      assert(h1 <= h5 && h5 <= h10, r.toString)
      if (first >= 1 && first <= 10) assert(h10 == 1L, r.toString)
      assert(r.getLong(3) >= h10, r.toString) // n_rel_in20 ≥ any hit
    }
  }
}
