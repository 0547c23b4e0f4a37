package graft

import org.apache.spark.sql.functions._
import graft.llm.Als

/** The shared Cramer-2×2 text actually solves its system, and the
  * declared ALS round produces sane factors. */
class AlsSpec extends SparkSpec {
  import spark.implicits._

  test("cramer2 text satisfies (A + lambda I) x = b on seeded random moments") {
    val rnd = new scala.util.Random(53)
    val rows = Seq.fill(30) {
      // positive-definite-ish moments: a11,a22 dominate a12
      val a12 = rnd.nextInt(1000000).toLong
      (a12 + rnd.nextInt(10000000).toLong, a12,
        a12 + rnd.nextInt(10000000).toLong,
        rnd.nextInt(100000000).toLong - 50000000L,
        rnd.nextInt(100000000).toLong - 50000000L)
    }
    val lam = "1e6"
    val got = rows.toDF("a11", "a12", "a22", "b1", "b2")
      .select(col("a11"), col("a12"), col("a22"), col("b1"), col("b2"),
        expr(Als.cramer2(0, lam)).as("x1"),
        expr(Als.cramer2(1, lam)).as("x2"))
      .collect()
    got.foreach { r =>
      val (a11, a12, a22) = (r.getLong(0).toDouble + 1e6,
        r.getLong(1).toDouble, r.getLong(2).toDouble + 1e6)
      val (b1, b2) = (r.getLong(3).toDouble, r.getLong(4).toDouble)
      val (x1, x2) = (r.getDouble(5), r.getDouble(6))
      val r1 = a11 * x1 + a12 * x2 - b1
      val r2 = a12 * x1 + a22 * x2 - b2
      val scale = math.max(1.0, math.max(math.abs(b1), math.abs(b2)))
      assert(math.abs(r1) / scale < 1e-9 && math.abs(r2) / scale < 1e-9,
        s"residual ($r1, $r2) for $r")
    }
  }

  test("single-rating hand case: u = r q / (q'q + lambda), then item re-solve") {
    // one customer, one part, r = 5: the 2x2 degenerates to the
    // textbook scalar ridge in each coordinate pair
    val q1 = 501000.0; val q2 = 301000.0 // what the seeds would give
    val lam = 1e12
    val det = (q1 * q1 + lam) * (q2 * q2 + lam) - (q1 * q2) * (q1 * q2)
    val u1 = ((q2 * q2 + lam) * (5 * q1) - (q1 * q2) * (5 * q2)) / det
    val got = Seq((q1.toLong * q1.toLong, q1.toLong * q2.toLong,
        q2.toLong * q2.toLong, 5L * q1.toLong, 5L * q2.toLong))
      .toDF("a11", "a12", "a22", "b1", "b2")
      .select(expr(Als.cramer2(0, "1e12")).as("u1")).head().getDouble(0)
    assert(math.abs(got - u1) / math.abs(u1) < 1e-12, s"$got vs $u1")
  }

  test("descent audit: the item half-step strictly improves the objective here") {
    val r = Als.alsDescent.fn(spark, sf001).head()
    val (jb, ja) = (r.getLong(3), r.getLong(6))
    assert(ja < jb, s"expected macroscopic descent: J $jb -> $ja")
    assert(r.getLong(7) > 0, "improved_permille must be positive")
    assert(r.getLong(1) >= 0 && r.getLong(4) >= 0, "SSE terms nonnegative")
  }

  test("declared query: factors land in the documented nano envelope") {
    val rows = Als.alsStep.fn(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1)
      assert(n >= 1, "every emitted part has users")
      // u ~ 1e4 nano, q_new ~ r*u/(u^2) scale — sane, bounded values
      val (q1n, q2n) = (r.getLong(4), r.getLong(5))
      assert(math.abs(q1n) < 1000000000000L && math.abs(q2n) < 1000000000000L,
        s"implausible factor: $r")
    }
  }

  test("item neighbors: top-5 per sampled item, rank order matches dot order") {
    val rows = Als.alsNeighbors.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qp, rs) =>
      assert(rs.length <= 5, s"$qp shortlist bound")
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq, s"$qp ranks")
      rs.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3),
            s"$qp order violated: $a then $b")
        case _ =>
      }
      assert(!rs.exists(_._3 == qp), s"$qp must not be its own neighbor")
    }
  }
}
