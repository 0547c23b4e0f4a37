package graft

import org.apache.spark.sql.functions._
import graft.functions.GramAgg

/** Dimension envelope + input-contract pins for the Gram aggregate.
  * The buffer is one flat long[d(d+1)/2 + 1] per aggregation state —
  * d=256 means 32 897 longs (~263 KB): still comfortably map-side
  * combinable, documented as the envelope before someone points the
  * operator at 4k-dim embeddings. */
class GramAggSpec extends SparkSpec {
  import spark.implicits._

  test("d=256 triangle matches a driver-side reference, multi-partition") {
    val d = 256
    val n = 40
    // deterministic small ints; partitioned so map-side combine and
    // merge() both execute
    val rows = (0 until n).map(r => (0 until d).map(i => ((r * 31 + i * 7) % 11 - 5).toLong))
    val df = rows.map(v => Tuple1(v)).toDF("q").repartition(8)
    val got = df.agg(GramAgg(col("q"), d).as("g"))
      .select(explode(col("g")).as("c"))
      .select("c.i", "c.j", "c.n", "c.s")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got.size === d * (d + 1) / 2)
    // spot-check the full first row + diagonal + last cell against a
    // driver loop (checking all 32 896 cells would be slow in assert
    // overhead; these cover first/last buffer slots and both strides)
    def ref(i: Int, j: Int): Long = rows.map(v => v(i) * v(j)).sum
    for (j <- 0 until d) {
      assert(got((0L, j.toLong)) === ((n.toLong, ref(0, j))), s"cell (0,$j)")
      assert(got((j.toLong, j.toLong)) === ((n.toLong, ref(j, j))), s"cell ($j,$j)")
    }
    assert(got(((d - 1).toLong, (d - 1).toLong)) === ((n.toLong, ref(d - 1, d - 1))))
  }

  test("partial (map-side) aggregation is in the physical plan at d=256") {
    val df = Seq(Tuple1((0 until 256).map(_.toLong))).toDF("q").repartition(2)
    val plan = df.agg(GramAgg(col("q"), 256).as("g"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    // two-phase: a partial aggregate below the exchange
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan.take(2000))
  }

  test("ragged input fails loudly instead of silently skewing the sums") {
    val df = Seq(Seq(1L, 2L, 3L), Seq(1L, 2L)).map(Tuple1(_)).toDF("q")
    val e = intercept[Exception] {
      df.agg(GramAgg(col("q"), 3)).collect()
    }
    assert(e.getMessage.contains("gram_agg") ||
      e.getCause != null && e.getCause.getMessage.contains("gram_agg"))
  }

  test("null coordinate fails loudly") {
    val df = Seq(Seq[java.lang.Long](1L, null, 3L)).map(Tuple1(_)).toDF("q")
    val e = intercept[Exception] {
      df.agg(GramAgg(col("q"), 3)).collect()
    }
    assert(e.getMessage.contains("null coordinate") ||
      e.getCause != null && e.getCause.getMessage.contains("null coordinate"))
  }

  test("blocked form (d=256, bs=64) is bit-identical to the monolithic triangle") {
    val d = 256
    val n = 30
    val rows = (0 until n).map(r => (0 until d).map(i => ((r * 17 + i * 13) % 9 - 4).toLong))
    val df = rows.map(v => Tuple1(v)).toDF("q").repartition(8)
    def cellMap(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    val mono = cellMap(df.agg(GramAgg(col("q"), d).as("g"))
      .select(explode(col("g")).as("c"))
      .select("c.i", "c.j", "c.n", "c.s").collect())
    val blocked = cellMap(graft.functions.BlockedGram.gram(df, col("q"), d, bs = 64)
      .select("i", "j", "n", "s").collect())
    assert(blocked.size === d * (d + 1) / 2)
    assert(blocked === mono)
  }

  test("blocked form skips null vectors and map-side combines") {
    val df = Seq(Some(Seq(1L, 2L, 3L, 4L)), None, Some(Seq(5L, 6L, 7L, 8L)))
      .map(Tuple1(_)).toDF("q").repartition(2)
    val out = graft.functions.BlockedGram.gram(df, col("q"), 4, bs = 2)
    assert(out.collect().forall(_.getAs[Long]("n") == 2L))
    val plan = out.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan.take(2000))
  }

  test("null vectors are skipped per SQL aggregate semantics") {
    val df = Seq(Some(Seq(1L, 2L)), None, Some(Seq(3L, 4L))).map(Tuple1(_)).toDF("q")
    val got = df.agg(GramAgg(col("q"), 2).as("g"))
      .select(explode(col("g")).as("c")).select("c.n", "c.s")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.forall(_._1 == 2L)) // n counts only the two non-null vectors
  }
}
