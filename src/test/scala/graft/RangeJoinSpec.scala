package graft

import org.apache.spark.sql.functions._

/** Range-join equivalence and plan-shape guards (ops.RangeJoin). */
class RangeJoinSpec extends SparkSpec {

  test("binned range join ≡ naive quadratic join") {
    val ev = Tables.load(spark, sf001, "events")
      .select("user_id", "event_id", "ts")
    val fast = ops.RangeJoin.pairsWithin(ev, 1800)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = ev.as("a")
    val b = ev.select(col("user_id").as("u2"), col("event_id").as("e2"),
      col("ts").as("t2"))
    val naive = a.join(b,
        col("user_id") === col("u2") && col("event_id") < col("e2") &&
          abs(unix_timestamp(col("ts")) - unix_timestamp(col("t2"))) <= 1800)
      .select(col("event_id"), col("e2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty, "the sf0.001 corpus has in-window pairs")
    assert(fast == naive)
  }

  test("binned range join never plans a nested-loop or cartesian join") {
    val df = SparkEntry.queries("q_range_join")(spark, sf001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }
}
