package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan regression guards: the properties the 100 TB design
  * depends on, asserted so a refactor can't silently lose them.
  * (AQE wraps plans, so assertions run on the executed plan string
  * after an action materializes the final plan.) */
class PlanSpec extends SparkSpec {

  private def finalPlan(df: DataFrame): String = {
    df.collect() // materialize so AQE settles on the final plan
    df.queryExecution.executedPlan.toString
  }

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf001)

  test("flagship top-k plans TakeOrderedAndProject (no global sort)") {
    val p = finalPlan(q("q_recency_topk"))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortExec"), p)
  }

  test("dimension joins broadcast (no shuffle of the fact side)") {
    for (name <- Seq("q_dim_join", "q_join_agg", "q_tpch_q3")) {
      val p = finalPlan(q(name))
      assert(p.contains("BroadcastHashJoin"), s"$name:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$name:\n$p")
    }
  }

  test("filter pushdown reaches the parquet scan") {
    val p = q("q_contains_filter").queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(o_orderpriority)"), p)
  }

  test("column pruning: group_agg scan reads only needed columns") {
    val p = q("q_group_agg").queryExecution.executedPlan.toString
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), readSchema)
    assert(!readSchema.contains("l_partkey"), readSchema)
  }

  test("correlated scalar subquery decorrelates (no per-row subplans)") {
    val p = finalPlan(q("q_scalar_subquery"))
    // decorrelation rewrites to aggregate + join; a surviving scalar
    // subquery would appear as a Subquery/ScalarSubquery node
    assert(!p.contains("ScalarSubquery"), p)
    assert(p.contains("Join") || p.contains("BroadcastHashJoin"), p)
  }

  test("as-of join is one window sweep, not a theta join") {
    val p = finalPlan(q("q_asof_join"))
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("grouped aggregation has a partial (map-side) phase") {
    val p = finalPlan(q("q_group_agg"))
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_"), p)
  }
}
