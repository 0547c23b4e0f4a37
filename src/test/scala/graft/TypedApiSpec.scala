package graft

import org.apache.spark.sql.functions._
import graft.ops.TypedApi

/** Typed Dataset surface: the declarative typed pipeline must equal
  * the lambda (serde-boundary) formulation semantically, and must
  * NOT pay the serde cost in its plan. */
class TypedApiSpec extends SparkSpec {
  import spark.implicits._

  test("declarative typed pipeline == typed-lambda formulation") {
    val ds = TypedApi.orders(spark, sf001)
    val declarative = TypedApi.revenueByStatus(ds)
      .collect().map(r => r.o_orderstatus -> (r.n, r.revenue_cents)).toMap
    // the lambda form: typed filter + groupByKey/mapGroups — the
    // deserialize→JVM→serialize path the declared query avoids
    val viaLambda = ds
      .filter(o => o.o_totalprice > 1000.0)
      .groupByKey(_.o_orderstatus)
      .mapGroups { (k, it) =>
        var n = 0L; var cents = 0L
        it.foreach { o => n += 1; cents += math.round(o.o_totalprice * 100) }
        (k, n, cents)
      }
      .collect().map { case (k, n, c) => k -> (n, c) }.toMap
    assert(declarative == viaLambda)
  }

  test("declarative typed pipeline keeps pushdown (no serde boundary in plan)") {
    val df = TypedApi.revenueByStatus(TypedApi.orders(spark, sf001)).toDF()
    val p = df.queryExecution.executedPlan.toString
    // the filter must reach the scan; DeserializeToObject /
    // SerializeFromObject would mark a lambda boundary
    assert(p.contains("PushedFilters") && p.contains("o_totalprice"), p)
    assert(!p.contains("DeserializeToObject"), p)
    assert(!p.contains("mapGroups"), p)
  }
}
