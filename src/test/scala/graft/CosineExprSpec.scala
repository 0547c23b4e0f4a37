package graft

import org.apache.spark.sql.functions._
import graft.functions.CosineSimilarity
import graft.llm.Similarity

/** The custom codegen'd Catalyst expression: value correctness on
  * both execution paths, null propagation, corruption surfacing. */
class CosineExprSpec extends SparkSpec {
  import spark.implicits._

  test("known value: cos([1,2],[0.5,0.25]) = 0.8 within 1 ulp") {
    val c = Seq((Array(1.0, 2.0), Array(0.5, 0.25))).toDF("a", "b")
      .select(CosineSimilarity(col("a"), col("b")).as("c"))
      .collect().head.getDouble(0)
    assert(math.abs(c - 0.7999999999999998) < 1e-15)
  }

  test("matches the interpreted higher-order formula bit-for-bit on random vectors") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.fill(50)((Array.fill(64)(rnd.nextGaussian()), Array.fill(64)(rnd.nextGaussian())))
    val df = rows.toDF("a", "b")
    val hof = (Similarity.dot(col("a"), col("b")) /
      (sqrt(Similarity.dot(col("a"), col("a"))) * sqrt(Similarity.dot(col("b"), col("b"))))).as("c")
    val native = CosineSimilarity(col("a"), col("b")).as("c")
    val x = df.select(hof).as[Double].collect()
    val y = df.select(native).as[Double].collect()
    assert(x.toSeq == y.toSeq)
  }

  test("null input propagates to null") {
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]])).toDF("a", "b")
    val r = df.select(CosineSimilarity(col("a"), col("b")).as("c")).collect().head
    assert(r.isNullAt(0))
  }

  test("length mismatch raises (corruption surfaces, no silent truncation)") {
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    intercept[Exception] {
      df.select(CosineSimilarity(col("a"), col("b"))).collect()
    }
  }

  test("whole-stage codegen path executes over a real scan (no interpreted fallback)") {
    val df = Tables.load(spark, sf001, "embeddings")
      .select(col("embedding").cast("array<double>").as("v"))
      .select(CosineSimilarity(col("v"), col("v")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks operators fused into WholeStageCodegen stage n
    assert(plan.contains("*(1) Project [cosine_similarity"), plan)
    // self-cosine of every vector is exactly 1.0 through the codegen path
    val vals = df.as[Double].collect()
    assert(vals.length == 500)
    assert(vals.forall(v => math.abs(v - 1.0) < 1e-12))
  }
}
