package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — SURVEY.md §7.1.
  *
  * Every operator row of SURVEY.md §2 (plus the LLM-pipeline extension
  * ops) is registered here as a named query; where the semantics are
  * expressible in the Spark∩DuckDB ANSI dialect an oracle SQL string
  * accompanies it for the driver's hash compare. Non-SQL-expressible
  * ops (MinHash/SimHash/LSH internals) are declared without oracle —
  * rows-only check — and pinned by ScalaTest instead.
  */
object SparkEntry {

  /** Full registry, assembled from the operator modules. */
  val registry: Seq[Q] =
    ops.Parity.all ++ ops.Relational.all ++ ops.TpchSuite.all ++ ops.Ingest.all ++ ops.Sql.all ++
      ops.Sinks.all ++ ops.Skew.all ++ ops.AsOfJoin.all ++ ops.RangeJoin.all ++
      ops.ScalarSuite.all ++ ops.WindowSuite.all ++ ops.Sketches.all ++
      ops.Merge.all ++ ops.Scd.all ++ ops.Skyline.all ++ ops.Layout.all ++ ops.TypedApi.all ++ ops.Profile.all ++
      ops.FuzzyJoin.all ++ ops.Graph.all ++ ops.Itemsets.all ++ ops.Robust.all ++
      ops.Linkage.all ++
      llm.TextStats.all ++ llm.Dedup.all ++ llm.Similarity.all ++
      llm.Ivf.all ++ llm.Pq.all ++ llm.IvfPq.all ++ llm.Events.all ++ llm.Multimodal.all ++ llm.Sampling.all ++
      llm.Curation.all ++ llm.Retrieval.all ++ llm.Bpe.all ++ llm.Classifier.all ++ llm.Pca.all ++ llm.Drift.all ++
      llm.Privacy.all ++ llm.WordEmbed.all ++ llm.Ridge.all ++ llm.Dbscan.all ++
      llm.UnigramLm.all ++ llm.TextRank.all ++ llm.Als.all ++
      streaming.EventStream.all

  /** Flagship query (reference ATHENA_SQL, E3) on sf=0.001; driver
    * smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Parity.recencyTopK.fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** DuckDB-equivalent ANSI SQL per query (omitted → rows-only check). */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin.trim)).toMap
}
