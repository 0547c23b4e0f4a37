package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The full E1 lifecycle (reference `lambda_handler`,
  * `lambda_function.py:205-230`) as one composable function — what a
  * user of the reference runs instead of the Lambda:
  *
  * reference (eager, 4 process boundaries)      here (one lazy plan)
  * ─────────────────────────────────────        ───────────────────────
  * fetch_all_results (HTTP pages)         →     DSv2 paged source (S1)
  * filter_veteran_set_asides              →     P1 contains filter
  * transform_opportunities (pandas)       →     Ingest.transform chain
  * to_parquet + upload_to_s3              →     Sinks.parquetSnapshot (s3a path)
  * start_glue_crawler                     →     createOrReplaceTempView (S4)
  * run_athena_query (remote Presto, poll) →     spark.sql, same session
  *
  * Everything before the sink is ONE Catalyst plan — the write is the
  * only action; the SQL step reads the written parquet back (like
  * Athena reading S3), exercising the real storage round-trip.
  */
object Pipeline {

  /** Reference ATHENA_SQL (`:173-179`) verbatim, over the written table. */
  val ResultSql: String = """
    SELECT title, solicitationNumber, postedDate, setAside, recencyScore
    FROM contracts
    WHERE recencyScore >= 4
    ORDER BY postedDate DESC, noticeId DESC
    LIMIT 10"""

  /** Run the whole pipeline; returns the final SQL result (the
    * reference returns its row count as `record_count`). */
  def run(spark: SparkSession, outDir: String): DataFrame = {
    val raw = spark.read.format("graft.sources.PagedJsonSource")
      .option("page_size", 100).option("max_records", 500).load()
    val packed = raw.select(struct(raw.columns.map(col): _*).as("r"))
    val contracts = Ingest.transform(spark, packed)
    Sinks.parquetSnapshot(contracts, s"$outDir/contracts")          // S2+S3
    spark.read.parquet(s"$outDir/contracts")
      .createOrReplaceTempView("contracts")                         // S4
    spark.sql(ResultSql)                                            // E3
  }
}
