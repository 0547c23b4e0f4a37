package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: write `.explain("formatted")` of named queries to files —
  * the plans/rNN before/after evidence the optimization rounds commit.
  * For driver-loop queries (collect + rebuild shapes) the captured
  * plan is the RETURNED frame's plan, the only statically available
  * one.
  *
  * Usage: sbt "runMain graft.ProbePlan <outDir> <suffix> q_a q_b ..."
  * writes <outDir>/<query>_<suffix>.txt per query.
  */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val outDir = args(0); val suffix = args(1); val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
      // application-sized codegen class cache — see Bench.scala's note
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plan] $n -> $outDir/${n}_$suffix.txt")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
