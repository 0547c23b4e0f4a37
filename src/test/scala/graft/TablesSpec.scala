package graft

import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import java.nio.file.Files

/** Pins `Tables.load`'s timestamp-normalization contract: whatever
  * physical encoding the corpus generator ships for `events.ts`
  * (nanos-as-long, micros-NTZ, or plain TIMESTAMP), the loader must
  * surface Spark `TimestampType` with identical instants. Round 10
  * shipped blind when the generator switched nanos→micros-NTZ and
  * every watermark operator started rejecting the column; this suite
  * makes the next encoding drift a test failure, not a driver one.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureDir(): String =
    Files.createTempDirectory("graft_tables_fixture").toString

  // One known instant, expressed per-encoding below. UTC session is
  // forced by TestSpark, so NTZ wall clock == UTC instant.
  private val wall = "2024-01-01 12:34:56.789012"
  private val micros = 1704112496789012L

  test("micros-NTZ events.ts (current generator encoding) surfaces as TIMESTAMP") {
    val dir = fixtureDir()
    spark.sql(s"SELECT timestamp_ntz'$wall' AS ts, 7L AS user_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // Pre-condition: the fixture really is NTZ on disk.
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType == TimestampNTZType)
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.selectExpr("unix_micros(ts)").as[Long].head() == micros)
  }

  test("nanos-as-long events.ts (pre-Aug-13 encoding) surfaces as TIMESTAMP") {
    // Spark cannot WRITE TIMESTAMP(NANOS) parquet; under
    // nanosAsLong=true a genuine nanos column reads back as LongType,
    // which is byte-for-byte what an INT64 fixture produces — so this
    // exercises the identical loader branch.
    val dir = fixtureDir()
    Seq((micros * 1000L + 345L, 7L)).toDF("ts", "user_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType == TimestampType)
    // nanos truncate (not round) to micros, matching DuckDB.
    assert(got.selectExpr("unix_micros(ts)").as[Long].head() == micros)
  }

  test("plain TIMESTAMP events.ts passes through unchanged") {
    val dir = fixtureDir()
    spark.sql(s"SELECT timestamp'$wall' AS ts, 7L AS user_id")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.load(spark, dir, "events")
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.selectExpr("unix_micros(ts)").as[Long].head() == micros)
  }

  test("non-events tables: any NTZ column is normalized too") {
    val dir = fixtureDir()
    spark.sql(s"SELECT 1L AS o_orderkey, timestamp_ntz'$wall' AS o_touched")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Tables.load(spark, dir, "orders")
    assert(got.schema("o_touched").dataType == TimestampType)
  }

  test("driver corpus: events.ts loads as TIMESTAMP at sf0.001") {
    val got = Tables.load(spark, sf001, "events")
    assert(got.schema("ts").dataType == TimestampType)
    // and the watermark operator accepts it — the exact call that
    // failed in round 10.
    got.withWatermark("ts", "1 hour")
    assert(got.selectExpr("unix_micros(ts)").limit(1).count() == 1L)
  }
}
