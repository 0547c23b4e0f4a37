package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities — the salting pattern for hot keys.
  *
  * AQE's skew-join handling (on by default) covers sort-merge joins;
  * salting is the complementary tool for AGGREGATIONS with pathological
  * key skew (one key = 30% of a 100 TB table): phase 1 aggregates on
  * (key, salt) spreading the hot key over `salts` reducers, phase 2
  * combines the per-salt partials. Correct for any algebraic
  * aggregate expressed as (partial, combine) pairs.
  */
object Skew {

  /** Deterministic salt column in [0, salts) — hash of the full row's
    * unique id keeps it reproducible (no rand()). */
  def salt(idCol: Column, salts: Int): Column =
    pmod(xxhash64(idCol), lit(salts.toLong))

  /** Two-phase salted count+sum per key: returns (key, cnt, total)
    * equal to a direct groupBy, but no single reducer ever sees more
    * than ~1/salts of any key's rows. */
  def saltedCountSum(df: DataFrame, key: String, idCol: String,
      valueCol: String, salts: Int = 16): DataFrame =
    df.withColumn("__salt", salt(col(idCol), salts))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__cnt"), sum(col(valueCol)).as("__sum"))
      .groupBy(col(key))
      .agg(sum(col("__cnt")).as("cnt"), sum(col("__sum")).as("total"))
}
