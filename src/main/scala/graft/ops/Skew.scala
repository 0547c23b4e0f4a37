package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

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

  /** Salting under full oracle check: lineitem's 3-value returnflag is
    * exactly the pathological-cardinality shape salting exists for
    * (3 keys over 32+ reducers — direct groupBy leaves the cluster
    * idle and one reducer per key swamped). The salted two-phase
    * result must equal a plain GROUP BY bit for bit: counts are
    * integers and l_quantity is integer-valued, so the double sums
    * are order-insensitive and hash-comparable. */
  val skewSalted: Q = Q(
    "q_skew_salted",
    (s, dir) =>
      saltedCountSum(Tables.load(s, dir, "lineitem"),
        key = "l_returnflag", idCol = "l_orderkey", valueCol = "l_quantity")
        .orderBy("l_returnflag"),
    Some("""
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS cnt,
             sum(l_quantity) AS total
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  val all: Seq[Q] = Seq(skewSalted)
}
