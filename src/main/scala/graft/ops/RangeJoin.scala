package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Range (interval) join via time-bin blocking.
  *
  * The query: pairs of events by the same user whose timestamps lie
  * within `windowSec` seconds of each other — the temporal
  * co-occurrence primitive behind burst detection, co-click mining,
  * and near-simultaneous-action features.
  *
  * A naive range join is O(n²) per user (DuckDB's oracle below does
  * exactly that — fine at oracle scale, fatal at 100 TB). The Spark
  * plan blocks time into `windowSec`-wide bins and probes each left
  * event into bins {b−1, b, b+1}: a pair within the window can differ
  * by at most one bin (bins are exactly window-wide), so the equi-join
  * on (user_id, bin) sees every qualifying pair — and sees it exactly
  * once, because the probe bins are distinct and the right event's bin
  * is fixed; the `a.event_id < b.event_id` orientation already makes
  * the pair unordered, so no post-join dedup shuffle is needed.
  *
  * Cost shape: 3× replication of one side into an equi-join keyed on
  * (user, bin) — shuffle-partitionable, AQE-skew-splittable, no
  * BroadcastNestedLoop/Cartesian anywhere (PlanSpec pins this). At
  * 100 TB the bin key adds time-locality to the shuffle, so a day of
  * events co-locates regardless of user-key skew.
  */
object RangeJoin {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Core pass: same-key pairs within `windowSec` seconds, counted per
    * key. `df` needs (user_id, event_id, ts). */
  def pairsWithin(df: DataFrame, windowSec: Int): DataFrame = {
    val ev = df.select(col("user_id"), col("event_id"),
      unix_timestamp(col("ts")).as("sec"))
      .withColumn("bin", expr(s"sec div $windowSec"))
    // probe column named like BinnedRangeJoinRule's marker so the
    // optimizer rule recognizes this join as already-binned and
    // doesn't stack a second (redundant) bin layer on it
    val probes = ev.select(col("user_id"), col("event_id"), col("sec"),
      explode(array(col("bin") - 1, col("bin"), col("bin") + 1))
        .as(graft.plans.BinnedRangeJoinRule.ProbeBinName))
    probes.as("a").join(ev.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col(s"a.${graft.plans.BinnedRangeJoinRule.ProbeBinName}") === col("b.bin") &&
          col("a.event_id") < col("b.event_id") &&
          abs(col("a.sec") - col("b.sec")) <= windowSec)
      .select(col("a.user_id").as("user_id"),
        col("a.event_id").as("id_a"), col("b.event_id").as("id_b"))
  }

  val rangeJoin: Q = Q(
    "q_range_join",
    (s, dir) =>
      pairsWithin(t(s, dir, "events"), 1800)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(desc("n_pairs"), col("user_id"))
        .limit(100),
    Some("""
      SELECT a.user_id AS user_id, CAST(count(*) AS BIGINT) AS n_pairs
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND a.event_id < b.event_id
       AND abs(date_diff('second', a.ts, b.ts)) <= 1800
      GROUP BY a.user_id
      ORDER BY n_pairs DESC, user_id LIMIT 100"""))

  /** The same range join written NAIVELY — a plain join whose
    * condition carries the `abs(sec_a - sec_b) <= window` range
    * predicate with no blocking — relying on
    * [[graft.plans.BinnedRangeJoinRule]] to inject the bin equi-key
    * during optimization. Same oracle as [[rangeJoin]]; the spec pins
    * that the optimized plan contains the Generate/bin join rather
    * than a per-user quadratic post-filter. This is the
    * user-experience form: ad-hoc SQL gets the scale-safe plan
    * without knowing the trick. */
  val rangeJoinAuto: Q = Q(
    "q_range_join_auto",
    (s, dir) => {
      installRule(s)
      val ev = t(s, dir, "events").select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"))
      val b = ev.select(col("user_id").as("u2"), col("event_id").as("e2"),
        col("sec").as("s2"))
      ev.join(b,
          col("user_id") === col("u2") &&
            col("event_id") < col("e2") &&
            abs(col("sec") - col("s2")) <= lit(1800L))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(desc("n_pairs"), col("user_id"))
        .limit(100)
    },
    Some("""
      SELECT a.user_id AS user_id, CAST(count(*) AS BIGINT) AS n_pairs
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND a.event_id < b.event_id
       AND abs(date_diff('second', a.ts, b.ts)) <= 1800
      GROUP BY a.user_id
      ORDER BY n_pairs DESC, user_id LIMIT 100"""))

  /** The rewrite-to-the-rule registration shared by the auto
    * queries: the driver's sessions don't configure
    * `spark.sql.extensions`, and the experimental batch is the
    * documented live-session hook for optimizer rules. */
  private def installRule(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.contains(graft.plans.BinnedRangeJoinRule))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ graft.plans.BinnedRangeJoinRule

  /** The range join in the BETWEEN spelling — `a.sec BETWEEN b.sec −
    * W AND b.sec + W` — which Spark parses into the paired-inequality
    * conjuncts [[graft.plans.BinnedRangeJoinRule]] normalizes into
    * difference bounds. Same semantics and oracle as
    * [[rangeJoinAuto]]; declared separately because this is the form
    * ad-hoc SQL users actually write (nobody writes abs() when
    * BETWEEN reads better), and the rule firing on it is what makes
    * the scale-safe plan the default user experience. RangeJoinSpec
    * pins that the rewrite fires (Generate + bin key in the plan). */
  val rangeJoinBetween: Q = Q(
    "q_range_join_between",
    (s, dir) => {
      installRule(s)
      val ev = t(s, dir, "events").select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"))
      val b = ev.select(col("user_id").as("u2"), col("event_id").as("e2"),
        col("sec").as("s2"))
      ev.join(b,
          col("user_id") === col("u2") &&
            col("event_id") < col("e2") &&
            col("sec").between(col("s2") - lit(1800L), col("s2") + lit(1800L)))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(desc("n_pairs"), col("user_id"))
        .limit(100)
    },
    Some("""
      SELECT a.user_id AS user_id, CAST(count(*) AS BIGINT) AS n_pairs
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND a.event_id < b.event_id
       AND date_diff('second', b.ts, a.ts) BETWEEN -1800 AND 1800
      GROUP BY a.user_id
      ORDER BY n_pairs DESC, user_id LIMIT 100"""))

  val all: Seq[Q] = Seq(rangeJoin, rangeJoinAuto, rangeJoinBetween)
}
