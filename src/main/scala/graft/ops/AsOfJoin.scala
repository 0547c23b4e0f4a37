package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** As-of (point-in-time) join — an operator Spark lacks natively,
  * composed from built-ins per the brief's preference order (a):
  * tagged union + per-key window with `last(ignoreNulls)`.
  *
  * For each left row, attach the right row with the greatest
  * `timeCol` ≤ the left row's time within the same key — inclusive
  * ties, left-outer semantics (no prior right row → null), matching
  * DuckDB's `ASOF LEFT JOIN`, which is the oracle.
  *
  * Why this shape at 100 TB: the naive formulation (range-condition
  * join + per-left-row max) explodes into an O(L·R) theta join per
  * key. The tagged union is ONE shuffle of L+R rows on the key, then
  * a linear per-partition sorted sweep — the same cost profile as a
  * sort-merge join, robust to any left/right size ratio. */
object AsOfJoin {

  /** @param valueCols right-side columns to carry (emitted as
    *                  `asof_<name>`); all other right columns drop.
    * @param forward false = backward as-of (greatest right time ≤
    *                left time, the default point-in-time lookup);
    *                true = forward as-of (smallest right time ≥ left
    *                time — "next reading after the order") — the same
    *                single-shuffle sweep run time-descending. */
  def asofJoinLast(
      left: DataFrame, right: DataFrame,
      keyCols: Seq[String], timeCol: String,
      valueCols: Seq[String], forward: Boolean = false): DataFrame = {
    val leftCols = left.columns
    // tag sides; right rows sort before left rows at equal time so an
    // exactly-simultaneous right row is visible (inclusive <= / >=)
    val rTagged = right.select(
      (keyCols.map(col) :+ col(timeCol).as("__t") :+ lit(0).as("__side")) ++
        valueCols.map(c => col(c).as(s"__v_$c")) ++
        leftCols.filterNot(c => keyCols.contains(c))
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      (keyCols.map(col) :+ col(timeCol).as("__t") :+ lit(1).as("__side")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c")) ++
        leftCols.filterNot(c => keyCols.contains(c)).map(col): _*)
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(if (forward) col("__t").desc else col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = rTagged.unionByName(lTagged)
      .select(col("*") +: valueCols.map(c =>
        last(col(s"__v_$c"), ignoreNulls = true).over(w).as(s"asof_$c")): _*)
    swept.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c")): _*)
  }

  /** For each purchase, the value of the user's most recent click at
    * or before the purchase time. */
  val purchaseAsofClick: Q = Q(
    "q_asof_join",
    (s, dir) => {
      val events = Tables.load(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = events.filter(col("event_type") === "click")
        .select("user_id", "ts", "value")
      asofJoinLast(purchases, clicks, Seq("user_id"), "ts", Seq("value"))
        .select(col("event_id"), col("user_id"), col("asof_value").as("last_click_value"))
        .orderBy("event_id")
    },
    Some("""
      SELECT p.event_id, p.user_id, c.value AS last_click_value
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.event_id"""))

  /** Forward as-of: for each purchase, the value of the user's FIRST
    * click at or after the purchase time ("what did they do next"). */
  val purchaseAsofNextClick: Q = Q(
    "q_asof_forward",
    (s, dir) => {
      val events = Tables.load(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = events.filter(col("event_type") === "click")
        .select("user_id", "ts", "value")
      asofJoinLast(purchases, clicks, Seq("user_id"), "ts", Seq("value"),
        forward = true)
        .select(col("event_id"), col("user_id"),
          col("asof_value").as("next_click_value"))
        .orderBy("event_id")
    },
    Some("""
      SELECT p.event_id, p.user_id, c.value AS next_click_value
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts <= c.ts
      ORDER BY p.event_id"""))

  /** The SAME point-in-time lookup as [[purchaseAsofClick]], executed
    * by the custom physical operator
    * ([[graft.plans.AsofJoinPlan]]/[[graft.plans.AsofJoinExec]] — a
    * real `SparkStrategy` + `SparkPlan` merge sweep) instead of the
    * tagged-union window composition. Same DuckDB ASOF oracle, so the
    * driver hash pins operator ≡ composition ≡ DuckDB three ways;
    * AsOfJoinSpec additionally pins the plan SHAPE (an AsofJoin node,
    * no WindowExec) and edge semantics. */
  val purchaseAsofClickExec: Q = Q(
    "q_asof_exec",
    (s, dir) => {
      val events = Tables.load(s, dir, "events")
      val purchases = events.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = events.filter(col("event_type") === "click")
        .select("user_id", "ts", "value")
      graft.plans.AsofJoinPlan.join(purchases, clicks, Seq("user_id"), "ts", Seq("value"))
        .select(col("event_id"), col("user_id"),
          col("asof_value").as("last_click_value"))
        .orderBy("event_id")
    },
    Some("""
      SELECT p.event_id, p.user_id, c.value AS last_click_value
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY p.event_id"""))

  val all: Seq[Q] = Seq(purchaseAsofClick, purchaseAsofNextClick,
    purchaseAsofClickExec)
}
