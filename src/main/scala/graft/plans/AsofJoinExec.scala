package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.toDataFrame
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** As-of join as a FIRST-CLASS physical operator — the (c)-tier
  * extension the brief reserves for semantics the built-ins can't
  * express as the plan you'd actually want: a custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan`, registered on the session.
  *
  * The composed form ([[graft.ops.AsOfJoin.asofJoinLast]] — tagged
  * union + per-key window) is correct and one-shuffle, but it
  * materializes the combined L+R stream through a WindowExec: every
  * right row is carried through the window buffer, padded with null
  * left columns, then filtered away. This operator is the shape a
  * native engine gives the same query: both sides hash-partitioned on
  * the key and sorted (key, time) — requirements DECLARED via
  * `requiredChildDistribution`/`requiredChildOrdering`, so
  * EnsureRequirements plans the exchanges and sorts and AQE remains
  * free to size them — then a single zipPartitions merge sweep emits
  * each left row joined to the latest right row with time ≤ it
  * (ties inclusive; `forward = true` runs the same sweep
  * time-DESCENDING for the earliest right time ≥). O(|L|+|R|) per
  * partition, no combined buffer, no post-filter, left-outer
  * semantics identical to DuckDB's ASOF LEFT JOIN — which is exactly
  * what the oracle checks.
  *
  * Attribute hygiene: the builder re-aliases the right side's used
  * columns (fresh exprIds — both inputs may descend from the same
  * base relation, the classic self-join trap our post-analysis node
  * would otherwise inherit), and the operator's output is
  * left.output ++ FRESH nullable `asof_*` attributes, so no duplicate
  * exprIds can escape. Time columns must be physically 64-bit
  * (timestamp / long), enforced at build time. */
case class AsofJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    rightValues: Seq[Attribute],
    valueOut: Seq[AttributeReference],
    forward: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ valueOut
  // the asof_* attributes originate HERE, not in a child — without
  // this, CheckAnalysis reports them as missing inputs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(valueOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsofJoinPlan =>
      AsofJoinExec(planLater(j.left), planLater(j.right), j.leftKeys,
        j.rightKeys, j.leftTime, j.rightTime, j.rightValues, j.valueOut,
        j.forward) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    rightValues: Seq[Attribute],
    valueOut: Seq[AttributeReference],
    forward: Boolean) extends SparkPlan with BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ valueOut
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(valueOut)
  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def orderOf(keys: Seq[Attribute], time: Attribute): Seq[SortOrder] =
    keys.map(SortOrder(_, Ascending)) :+
      SortOrder(time, if (forward) Descending else Ascending)

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(orderOf(leftKeys, leftTime), orderOf(rightKeys, rightTime))

  // the sweep's output order is the left child's required order
  override def outputOrdering: Seq[SortOrder] = orderOf(leftKeys, leftTime)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val fwd = forward
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val rValuesB = rightValues
    val nValues = valueOut.length
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeB), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeB), rOut)
      val valueProj = UnsafeProjection.create(rValuesB, rOut)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullValues = new GenericInternalRow(nValues)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // lookahead right row state: key COPIED (projections reuse
        // buffers), time extracted; the row object itself stays valid
        // until the next rIter.next()
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTime: Long = 0L
        private var rTimeIsNull = false
        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rRow = rIter.next()
            rKey = rKeyProj(rRow).copy()
            val t = rTimeProj(rRow)
            rTimeIsNull = t.isNullAt(0)
            rTime = if (rTimeIsNull) 0L else t.getLong(0)
          } else { rRow = null; rKey = null }
        advanceRight()

        // best candidate so far: the most recent qualifying right row
        private var candKey: UnsafeRow = _
        private var candValues: UnsafeRow = _

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lt = lTimeProj(l)
          val ltNull = lt.isNullAt(0)
          val lTimeV = if (ltNull) 0L else lt.getLong(0)
          // a NULL left time matches nothing; a NULL right time is
          // skipped (standard join null semantics) but still advances
          while (rRow != null && {
            val c = keyOrd.compare(rKey, lk)
            c < 0 || (c == 0 && !ltNull &&
              (rTimeIsNull || (if (fwd) rTime >= lTimeV else rTime <= lTimeV)))
          }) {
            if (!rTimeIsNull && keyOrd.compare(rKey, lk) == 0) {
              candKey = rKey // already a private copy
              candValues = valueProj(rRow).copy()
            }
            advanceRight()
          }
          val matched = !ltNull && candKey != null &&
            keyOrd.compare(candKey, lk) == 0
          joined(l, if (matched) candValues else nullValues)
          outProj(joined)
        }
      }
    }
  }
}

object AsofJoinPlan {

  /** Install [[AsofJoinStrategy]] on the session (idempotent). Also
    * injectable at startup via `spark.sql.extensions` —
    * [[GraftExtensions]] registers it alongside the range-join rule. */
  def register(s: org.apache.spark.sql.SparkSession): Unit =
    if (!s.experimental.extraStrategies.contains(AsofJoinStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ AsofJoinStrategy

  /** Column-API builder: backward (default) or forward as-of join,
    * emitting left's columns plus `asof_<value>` for each requested
    * right value column. */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      timeCol: String, valueCols: Seq[String],
      forward: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = left.sparkSession
    register(spark)
    // fresh exprIds for the right side: both frames may descend from
    // the same base relation, and this node is built post-analysis —
    // aliasing is the self-join disambiguation the analyzer would
    // otherwise have done for us
    val rightNarrow = right.select(
      (keys ++ (timeCol +: valueCols)).distinct.map(c => col(c).as(s"__r_$c")): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightNarrow.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val lTime = attr(lPlan, timeCol)
    val rTime = attr(rPlan, s"__r_$timeCol")
    Seq(lTime, rTime).foreach { t =>
      require(t.dataType == TimestampType || t.dataType == TimestampNTZType ||
        t.dataType == LongType,
        s"as-of time column ${t.name} must be timestamp/long, got ${t.dataType}")
    }
    val rVals = valueCols.map(c => attr(rPlan, s"__r_$c"))
    val valueOut = valueCols.zip(rVals).map { case (c, a) =>
      AttributeReference(s"asof_$c", a.dataType, nullable = true)()
    }
    toDataFrame(spark, AsofJoinPlan(lPlan, rPlan,
      keys.map(attr(lPlan, _)), keys.map(k => attr(rPlan, s"__r_$k")),
      lTime, rTime, rVals, valueOut, forward))
  }
}
