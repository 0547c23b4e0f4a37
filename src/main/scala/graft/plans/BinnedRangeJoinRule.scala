package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** Optimizer rule: rewrite a naive range join into the time-bin
  * blocked form of [[graft.ops.RangeJoin]] automatically.
  *
  * A user writing `a JOIN b ON ... AND abs(a.sec - b.sec) <= K` gets,
  * without the rule, either a BroadcastNestedLoopJoin (no other equi
  * conjunct — quadratic, fatal at scale) or a hash join on the
  * remaining equi keys with the range check as a post-filter
  * (quadratic per key group). The rule adds the derived equi key the
  * human expert would: bin one side into K-wide intervals
  * (`floor(sec/K)`), explode the other side's probe bins
  * {b−1, b, b+1}, and join on bin equality. Two rows within K differ
  * by at most one bin (intervals are K wide), so every qualifying
  * pair survives; the probe bins are distinct and the build side's
  * bin is a function of its row, so no pair is duplicated; the
  * original range conjunct stays in the condition, so no false pair
  * survives. The rewrite is therefore bag-equivalent to the naive
  * join — pinned by spec against both the hand-written operator and
  * a rule-disabled run.
  *
  * Recognized range forms — all the spellings users actually write,
  * normalized to difference bounds `x − y ≤ k` per conjunct and fired
  * when both directions are bounded for the same (x, y) pair:
  *  - `abs(x − y) <= K` (one conjunct, both bounds)
  *  - `x BETWEEN y − K AND y + K` (parses to the paired-inequality
  *    form below before optimization)
  *  - `x >= y − K AND x <= y + K` / `x − y <= K AND y − x <= K` and
  *    mixed spellings, including strict `<`/`>` (tightened by 1 —
  *    integer domains) and asymmetric windows (`x − y ∈ [−k₂, k₁]`
  *    bins at width max(k₁, k₂); the retained original conjuncts
  *    still reject anything outside the tighter window).
  *
  * Scope guards: inner joins only; both range operands integer/long
  * expressions with x and y from opposite sides; fires once per join
  * (the injected `__graft_pbin` attribute marks a rewritten plan —
  * the hand-built [[graft.ops.RangeJoin.pairsWithin]] uses the same
  * name to opt out).
  *
  * Registration: `GraftExtensions` for
  * `spark.sql.extensions`-configured sessions, or
  * `spark.experimental.extraOptimizations` on a live session (how
  * the driver-facing query installs it — both run in the
  * user-provided optimizer batch).
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val ProbeBinName = "__graft_pbin"
  private val BuildBinName = "__graft_bin"

  private def isIntegral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** floor(sec / k) over doubles: unix-epoch magnitudes are exact in
    * double, and floor semantics keep every bin exactly k wide (a
    * truncating integer div would double-width the bin at zero). */
  private def binOf(sec: Expression, k: Long): Expression =
    Floor(Divide(Cast(sec, org.apache.spark.sql.types.DoubleType),
      Literal(k.toDouble)))

  private object IntegralLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(i: java.lang.Integer, IntegerType) => Some(i.longValue)
      case Literal(l: java.lang.Long, LongType) => Some(l.longValue)
      case _ => None
    }
  }

  /** Normalize one conjunct into difference bounds `x − y ≤ k`.
    * The abs form yields both directions at once; each inequality
    * spelling yields one. Strict comparisons tighten by 1 (integer
    * domains only — guarded by [[isIntegral]] at the use site). */
  private def diffBounds(c: Expression): Seq[(Expression, Expression, Long)] =
    c match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), IntegralLit(k)) =>
        Seq((x, y, k), (y, x, k))
      case LessThan(Abs(Subtract(x, y, _), _), IntegralLit(k)) =>
        Seq((x, y, k - 1), (y, x, k - 1))
      // x − y vs literal
      case LessThanOrEqual(Subtract(x, y, _), IntegralLit(k)) => Seq((x, y, k))
      case LessThan(Subtract(x, y, _), IntegralLit(k)) => Seq((x, y, k - 1))
      case GreaterThanOrEqual(Subtract(x, y, _), IntegralLit(k)) => Seq((y, x, -k))
      case GreaterThan(Subtract(x, y, _), IntegralLit(k)) => Seq((y, x, -k - 1))
      // x vs y ± literal (BETWEEN parses into a pair of these)
      case LessThanOrEqual(x, Add(y, IntegralLit(k), _)) => Seq((x, y, k))
      case LessThanOrEqual(x, Add(IntegralLit(k), y, _)) => Seq((x, y, k))
      case LessThanOrEqual(x, Subtract(y, IntegralLit(k), _)) => Seq((x, y, -k))
      case LessThan(x, Add(y, IntegralLit(k), _)) => Seq((x, y, k - 1))
      case LessThan(x, Add(IntegralLit(k), y, _)) => Seq((x, y, k - 1))
      case GreaterThanOrEqual(x, Subtract(y, IntegralLit(k), _)) => Seq((y, x, k))
      case GreaterThanOrEqual(x, Add(y, IntegralLit(k), _)) => Seq((y, x, -k))
      case GreaterThanOrEqual(x, Add(IntegralLit(k), y, _)) => Seq((y, x, -k))
      case GreaterThan(x, Subtract(y, IntegralLit(k), _)) => Seq((y, x, k - 1))
      case LessThan(x, Subtract(y, IntegralLit(k), _)) => Seq((x, y, -k - 1))
      case GreaterThan(x, Add(y, IntegralLit(k), _)) => Seq((y, x, -k - 1))
      case GreaterThan(x, Add(IntegralLit(k), y, _)) => Seq((y, x, -k - 1))
      // literal on the left: k <= x − y etc. mirror to the above
      case GreaterThanOrEqual(IntegralLit(k), Subtract(x, y, _)) => Seq((x, y, k))
      case LessThanOrEqual(IntegralLit(k), Subtract(x, y, _)) => Seq((y, x, -k))
      case GreaterThan(IntegralLit(k), Subtract(x, y, _)) => Seq((x, y, k - 1))
      case LessThan(IntegralLit(k), Subtract(x, y, _)) => Seq((y, x, -k - 1))
      case _ => Seq.empty
    }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !cond.references.exists(_.name == ProbeBinName) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val bounds = conjuncts.flatMap(diffBounds).filter { case (x, y, _) =>
        isIntegral(x) && isIntegral(y) &&
          x.references.nonEmpty && y.references.nonEmpty
      }
      // fire on the first (x, y) pair bounded in BOTH directions:
      // x − y ≤ k₁ and y − x ≤ k₂ establish |x − y| ≤ max(k₁, k₂),
      // which is all the bin blocking needs — the retained original
      // conjuncts enforce the exact (possibly asymmetric) window
      val ranged = bounds.view.flatMap { case (x, y, k1) =>
        bounds.collectFirst {
          case (x2, y2, k2)
              if x2.semanticEquals(y) && y2.semanticEquals(x) &&
                math.max(k1, k2) > 0 =>
            (x, y, math.max(k1, k2))
        }
      }.headOption
      val sided = ranged.flatMap { case (x, y, k) =>
        if (x.references.subsetOf(left.outputSet) &&
          y.references.subsetOf(right.outputSet)) Some((x, y, k))
        else if (y.references.subsetOf(left.outputSet) &&
          x.references.subsetOf(right.outputSet)) Some((y, x, k))
        else None
      }
      sided match {
        case Some((lt, rt, k)) =>
          // probe side: left gains bin, then explodes {bin-1, bin, bin+1}
          val binL = Alias(binOf(asLong(lt), k), BuildBinName)()
          val leftBinned = Project(left.output :+ binL, left)
          val b = binL.toAttribute
          val probes = CreateArray(Seq(
            new Subtract(b, Literal(1L)), b, new Add(b, Literal(1L))))
          val pbin = AttributeReference(ProbeBinName, LongType,
            nullable = probes.dataType.asInstanceOf[ArrayType].containsNull ||
              b.nullable)()
          val generated = Generate(Explode(probes), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(pbin),
            child = leftBinned)
          // build side: right gains its own bin
          val binR = Alias(binOf(asLong(rt), k), BuildBinName + "_r")()
          val rightBinned = Project(right.output :+ binR, right)
          // original condition (incl. the range conjunct) + bin equality
          val newCond = And(cond, EqualTo(pbin, binR.toAttribute))
          val newJoin = Join(generated, rightBinned, Inner, Some(newCond), hint)
          Project(j.output, newJoin)
        case _ => j
      }
  }
}

/** `spark.sql.extensions` entry point (zero-arg class):
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => BinnedRangeJoinRule)
    e.injectPlannerStrategy(_ => AsofJoinStrategy)
  }
}
