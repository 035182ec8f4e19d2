package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType, TimestampType}

/** Optimizer rule: rewrites naive point-in-interval theta joins into the
  * bin-bucketed EQUI join `graft.ops.Joins.rangeJoin` builds by hand.
  *
  * A join whose only cross-side predicates are `point >= start` and
  * `point <= end` (e.g. `p.between(s, e)`) has no equi keys, so Spark
  * plans a nested-loop/cartesian scan — O(n·m), the silent killer for
  * time-interval joins at scale. With this rule enabled, the same query
  * text plans as: left projects `floor(point / binSize)` as its bin key,
  * right explodes each interval into the bins it covers, and the join
  * becomes an equi join on the bin key with the original predicate kept
  * as a residual filter. Exactly one bin matches per qualifying pair
  * (the point's own), so no dedup is introduced; monotone division
  * guarantees no pair is missed.
  *
  * Gated on `spark.graft.rangeJoin.binSize` (positive long, in the
  * point column's units — MICROSECONDS for timestamps, matching
  * `unix_micros` and the manual operator's convention): bin size is a
  * DATA property — roughly the typical interval length — that the
  * optimizer cannot infer from the plan, so the rewrite only fires when
  * the user declares it (the same contract as a range-join hint).
  *
  * The declared bin size is SESSION-SCOPED and applies to every
  * BETWEEN-shaped inner join while set — enable it around the
  * range-join workload and disable after
  * (`Joins.disableRangeJoinRewrite`). A bin size far smaller than an
  * interval makes that interval explode into end-start/binSize bin
  * rows (a huge interval can even exceed sequence limits and fail a
  * query that formerly crawled through a nested loop); far larger, and
  * every row shares one bin — a single-hot-key shuffle. Mixed
  * workloads with different range scales should use the explicit
  * `Joins.rangeJoin` operator per join instead. Idempotent under the optimizer's
  * fixed-point batch: the rewritten join carries an equi conjunct, which
  * disqualifies it from matching again.
  *
  * Registered via `GraftExtensions` (injectOptimizerRule) or
  * `Joins.enableRangeJoinRewrite` (experimental.extraOptimizations).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val BinSizeKey = "spark.graft.rangeJoin.binSize"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val binSize =
      try conf.getConfString(BinSizeKey, "0").toLong
      catch { case _: NumberFormatException => 0L }
    if (binSize <= 0) plan
    else plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        rewrite(j, left, right, cond, binSize) match {
          case Some(r) =>
            // The session-scoped conf re-plans EVERY matching BETWEEN
            // join while set — log each firing so an unintended rewrite
            // (wrong bin size for some other join's interval scale) is
            // visible in the query log instead of silently exploding
            // sequence() fan-out.
            logWarning(
              s"RangeJoinRewrite fired (binSize=$binSize, point units = " +
              s"micros for timestamps) on: ${j.simpleString(6)} — if this " +
              s"join was not the intended target, unset $BinSizeKey or " +
              "use Joins.rangeJoin explicitly")
            r
          case None => j
        }
    }
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case other => Seq(other)
  }

  /** Monotone bin of a numeric/timestamp expression — same arithmetic as
    * `Joins.rangeJoin` (floor of double division). Timestamps bin on
    * MICROSECONDS (`unix_micros` semantics), matching the convention the
    * manual operator documents — a seconds-based cast would make the
    * same binSize value a million times coarser here than there. */
  private def binOf(e: Expression, binSize: Long): Expression = {
    val numeric = e.dataType match {
      case TimestampType => UnixMicros(e)
      case _ => e
    }
    Cast(
      Floor(Divide(
        Cast(numeric, DoubleType, Some(conf.sessionLocalTimeZone)),
        Literal(binSize.toDouble))),
      LongType)
  }

  private def binnable(e: Expression): Boolean = e.dataType match {
    case _: NumericType | TimestampType => true
    case _ => false
  }

  private def rewrite(
      j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, binSize: Long): Option[LogicalPlan] = {
    val conjuncts = splitConj(cond)
    def fromLeft(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(left.outputSet)
    def fromRight(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(right.outputSet)

    // Already hash-joinable → leave it alone (also what makes this rule
    // idempotent: the rewritten join's bin-equality conjunct lands here).
    // EqualNullSafe is hash-joinable too — rewriting over it would trade
    // a selective key join for exploded bin rows.
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (fromLeft(a) && fromRight(b)) || (fromLeft(b) && fromRight(a))
      case EqualNullSafe(a, b) =>
        (fromLeft(a) && fromRight(b)) || (fromLeft(b) && fromRight(a))
      case _ => false
    }
    if (hasEqui) return None

    // point >= start AND point <= end (in either spelling), point from
    // one child, both bounds from the other.
    def bounds(pPlan: LogicalPlan, bPlan: LogicalPlan) = {
      def isP(e: Expression) =
        e.references.nonEmpty && e.references.subsetOf(pPlan.outputSet)
      def isB(e: Expression) =
        e.references.nonEmpty && e.references.subsetOf(bPlan.outputSet)
      val lowers = conjuncts.collect {
        case GreaterThanOrEqual(p, s) if isP(p) && isB(s) => (p, s)
        case LessThanOrEqual(s, p) if isP(p) && isB(s) => (p, s)
      }
      val uppers = conjuncts.collect {
        case LessThanOrEqual(p, e) if isP(p) && isB(e) => (p, e)
        case GreaterThanOrEqual(e, p) if isP(p) && isB(e) => (p, e)
      }
      for {
        (p1, s) <- lowers
        (p2, e) <- uppers
        if p1.semanticEquals(p2) && binnable(p1) && binnable(s) && binnable(e)
      } yield (p1, s, e)
    }

    val pointLeft = bounds(left, right)
    val pointRight = bounds(right, left)

    if (pointLeft.nonEmpty) {
      val (p, s, e) = pointLeft.head
      Some(build(j, binPlan = left, genPlan = right, p, s, e, binSize,
        binnedIsLeft = true))
    } else if (pointRight.nonEmpty) {
      val (p, s, e) = pointRight.head
      Some(build(j, binPlan = right, genPlan = left, p, s, e, binSize,
        binnedIsLeft = false))
    } else None
  }

  /** Assemble: Project(+bin) over the point side, Generate(explode(
    * sequence(binStart, binEnd))) over the interval side, equi+residual
    * join, and a Project restoring the original output. */
  private def build(
      j: Join, binPlan: LogicalPlan, genPlan: LogicalPlan,
      p: Expression, s: Expression, e: Expression, binSize: Long,
      binnedIsLeft: Boolean): LogicalPlan = {
    val binL = Alias(binOf(p, binSize), "_rj_bin")()
    val pointSide = Project(binPlan.output :+ binL, binPlan)
    val binRAttr = AttributeReference("_rj_bins", LongType,
      nullable = true)()
    val seqExpr = Sequence(
      binOf(s, binSize), binOf(e, binSize), None,
      Some(conf.sessionLocalTimeZone))
    val intervalSide = Generate(Explode(seqExpr),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(binRAttr), child = genPlan)
    val equi = EqualTo(binL.toAttribute, binRAttr)
    val (newLeft, newRight) =
      if (binnedIsLeft) (pointSide, intervalSide)
      else (intervalSide, pointSide)
    val newJoin = Join(newLeft, newRight, Inner,
      Some(And(equi, j.condition.get)), j.hint)
    Project(j.output, newJoin)
  }
}
