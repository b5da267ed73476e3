package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite a point-in-range inner theta-join into a
  * banded equi-join.
  *
  * A join whose only condition is `l.v >= r.lo AND l.v <= r.hi` has no
  * equi-key, so Spark plans a (broadcast) nested-loop join — O(|L|·|R|)
  * comparisons, hopeless at 100 TB. [[graft.operators.RangeJoin.banded]]
  * is the manual fix; this rule applies the same rewrite AUTOMATICALLY
  * at optimization time, so plain `ON v BETWEEN lo AND hi` SQL gets the
  * scalable plan:
  *
  *   - point side gains `bucket = floor(v / width)`
  *   - interval side explodes onto every bucket in
  *     `[floor(lo/width), floor(hi/width)]`
  *   - the join becomes `l.bucket = r.bucket AND <original condition>`
  *     — the equality gives the planner a hash/sort-merge key, the kept
  *     original predicate preserves exact semantics no matter how
  *     intervals straddle buckets.
  *
  * Correctness: floor is monotone, so `lo ≤ v ≤ hi` implies
  * `floor(lo/w) ≤ floor(v/w) ≤ floor(hi/w)` — every matching pair shares
  * the point's bucket; non-matching bucket collisions are removed by the
  * retained range predicate. NULL in v/lo/hi yields a NULL bucket or a
  * NULL sequence (Generate with outer=false drops the row), matching
  * BETWEEN's never-true-on-NULL semantics.
  *
  * Gated on `spark.graft.rangeJoin.binSize` (double > 0; unset = off) —
  * width is a domain decision exactly like the manual API's bucketWidth:
  * it must be chosen so intervals span few buckets (wide intervals would
  * explode to many rows; that trade-off is the caller's, not the
  * rule's). The rewritten join no longer matches the pattern (its
  * condition carries the bucket equality), so the rule is idempotent
  * under the optimizer's fixed-point execution.
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] {

  val WidthKey = "spark.graft.rangeJoin.binSize"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthKey, "0").toDouble
    if (width <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) if cond.deterministic =>
        extract(cond, left, right) match {
          case Some((point, lo, hi, pointOnLeft)) =>
            val (pointSide, boundSide) = if (pointOnLeft) (left, right) else (right, left)
            val bucketL = Alias(bucket(point, width), "__graft_bucket_p")()
            val newPoint = Project(pointSide.output :+ bucketL, pointSide)
            // Sequence is TimeZoneAwareExpression — stays UNRESOLVED
            // without an explicit zone even for integral sequences
            val seq = Sequence(bucket(lo, width), bucket(hi, width),
              stepOpt = None, timeZoneId = Some(conf.sessionLocalTimeZone))
            val bucketR = AttributeReference("__graft_bucket_b", LongType,
              nullable = false)()
            val newBound = Generate(Explode(seq), unrequiredChildIndex = Nil,
              outer = false, qualifier = None,
              generatorOutput = Seq(bucketR), boundSide)
            val newCond = And(EqualTo(bucketL.toAttribute, bucketR), cond)
            val rewritten =
              if (pointOnLeft) Join(newPoint, newBound, Inner, Some(newCond), hint)
              else Join(newBound, newPoint, Inner, Some(newCond), hint)
            Project(j.output, rewritten)
          case None => j
        }
    }
  }

  private def bucket(e: Expression, width: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(width, DoubleType)))

  /** Each comparison read both ways: (point, bound, boundIsLower). */
  private def interps(e: Expression): Seq[(Expression, Expression, Boolean)] =
    e match {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case LessThanOrEqual(a, b) => Seq((a, b, false), (b, a, true))
      case _ => Seq.empty
    }

  /** Match `lo <= point <= hi` in any operand order, with the point
    * referencing exactly one join side and both bounds the other.
    * Returns (point, lo, hi, pointOnLeft).
    */
  private def extract(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Boolean)] = cond match {
    case And(c1, c2) =>
      val combos = for {
        (p1, b1, low1) <- interps(c1)
        (p2, b2, low2) <- interps(c2)
        if low1 != low2 && p1.semanticEquals(p2)
        if p1.dataType.isInstanceOf[NumericType] &&
          b1.dataType.isInstanceOf[NumericType] &&
          b2.dataType.isInstanceOf[NumericType]
        (lo, hi) = if (low1) (b1, b2) else (b2, b1)
        sides <- {
          val pL = p1.references.subsetOf(left.outputSet)
          val pR = p1.references.subsetOf(right.outputSet)
          val bL = (lo.references ++ hi.references).forall(left.outputSet.contains)
          val bR = (lo.references ++ hi.references).forall(right.outputSet.contains)
          // the bound side must actually bind somewhere (constant bounds
          // would make this a plain filter the optimizer already handles)
          if (pL && bR && p1.references.nonEmpty && lo.references.nonEmpty)
            Some(true)
          else if (pR && bL && p1.references.nonEmpty && lo.references.nonEmpty)
            Some(false)
          else None
        }
      } yield (p1, lo, hi, sides)
      combos.headOption
    case _ => None
  }
}
