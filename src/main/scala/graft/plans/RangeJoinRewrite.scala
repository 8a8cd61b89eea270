package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Conf-gated Catalyst optimizer rule that rewrites point-in-interval
  * inner joins into the bucketed range-join form ([[graft.ext.RangeJoin]]'s
  * expansion, applied automatically inside the optimizer).
  *
  * Spark plans a bare `lo <= p AND p <= hi` join as a
  * BroadcastNestedLoopJoin — O(|P|·|I|) pairs, fatal beyond toy scale. The
  * DataFrame-level escape hatch is `RangeJoin.pointInInterval`; this rule
  * is the engine-level version (registered via
  * [[graft.GraftExtensions]] `injectOptimizerRule`): when
  * `spark.graft.rangeJoin.bucketWidth` is set to a positive long, any
  * eligible join is rewritten to
  *
  *   - point side:    project `__graft_pb = p - (p mod w)`
  *   - interval side: filter `lo <= hi`, explode
  *                    `sequence(lo - lo mod w, hi - hi mod w, step w)`
  *   - join:          equi on the bucket ids AND the original predicate
  *
  * which the planner then executes as a hash shuffle join. The output
  * attribute ids are preserved exactly (a final Project restores the
  * original schema), so parent operators are untouched.
  *
  * Eligibility is deliberately narrow — semantics first: inner join whose
  * condition's ONLY cross-side conjuncts are the two `<=` range bounds on
  * integer-typed attribute references (an additional equi key would
  * already make it a hash join, and any shape this rule does not
  * recognize is left exactly as written). Off by default: the width is a
  * data decision (pick it near the typical interval span), so it must be
  * chosen deliberately per session or per query.
  */
case class RangeJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  private val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  private def intLike(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** `e - (e pmod w)` — the floored multiple of `w`, exact for any Long
    * including negatives (Pmod is non-negative). */
  private def bucketOf(e: Expression, w: Long): Expression = {
    val el = asLong(e)
    Subtract(el, Pmod(el, Literal(w, LongType)))
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Orient a comparison as (small, large) when it is `small <= large`. */
  private def asLe(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(a, b) => Some((a, b))
    case GreaterThanOrEqual(a, b) => Some((b, a))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = spark.conf.getOption(WidthKey).flatMap(s => scala.util.Try(s.toLong).toOption)
    if (!width.exists(_ > 0)) return plan
    val w = width.get

    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && !j.isStreaming =>
        val parts = conjuncts(cond)
        val crossSide = parts.filter(p =>
          p.references.intersect(left.outputSet).nonEmpty &&
            p.references.intersect(right.outputSet).nonEmpty)
        val bounds = crossSide.flatMap(asLe)
        // exactly two cross-side conjuncts, both <=-orientable
        if (crossSide.size != 2 || bounds.size != 2) j
        else {
          // find the shared point attribute: one bound is (lo, p), the other (p, hi)
          val candidate = for {
            Seq((a1, b1), (a2, b2)) <- Some(bounds)
            (p, lo, hi) <-
              if (b1.semanticEquals(a2)) Some((b1, a1, b2))
              else if (b2.semanticEquals(a1)) Some((b2, a2, b1))
              else None
            pAttr <- p match { case a: AttributeReference => Some(a); case _ => None }
            loAttr <- lo match { case a: AttributeReference => Some(a); case _ => None }
            hiAttr <- hi match { case a: AttributeReference => Some(a); case _ => None }
            if intLike(pAttr) && intLike(loAttr) && intLike(hiAttr)
            // p from one side, lo+hi together from the other
            sides <-
              if (left.outputSet.contains(pAttr) &&
                right.outputSet.contains(loAttr) && right.outputSet.contains(hiAttr))
                Some((left, right, false))
              else if (right.outputSet.contains(pAttr) &&
                left.outputSet.contains(loAttr) && left.outputSet.contains(hiAttr))
                Some((right, left, true))
              else None
          } yield (pAttr, loAttr, hiAttr, sides)

          candidate match {
            case None => j
            case Some((p, lo, hi, (pointPlan, intervalPlan, swapped))) =>
              val pb = Alias(bucketOf(p, w), "__graft_pb")()
              val newPoint = Project(pointPlan.output :+ pb, pointPlan)
              val ib = AttributeReference("__graft_ib", LongType, nullable = false)()
              // Sequence is TimeZoneAwareExpression: without an explicit
              // timezone it reports unresolved and fails plan validation,
              // even though integral sequences never consult it
              val seq = Sequence(
                bucketOf(lo, w), bucketOf(hi, w),
                Some(Literal(w, LongType)),
                Some(conf.sessionLocalTimeZone))
              val newInterval = Generate(
                Explode(seq), unrequiredChildIndex = Nil, outer = false,
                qualifier = None, generatorOutput = Seq(ib),
                Filter(LessThanOrEqual(lo, hi), intervalPlan))
              val (nl, nr) =
                if (swapped) (newInterval, newPoint) else (newPoint, newInterval)
              val newJoin = Join(nl, nr, Inner,
                Some(And(EqualTo(pb.toAttribute, ib), cond)), hint)
              // restore the original schema and attribute order exactly
              Project(j.output, newJoin)
          }
        }
    }
  }
}
