package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: rewrite a pure range-condition inner join
  * (`l.pt >= r.lo AND l.pt < r.hi`, no equi-keys) into the bin join
  * `operators.RangeJoin` builds by hand — Spark's only physical strategy
  * for a joins without equi-keys is BroadcastNestedLoopJoin, O(|L|·|R|)
  * work at any scale, while the rewritten form is a hash equi-join on a
  * quantized bin key plus the exact-bounds residual filter.
  *
  * Opt-in: set `spark.graft.binjoin.width` (bin width in the point
  * column's units, e.g. 86400000 for day bins over epoch-ms) — bin width
  * is a domain decision (interval length scale), not something the
  * optimizer can infer without column statistics, so the default is off
  * and the rule is a no-op.
  *
  * Scope is deliberately strict: INNER join whose condition is EXACTLY
  * the two range conjuncts over LongType expressions, point from the
  * left, bounds from the right (or the mirror). The rewritten join gains
  * an equality conjunct, so the rule cannot re-fire on its own output.
  * Correctness under truncating division (`div`, negatives included):
  * trunc-div is monotone, so lo ≤ pt ≤ hi−1 implies
  * trunc(lo/w) ≤ trunc(pt/w) ≤ trunc((hi−1)/w) — the point's bin always
  * lands inside the interval's enumerated bin range.
  *
  * Registered by [[GraftExtensions]] (`spark.sql.extensions`) — the
  * `SparkSessionExtensions` path — or dynamically via
  * `spark.experimental.extraOptimizations`.
  */
object BinJoinRewrite extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.binjoin.width"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthConf, "")
    if (width.isEmpty || width.toLong <= 0) plan
    else {
      val w = width.toLong
      plan transform {
        case j @ Join(left, right, Inner, Some(cond), hint) =>
          matchRange(cond, left, right) match {
            case Some((pt, lo, hi)) => rewrite(j, left, right, pt, lo, hi, w, hint)
            case None => j
          }
      }
    }
  }

  /** cond is exactly a lower-bound conjunct and an upper-bound conjunct
    * on the same point expression (`pt >= lo` / `pt > lo` paired with
    * `pt < hi` / `pt <= hi`, in either conjunct order), pt from one side,
    * bounds from the other. Returns (pt, lo', hi') normalized to the
    * half-open `[lo', hi')` form — exact for LongType: `pt > lo ⇔
    * pt >= lo+1` and `pt <= hi ⇔ pt < hi+1` over integers.
    */
  private def matchRange(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression)] = {
    def from(e: Expression, side: LogicalPlan) =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet)
    def isLong(e: Expression) = e.dataType == LongType
    // a conjunct as (pt, inclusive-lower-bound) if it bounds pt from below
    def lower(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(pt, lo) => Some((pt, lo))
      case GreaterThan(pt, lo) => Some((pt, Add(lo, Literal(1L))))
      case LessThanOrEqual(lo, pt) => Some((pt, lo))
      case LessThan(lo, pt) => Some((pt, Add(lo, Literal(1L))))
      case _ => None
    }
    // a conjunct as (pt, exclusive-upper-bound) if it bounds pt from above
    def upper(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThan(pt, hi) => Some((pt, hi))
      case LessThanOrEqual(pt, hi) => Some((pt, Add(hi, Literal(1L))))
      case GreaterThan(hi, pt) => Some((pt, hi))
      case GreaterThanOrEqual(hi, pt) => Some((pt, Add(hi, Literal(1L))))
      case _ => None
    }
    cond match {
      case And(a, b) =>
        val pairs = Seq((a, b), (b, a))
        pairs.flatMap { case (lc, uc) =>
          for {
            (pt1, lo) <- lower(lc)
            (pt2, hi) <- upper(uc)
            if pt1.semanticEquals(pt2) && Seq(pt1, lo, hi).forall(isLong) &&
              from(pt1, left) && from(lo, right) && from(hi, right)
          } yield (pt1, lo, hi)
        }.headOption
      case _ => None
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      pt: Expression, lo: Expression, hi: Expression,
                      w: Long, hint: JoinHint): LogicalPlan = {
    def divW(e: Expression) = IntegralDivide(e, Literal(w))
    // left: project the point's bin
    val binL = Alias(divW(pt), "__bin_l")()
    val newLeft = Project(left.output :+ binL, left)
    // right: explode each interval into the bins it covers
    val seqExpr = Sequence(divW(lo), divW(Subtract(hi, Literal(1L))), None,
      Some(conf.sessionLocalTimeZone))
    val gen = Explode(seqExpr)
    val binR = AttributeReference("__bin_r", LongType,
      nullable = gen.elementSchema.head.nullable)()
    val newRight = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(binR), child = right)
    val newCond = And(EqualTo(binL.toAttribute, binR), j.condition.get)
    // restore the original output (the bin columns are internal)
    Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` wires the engine's
  * Catalyst extensions into a session at build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => BinJoinRewrite)
}
