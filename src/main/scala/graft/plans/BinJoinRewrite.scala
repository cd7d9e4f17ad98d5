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
  * Scope: INNER join whose condition CONTAINS a lower-bound and an
  * upper-bound conjunct on the same LongType point expression (point
  * from one side, both bounds from the other); any extra conjuncts ride
  * along untouched inside the retained original condition (the exact
  * residual filter). Two refusals keep the rewrite profitable: a
  * cross-side equality conjunct means Spark already has a hash-join key
  * — exploding bins there would only multiply rows — and the rewritten
  * join gains an equality conjunct, so the rule cannot re-fire on its
  * own output.
  * Correctness under truncating division (`div`, negatives included):
  * trunc-div is monotone, so lo ≤ pt ≤ hi implies
  * trunc(lo/w) ≤ trunc(pt/w) ≤ trunc(hi/w) — the point's bin always
  * lands inside `[bin(lo), bin(hi)]`, enumerated INCLUSIVE of both raw
  * bounds regardless of the conjuncts' strictness. Strict bounds are NOT
  * normalized with ±1 arithmetic: `Add(hi, 1)` overflows when a bound
  * column carries the common `Long.MaxValue` "unbounded" sentinel (ANSI
  * mode throws ARITHMETIC_OVERFLOW; legacy mode wraps to an inverted
  * interval and silently drops matches). A superset of bins is always
  * safe because the original predicate is kept as the residual filter.
  *
  * Registered by [[GraftExtensions]] (`spark.sql.extensions`) — the
  * `SparkSessionExtensions` path — or dynamically via
  * `spark.experimental.extraOptimizations`.
  */
object BinJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.binjoin.width"

  /** Runtime guard: an interval spanning more than this many bins raises
    * a clear error naming this conf instead of letting the bin explode
    * run into the array-size limit (a sentinel interval like
    * `[0, Long.MaxValue)` would produce ~1e11 bins per row). Bounds are
    * join-side attributes, so the span is only known at runtime; enabling
    * the (opt-in) rule asserts intervals are bounded, and violating that
    * yields an actionable error, not a Sequence overflow deep in a task.
    */
  val MaxBinsConf = "spark.graft.binjoin.maxBinsPerInterval"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // a malformed conf must not take down every query in the session —
    // warn once per invocation and no-op instead
    val width = conf.getConfString(WidthConf, "")
    width.toLongOption match {
      case _ if width.isEmpty => plan
      case None =>
        logWarning(s"$WidthConf='$width' is not a long; bin-join rewrite disabled")
        plan
      case Some(w) if w <= 0 => plan
      case Some(w) =>
        val maxBins = conf.getConfString(MaxBinsConf, "1048576").toLongOption
          .getOrElse(1048576L)
        plan transform {
          case j @ Join(left, right, Inner, Some(cond), hint) =>
            matchRange(cond, left, right) match {
              case Some((pt, lo, hi, ptOnLeft)) =>
                rewrite(j, pt, lo, hi, w, maxBins, hint, ptOnLeft)
              case _ => j
            }
        }
    }
  }

  /** cond contains (among arbitrary conjuncts) a lower-bound conjunct and
    * an upper-bound conjunct on the same point expression (`pt >= lo` /
    * `pt > lo` paired with `pt < hi` / `pt <= hi`, in any conjunct
    * positions), pt from one side, bounds from the other (either
    * assignment of sides) — and NO cross-side equality conjunct (that
    * already makes the join hash-plannable; bins would only add work).
    * Returns the RAW bound expressions — strictness is deliberately
    * discarded (see the object doc: inclusive bin enumeration over raw
    * bounds is a safe superset, and ±1 normalization overflows on
    * sentinel bounds). Extra conjuncts can only narrow the original
    * predicate, so the bin-membership implication lo≤pt≤hi ⇒
    * bin(lo)≤bin(pt)≤bin(hi) derived from the selected pair still covers
    * every surviving row.
    */
  private def matchRange(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    def from(e: Expression, side: LogicalPlan) =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet)
    def isLong(e: Expression) = e.dataType == LongType
    def crossSide(a: Expression, b: Expression) =
      (from(a, left) && from(b, right)) || (from(a, right) && from(b, left))
    def isCrossEq(e: Expression) = e match {
      case EqualTo(a, b) => crossSide(a, b)
      case EqualNullSafe(a, b) => crossSide(a, b)
      case _ => false
    }
    // a conjunct as (pt, raw-lower-bound) if it bounds pt from below
    def lower(e: Expression): Seq[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(pt, lo) => Seq((pt, lo))
      case GreaterThan(pt, lo) => Seq((pt, lo))
      case LessThanOrEqual(lo, pt) => Seq((pt, lo))
      case LessThan(lo, pt) => Seq((pt, lo))
      case _ => Seq.empty
    }
    // a conjunct as (pt, raw-upper-bound) if it bounds pt from above
    def upper(e: Expression): Seq[(Expression, Expression)] = e match {
      case LessThan(pt, hi) => Seq((pt, hi))
      case LessThanOrEqual(pt, hi) => Seq((pt, hi))
      case GreaterThan(hi, pt) => Seq((pt, hi))
      case GreaterThanOrEqual(hi, pt) => Seq((pt, hi))
      case _ => Seq.empty
    }
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.sizeIs < 2 || conjuncts.exists(isCrossEq)) None
    else
      (for {
        (lc, li) <- conjuncts.zipWithIndex
        (uc, ui) <- conjuncts.zipWithIndex
        if li != ui
        (pt1, lo) <- lower(lc)
        (pt2, hi) <- upper(uc)
        if pt1.semanticEquals(pt2) && Seq(pt1, lo, hi).forall(isLong)
        // the mirror: point may come from either child
        ptOnLeft <- Seq(true, false)
        (ptSide, boundSide) = if (ptOnLeft) (left, right) else (right, left)
        if from(pt1, ptSide) && from(lo, boundSide) && from(hi, boundSide)
      } yield (pt1, lo, hi, ptOnLeft)).headOption
  }

  private def rewrite(j: Join, pt: Expression, lo: Expression, hi: Expression,
                      w: Long, maxBins: Long, hint: JoinHint,
                      ptOnLeft: Boolean): LogicalPlan = {
    def divW(e: Expression) = IntegralDivide(e, Literal(w))
    val ptSide = if (ptOnLeft) j.left else j.right
    val boundSide = if (ptOnLeft) j.right else j.left
    // point side: project the point's bin
    val binP = Alias(divW(pt), "__bin_p")()
    val newPtSide = Project(ptSide.output :+ binP, ptSide)
    // bounds side: explode each interval into the bins [bin(lo), bin(hi)]
    // it can touch (inclusive of both raw bounds — a superset when a
    // conjunct was strict; the residual filter is exact). An inverted
    // interval (hi < lo) yields ZERO bins — without the guard Sequence's
    // default -1 step would enumerate downward and generate garbage rows.
    // No ±1 on the bounds anywhere: it overflows on sentinel values.
    val seqExpr = Sequence(divW(lo), divW(hi), None,
      Some(conf.sessionLocalTimeZone))
    // span measured in DOUBLE: a long subtraction overflows for extreme
    // opposite-sign bins (e.g. [Long.MinValue, Long.MaxValue] at width 1),
    // turning the intended "too many bins" error into ARITHMETIC_OVERFLOW
    // (ANSI) or a silent wrap (legacy). The ~2^11-ulp imprecision at that
    // magnitude is irrelevant for a >= maxBins threshold test.
    val span = Subtract(Cast(divW(hi), org.apache.spark.sql.types.DoubleType),
      Cast(divW(lo), org.apache.spark.sql.types.DoubleType))
    val guarded = If(GreaterThan(span, Literal((maxBins - 1).toDouble)),
      Cast(RaiseError(Literal(
        s"bin-join interval spans more than $maxBins bins " +
          s"($MaxBinsConf); raise it, widen $WidthConf, or unset the rule")),
        seqExpr.dataType),
      seqExpr)
    val bins = If(LessThan(hi, lo),
      Literal.create(Array.empty[Long], seqExpr.dataType), guarded)
    val gen = Explode(bins)
    val binB = AttributeReference("__bin_b", LongType,
      nullable = gen.elementSchema.head.nullable)()
    val newBoundSide = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(binB), child = boundSide)
    val newCond = And(EqualTo(binP.toAttribute, binB), j.condition.get)
    val (newLeft, newRight) =
      if (ptOnLeft) (newPtSide, newBoundSide) else (newBoundSide, newPtSide)
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
