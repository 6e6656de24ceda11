package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, LongType, NumericType}

/** Optimizer rule: rewrite band theta joins —
  * `L JOIN R ON abs(f(L) - g(R)) < w` — into the bucketed equi-join
  * [[graft.operators.RangeJoin.bandJoin]] implements at the DataFrame
  * level, so a user who writes the DECLARATIVE predicate gets the
  * scale path automatically instead of a broadcast-nested-loop /
  * cartesian plan.
  *
  * Soundness: buckets use width `W = nextUp(w)`, so any qualifying
  * pair has `|a − b| ≤ w < W  ⇒  |a/W − b/W| < 1` strictly in reals
  * ⇒ the floor buckets differ by at most 1 (strictness absorbs the
  * half-ulp division-rounding ties that could otherwise straddle a
  * bucket edge at `|a−b| = w` for the ≤ forms). Equi-joining L's
  * bucket against R replicated into its 3 adjacent buckets therefore
  * finds every qualifying pair exactly once (a pair meets only in
  * the L row's bucket), and the ORIGINAL predicate is kept as a
  * residual inside the join — the rewrite can only change cost,
  * never results (NaN/null quantize to an unmatched or arbitrary
  * bucket; the residual still rejects them, identical to the
  * nested-loop evaluation).
  *
  * Conservative by design: only fires when the ENTIRE join condition
  * is one band predicate over a positive finite numeric literal width
  * with one side per input, and both operands are float/double.
  * Long and Decimal operands are left alone: beyond 2^53 the bucket
  * computation's Double cast rounds, two genuinely qualifying rows
  * can land 2 buckets apart, and the residual predicate can only
  * reject false positives — never recover a pair the equi-join
  * prefilter dropped. Integral operands (byte/short/int) are ALSO
  * excluded even though a Double represents them exactly: under
  * default non-ANSI semantics the original plan's integral
  * Subtract/Abs WRAP on overflow — abs(Int.MinValue − 0) wraps to a
  * negative that passes `< w`, while the rewrite's exact Double
  * buckets put the pair ~2^31/W apart so the candidate is never
  * generated and the residual cannot recover it (and under ANSI the
  * original throws where the rewrite would silently succeed). Either
  * way the rewrite would change observable behavior on overflow
  * inputs, so it abstains. In practice most integral bands coerce to
  * double anyway via a fractional width literal.
  * Anything else — composite conditions, non-literal widths,
  * same-side operands — is also left to Spark.
  * Disable with `spark.graft.optimizer.bandJoinRewrite=false`.
  *
  * Idempotent (fixed-point safe): the rewritten join's condition is a
  * conjunction, which the pattern no longer matches.
  */
object BandJoinRewrite extends Rule[LogicalPlan] {

  val confKey = "spark.graft.optimizer.bandJoinRewrite"

  /** The ONE literal→double coercion both the pattern guard and the
    * bucket-width builder share — a split pair of coercions could
    * drift and turn an abstain-miss into a planning-time MatchError.
    */
  private def literalAsDouble(e: Expression): Option[Double] = e match {
    case Literal(v, _: NumericType) if v != null =>
      v match {
        case x: Double => Some(x)
        case x: Float => Some(x.toDouble)
        case x: Byte => Some(x.toDouble)
        case x: Short => Some(x.toDouble)
        case x: Int => Some(x.toDouble)
        case x: Long => Some(x.toDouble)
        case x: org.apache.spark.sql.types.Decimal => Some(x.toDouble)
        case _ => None
      }
    case _ => None
  }

  /** (leftExpr, rightExpr, width) when `cond` is exactly a band
    * predicate splitting across the two join inputs.
    */
  private def bandPattern(cond: Expression, l: LogicalPlan,
      r: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    def positiveNumericLiteral(e: Expression): Boolean =
      literalAsDouble(e).exists(d => d > 0 && !d.isInfinite && !d.isNaN)
    def split(a: Expression, b: Expression)
        : Option[(Expression, Expression)] =
      if (a.references.subsetOf(l.outputSet) && a.references.nonEmpty &&
          b.references.subsetOf(r.outputSet) && b.references.nonEmpty)
        Some((a, b))
      else if (b.references.subsetOf(l.outputSet) && b.references.nonEmpty &&
          a.references.subsetOf(r.outputSet) && a.references.nonEmpty)
        Some((b, a))
      else None
    val absLtW = cond match {
      case LessThan(Abs(Subtract(a, b, _), _), w) => Some((a, b, w))
      case LessThanOrEqual(Abs(Subtract(a, b, _), _), w) => Some((a, b, w))
      case GreaterThan(w, Abs(Subtract(a, b, _), _)) => Some((a, b, w))
      case GreaterThanOrEqual(w, Abs(Subtract(a, b, _), _)) => Some((a, b, w))
      case _ => None
    }
    // float/double only: Long/Decimal lose exactness on the Double
    // cast; integral types wrap on Subtract/Abs overflow under
    // non-ANSI semantics (see the soundness note in the object doc)
    def doubleExact(t: DataType): Boolean = t match {
      case FloatType | DoubleType => true
      case _ => false
    }
    absLtW.collect {
      case (a, b, w) if positiveNumericLiteral(w) &&
          doubleExact(a.dataType) && doubleExact(b.dataType) =>
        split(a, b).map { case (lx, rx) => (lx, rx, w) }
    }.flatten
  }

  /** Bucket width: nextUp(w), strictly wider than any qualifying
    * |a−b| (< w or = w for the ≤ forms), so (a−b)/width < 1 STRICTLY
    * in reals and the floor buckets of a qualifying pair provably
    * differ by at most 1 even across division-rounding tie boundaries.
    * The width only gates candidate generation — the residual decides
    * membership — so widening it is always sound.
    */
  private def bucketWidth(w: Expression): Expression = {
    // bandPattern only accepts widths literalAsDouble coerces, so the
    // .get can't miss — one shared coercion, no second match to drift
    val d = literalAsDouble(w).get
    Literal(Math.nextUp(d), DoubleType)
  }

  private def bucketOf(e: Expression, w: Expression): Expression =
    Floor(Divide(Cast(e, DoubleType), w))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString(confKey, "true") != "true") return plan
    plan.transform {
      case j @ Join(l, r, Inner | Cross, Some(cond), hint) =>
        bandPattern(cond, l, r) match {
          case Some((lx, rx, w)) =>
            val width = bucketWidth(w)
            val lb = Alias(bucketOf(lx, width), "_graft_bl")()
            val newL = Project(l.output :+ lb, l)
            val rDiv = bucketOf(rx, width)
            val buckets = CreateArray(Seq(
              Subtract(rDiv, Literal(1L)), rDiv, Add(rDiv, Literal(1L))))
            val rb = AttributeReference("_graft_br", LongType)()
            val gen = Generate(Explode(buckets), Nil, outer = false,
              qualifier = None, generatorOutput = Seq(rb), child = r)
            val newCond = And(EqualTo(lb.toAttribute, rb), cond)
            Project(j.output, Join(newL, gen, Inner, Some(newCond), hint))
          case None => j
        }
    }
  }
}
