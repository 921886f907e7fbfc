package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{Decimal, DecimalType, IntegerType, LongType}

/** Derived-column predicate pushdown for integer-division time math.
  *
  * The event log stores `ts` as raw epoch NANOS (a plain long); every
  * user-facing query works in MICROS via `ts_us = floor(ts::decimal /
  * 1000)` (`TimeFns.ldiv` — exact where double division is not) or the
  * SQL `ts DIV 1000`. A filter on the derived column defeats parquet
  * pushdown: Catalyst substitutes the alias when pushing the predicate
  * through the projection, leaving `Filter(floor(ts / 1000) >= lo)` over
  * the scan — and a division is not a pushable filter, so only IsNotNull
  * reaches the reader (the round-1 pushdown bug, until now avoided by
  * convention via `Tables.tsUsBetween`).
  *
  * This rule closes the gap for ANY user-written query: every conjunct
  * comparing `floor(x / d)` (floor semantics, the ldiv/decimal shape) or
  * `x div d` (truncate-toward-zero, SQL DIV) against a literal gains an
  * IMPLIED raw-column bound conjunct — e.g. `ts_us >= lo` additionally
  * emits `ts >= lo * 1000` — which IS pushable: at 100 TB that is the
  * difference between scanning every row group and pruning by min/max
  * stats. The original predicate is kept (the added bound is a necessary
  * condition, never a replacement), so semantics are unchanged even at
  * the division's rounding edges; truncate-vs-floor asymmetry around
  * zero is accounted for per sign below. Registered both via
  * `GraftExtensions.injectOptimizerRule` and (for driver-owned sessions)
  * `GraftSession.prepare` -> `experimental.extraOptimizations`, which
  * runs after alias substitution has exposed the division shape.
  */
object DerivedLongBounds extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitAnd(cond)
      val derived = conjuncts.flatMap(derive)
        .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
        .distinct
      if (derived.isEmpty) f
      else Filter((conjuncts ++ derived).reduce(And), child)
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  /** A division of a raw long attribute by a positive literal:
    * (attribute, divisor, floorSemantics). */
  private def divOf(e: Expression): Option[(AttributeReference, Long, Boolean)] = e match {
    case d: IntegralDivide => // SQL `x DIV d`: truncates toward zero
      for (dv <- litLong(d.right) if dv > 0; a <- longAttr(d.left)) yield (a, dv, false)
    case c: Cast if c.dataType == LongType => divOf(c.child) // ldiv's final cast
    case fl: Floor => fl.child match { // ldiv: floor(x::decimal / d)
      case dv: Divide =>
        for (d <- litLong(dv.right) if d > 0; a <- longAttr(dv.left)) yield (a, d, true)
      case _ => None
    }
    case _ => None
  }

  /** The long attribute under exact (order-preserving, injective) casts:
    * identity or long -> decimal with >= 19 integer digits. */
  private def longAttr(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference if a.dataType == LongType => Some(a)
    case c: Cast =>
      c.dataType match {
        case t: DecimalType if t.precision - t.scale >= 19 => longAttr(c.child)
        case _ => None
      }
    case _ => None
  }

  private def litLong(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case Literal(d: Decimal, _: DecimalType) if d.toBigDecimal.isWhole => Some(d.toLong)
    case c: Cast => litLong(c.child)
    case _ => None
  }

  /** Largest |bound| for which bound*d + (d-1) cannot overflow. */
  private def safe(bound: Long, d: Long): Boolean =
    math.abs(bound) < Long.MaxValue / d - 1

  /** Minimal x with div(x, d) >= lo — an EXACT equivalence, not just an
    * implied bound (PropertySpec pins the iff for both semantics).
    * floor: div(x) >= lo <=> x >= lo*d. trunc: same for lo >= 1; around
    * zero truncation admits x down to lo*d - (d-1). */
  private[graft] def lowerBoundFor(lo: Long, d: Long, isFloor: Boolean): Long =
    if (isFloor || lo >= 1) lo * d else lo * d - (d - 1)

  /** Maximal x with div(x, d) <= hi (exact equivalence, see above).
    * floor: div(x) <= hi <=> x <= hi*d + d-1. trunc: same for hi >= 0;
    * for hi <= -1 truncation caps at hi*d. */
  private[graft] def upperBoundFor(hi: Long, d: Long, isFloor: Boolean): Long =
    if (isFloor || hi >= 0) hi * d + (d - 1) else hi * d

  private def lower(a: AttributeReference, lo: Long, d: Long, isFloor: Boolean) =
    GreaterThanOrEqual(a, Literal(lowerBoundFor(lo, d, isFloor), LongType))

  private def upper(a: AttributeReference, hi: Long, d: Long, isFloor: Boolean) =
    LessThanOrEqual(a, Literal(upperBoundFor(hi, d, isFloor), LongType))

  private def derive(conjunct: Expression): Seq[Expression] = conjunct match {
    case GreaterThanOrEqual(DivD(a, d, fl), LitL(lo)) if safe(lo, d) => Seq(lower(a, lo, d, fl))
    case GreaterThan(DivD(a, d, fl), LitL(lo)) if lo < Long.MaxValue && safe(lo + 1, d) =>
      Seq(lower(a, lo + 1, d, fl))
    case LessThanOrEqual(DivD(a, d, fl), LitL(hi)) if safe(hi, d) => Seq(upper(a, hi, d, fl))
    case LessThan(DivD(a, d, fl), LitL(hi)) if hi > Long.MinValue && safe(hi - 1, d) =>
      Seq(upper(a, hi - 1, d, fl))
    case EqualTo(DivD(a, d, fl), LitL(v)) if safe(v, d) =>
      Seq(lower(a, v, d, fl), upper(a, v, d, fl))
    // literal on the left: flip
    case GreaterThanOrEqual(LitL(hi), DivD(a, d, fl)) if safe(hi, d) => Seq(upper(a, hi, d, fl))
    case GreaterThan(LitL(hi), DivD(a, d, fl)) if hi > Long.MinValue && safe(hi - 1, d) =>
      Seq(upper(a, hi - 1, d, fl))
    case LessThanOrEqual(LitL(lo), DivD(a, d, fl)) if safe(lo, d) => Seq(lower(a, lo, d, fl))
    case LessThan(LitL(lo), DivD(a, d, fl)) if lo < Long.MaxValue && safe(lo + 1, d) =>
      Seq(lower(a, lo + 1, d, fl))
    case EqualTo(LitL(v), DivD(a, d, fl)) if safe(v, d) =>
      Seq(lower(a, v, d, fl), upper(a, v, d, fl))
    case _ => Seq.empty
  }

  private object DivD {
    def unapply(e: Expression): Option[(AttributeReference, Long, Boolean)] = divOf(e)
  }

  private object LitL {
    def unapply(e: Expression): Option[Long] = e match {
      case l: Literal => litLong(l)
      case c: Cast => litLong(c)
      case _ => None
    }
  }
}
