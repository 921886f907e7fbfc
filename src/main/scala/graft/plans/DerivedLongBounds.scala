package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{Decimal, DecimalType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Derived-column predicate pushdown for integer time math.
  *
  * Every user-facing query works in MICROS (`ts_us`) or NANOS (`ts_ns`),
  * both DERIVED from the raw stored column — a plain epoch-nanos long in
  * the bucketed event-store layout, a parquet TIMESTAMP[_NTZ] in the
  * driver testdata (`ts_us = unix_micros(cast(ts))`, `ts_ns = ts_us *
  * 1000`; see Tables.events). A filter on a derived column defeats
  * parquet pushdown: Catalyst substitutes the alias when pushing the
  * predicate through the projection, leaving e.g. `Filter(floor(ts /
  * 1000) >= lo)` or `Filter(unix_micros(cast(ts)) * 1000 >= lo)` over
  * the scan — and neither a division nor a function chain is a pushable
  * filter, so only IsNotNull reaches the reader (the round-1 pushdown
  * bug).
  *
  * This rule closes the gap for ANY user-written query: every conjunct
  * comparing a MONOTONE EXACT chain over a raw column against a literal
  * gains an IMPLIED raw-column bound conjunct — `ts_us >= lo` emits
  * `ts >= lo*1000` on a nanos-long column, or `ts >= TIMESTAMP_NTZ(lo)`
  * on a timestamp column — which IS pushable: at 100 TB that is the
  * difference between scanning every row group and pruning by min/max
  * stats. The chain steps understood, each with exact integer bound
  * transport (PropertySpec pins the iffs):
  *
  *  - `floor(x::decimal / d)` (TimeFns.ldiv) and `x DIV d` (SQL
  *    IntegralDivide, truncate-toward-zero) for positive literal d;
  *  - `x * d` for positive literal d (ceil/floor-division transport);
  *  - exact widening casts (long -> decimal with >= 19 integer digits,
  *    integral-valued result -> long);
  *  - `unix_micros(t)` (identity on the internal micros value) and
  *    `cast(ntz as timestamp)` — the latter ONLY under a UTC session
  *    zone, where it is the identity on micros (in a DST zone the cast
  *    is not even monotone).
  *
  * The original predicate is kept (the added bound is a necessary
  * condition, never a replacement), so semantics are unchanged even at
  * rounding edges. Registered both via `GraftExtensions
  * .injectOptimizerRule` and (for driver-owned sessions)
  * `GraftSession.prepare` -> `experimental.extraOptimizations`, which
  * runs after alias substitution has exposed the chain shape.
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

  /** Minimal x with x*d >= lo (d > 0): ceil(lo / d) — floorDiv of the
    * adjusted numerator, exact for every sign of lo. */
  private[graft] def lowerBoundForMul(lo: Long, d: Long): Long =
    Math.floorDiv(lo + (d - 1), d)

  /** Maximal x with x*d <= hi (d > 0): floor(hi / d). */
  private[graft] def upperBoundForMul(hi: Long, d: Long): Long =
    Math.floorDiv(hi, d)

  /** cast(ntz as timestamp) is the identity on the internal micros value
    * only when the target zone is UTC (elsewhere it shifts by a
    * time-varying offset and is not monotone across DST gaps). */
  private def utcZone(zoneId: Option[String]): Boolean = {
    val z = zoneId.getOrElse(SQLConf.get.sessionLocalTimeZone)
    try java.time.ZoneId.of(z).normalized() == java.time.ZoneOffset.UTC
    catch { case _: Exception => false }
  }

  /** Raw-column comparison implied by `chain >= lo` (`lower`) or
    * `chain <= hi` (`upper`): walk one monotone exact step, transport the
    * bound, recurse. Terminates at a raw long or timestamp attribute —
    * the pushable comparison — or None when a step is not understood. */
  private def lowerOn(e: Expression, lo: Long): Option[Expression] = e match {
    case a: AttributeReference if a.dataType == LongType =>
      Some(GreaterThanOrEqual(a, Literal(lo, LongType)))
    case a: AttributeReference if a.dataType == TimestampNTZType =>
      Some(GreaterThanOrEqual(a, Literal(lo, TimestampNTZType)))
    case a: AttributeReference if a.dataType == TimestampType =>
      Some(GreaterThanOrEqual(a, Literal(lo, TimestampType)))
    case c: Cast => castStep(c).flatMap(lowerOn(_, lo))
    case u: UnixMicros => lowerOn(u.child, lo)
    case Floor(Divide(x, d, _)) =>
      for (dv <- litLong(d) if dv > 0 && safe(lo, dv);
           r <- lowerOn(x, lowerBoundFor(lo, dv, isFloor = true))) yield r
    case i: IntegralDivide =>
      for (dv <- litLong(i.right) if dv > 0 && safe(lo, dv);
           r <- lowerOn(i.left, lowerBoundFor(lo, dv, isFloor = false))) yield r
    case m: Multiply => mulStep(m).flatMap { case (x, d) => lowerOn(x, lowerBoundForMul(lo, d)) }
    case _ => None
  }

  private def upperOn(e: Expression, hi: Long): Option[Expression] = e match {
    case a: AttributeReference if a.dataType == LongType =>
      Some(LessThanOrEqual(a, Literal(hi, LongType)))
    case a: AttributeReference if a.dataType == TimestampNTZType =>
      Some(LessThanOrEqual(a, Literal(hi, TimestampNTZType)))
    case a: AttributeReference if a.dataType == TimestampType =>
      Some(LessThanOrEqual(a, Literal(hi, TimestampType)))
    case c: Cast => castStep(c).flatMap(upperOn(_, hi))
    case u: UnixMicros => upperOn(u.child, hi)
    case Floor(Divide(x, d, _)) =>
      for (dv <- litLong(d) if dv > 0 && safe(hi, dv);
           r <- upperOn(x, upperBoundFor(hi, dv, isFloor = true))) yield r
    case i: IntegralDivide =>
      for (dv <- litLong(i.right) if dv > 0 && safe(hi, dv);
           r <- upperOn(i.left, upperBoundFor(hi, dv, isFloor = false))) yield r
    case m: Multiply => mulStep(m).flatMap { case (x, d) => upperOn(x, upperBoundForMul(hi, d)) }
    case _ => None
  }

  /** Casts that preserve the integer value (and ordering) exactly:
    * long -> wide decimal (ldiv's operand cast), integral-valued -> long
    * (ldiv's result cast), and ntz -> timestamp under UTC (identity on
    * the internal micros). Returns the unwrapped child. */
  private def castStep(c: Cast): Option[Expression] = c.dataType match {
    case t: DecimalType if t.precision - t.scale >= 19 => Some(c.child)
    case LongType => Some(c.child)
    case TimestampType if c.child.dataType == TimestampNTZType && utcZone(c.timeZoneId) =>
      Some(c.child)
    case _ => None
  }

  /** Multiplication by a positive literal, either side. */
  private def mulStep(m: Multiply): Option[(Expression, Long)] =
    litLong(m.right).filter(_ > 0).map(d => (m.left, d))
      .orElse(litLong(m.left).filter(_ > 0).map(d => (m.right, d)))

  /** A chain is only worth deriving for when it is genuinely DERIVED —
    * a bare attribute comparison is already pushable, and re-emitting it
    * would survive the semanticEquals dedup in rewritten literal-order
    * form. */
  private def isDerived(e: Expression): Boolean = e match {
    case _: AttributeReference => false
    case _ => true
  }

  private def derive(conjunct: Expression): Seq[Expression] = conjunct match {
    case GreaterThanOrEqual(e, LitL(lo)) if isDerived(e) => lowerOn(e, lo).toSeq
    case GreaterThan(e, LitL(lo)) if isDerived(e) && lo < Long.MaxValue =>
      lowerOn(e, lo + 1).toSeq
    case LessThanOrEqual(e, LitL(hi)) if isDerived(e) => upperOn(e, hi).toSeq
    case LessThan(e, LitL(hi)) if isDerived(e) && hi > Long.MinValue =>
      upperOn(e, hi - 1).toSeq
    case EqualTo(e, LitL(v)) if isDerived(e) =>
      (lowerOn(e, v) ++ upperOn(e, v)).toSeq
    // literal on the left: flip
    case GreaterThanOrEqual(LitL(hi), e) if isDerived(e) => upperOn(e, hi).toSeq
    case GreaterThan(LitL(hi), e) if isDerived(e) && hi > Long.MinValue =>
      upperOn(e, hi - 1).toSeq
    case LessThanOrEqual(LitL(lo), e) if isDerived(e) => lowerOn(e, lo).toSeq
    case LessThan(LitL(lo), e) if isDerived(e) && lo < Long.MaxValue =>
      lowerOn(e, lo + 1).toSeq
    case EqualTo(LitL(v), e) if isDerived(e) =>
      (lowerOn(e, v) ++ upperOn(e, v)).toSeq
    case _ => Seq.empty
  }

  private object LitL {
    def unapply(e: Expression): Option[Long] = e match {
      case l: Literal => litLong(l)
      case c: Cast => litLong(c)
      case _ => None
    }
  }
}
