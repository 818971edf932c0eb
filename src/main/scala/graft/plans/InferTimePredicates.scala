package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampNTZType, TimestampType}

/** Optimizer rule: derive scan-pushable raw-column predicates from integral-
  * division comparisons.
  *
  * The canonical events adapter computes `ts_us = CAST(ts DIV 1000 AS LONG)`
  * from a nanosecond LONG column. After alias substitution, a time filter
  * becomes `(ts DIV 1000) >= v` — an expression predicate the parquet source
  * cannot push, so every row group is read. For positive divisors k and
  * positive comparison values v, integral division admits exact implied
  * bounds on the raw column:
  *
  *   x DIV k >= v  (v > 0)  ⟹  x >= v*k
  *   x DIV k >  v  (v >= 0) ⟹  x >= (v+1)*k
  *   x DIV k <= v  (v >= 0) ⟹  x <= (v+1)*k - 1
  *   x DIV k <  v  (v > 0)  ⟹  x <= v*k - 1
  *   x DIV k =  v  (v > 0)  ⟹  v*k <= x <= (v+1)*k - 1
  *
  * (The v-positivity guards make the implications valid for negative x under
  * truncate-toward-zero division; timestamps are far positive anyway.)
  * The implied conjunct is ADDED, never substituted, so semantics are
  * preserved unconditionally and the raw-attribute bound reaches the scan as
  * a PushedFilter → row-group pruning.
  */
object InferTimePredicates extends Rule[LogicalPlan] {

  private def divOf(e: Expression): Option[(Attribute, Long)] = e match {
    case Cast(IntegralDivide(a: Attribute, Literal(k: Long, LongType), _), LongType, _, _)
      if k > 0 => Some((a, k))
    case Cast(IntegralDivide(a: Attribute, Literal(k: Int, IntegerType), _), LongType, _, _)
      if k > 0 => Some((a, k.toLong))
    case IntegralDivide(a: Attribute, Literal(k: Long, LongType), _) if k > 0 => Some((a, k))
    case _ => None
  }

  private def litVal(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, IntegerType) => Some(v.toLong)
    case _ => None
  }

  /** The TIMESTAMP_NTZ lane of `Canon.tsUsExpr`: `unix_micros(cast(ts as
    * timestamp))` over a naive-µs attribute. Both NTZ and TIMESTAMP are
    * µs longs internally and the cast is the identity on that long exactly
    * when its zone is a zero offset — which the UTC session pin guarantees;
    * the zone guard makes the rewrite safe even if a caller unpins it.
    * The comparison then transfers to the raw attribute BIJECTIVELY (no
    * division rounding): micros(a) >= v  ⟺  a >= ntz_literal(v).
    */
  private def microsOf(e: Expression): Option[Attribute] = e match {
    case UnixMicros(c @ Cast(a: Attribute, TimestampType, _, _))
      if a.dataType == TimestampNTZType && c.timeZoneId.exists(isZeroOffset) => Some(a)
    case _ => None
  }

  private def isZeroOffset(tz: String): Boolean =
    try {
      val rules = java.time.ZoneId.of(tz).getRules
      rules.isFixedOffset && rules.getOffset(java.time.Instant.EPOCH).getTotalSeconds == 0
    } catch { case _: java.time.DateTimeException => false }

  private def ntzLit(v: Long): Literal = Literal(v, TimestampNTZType)

  private def rewritable(e: Expression): Boolean =
    divOf(e).isDefined || microsOf(e).isDefined

  private def implied(cmp: Expression): Option[Expression] = cmp match {
    // Literal-on-left forms normalize to the mirrored comparison FIRST —
    // these cases must precede the unguarded ones below, which would
    // otherwise match and return None (divOf of a literal fails), leaving
    // `5 <= x DIV 1000`-shaped predicates without derived bounds. The
    // divOf(r) guard prevents a literal-vs-literal comparison (possible if
    // this rule ever sees a plan before constant folding) from mirroring
    // back and forth forever.
    case GreaterThanOrEqual(l, r) if litVal(l).isDefined && rewritable(r) =>
      implied(LessThanOrEqual(r, l))
    case GreaterThan(l, r) if litVal(l).isDefined && rewritable(r) =>
      implied(LessThan(r, l))
    case LessThanOrEqual(l, r) if litVal(l).isDefined && rewritable(r) =>
      implied(GreaterThanOrEqual(r, l))
    case LessThan(l, r) if litVal(l).isDefined && rewritable(r) =>
      implied(GreaterThan(r, l))
    case EqualTo(l, r) if litVal(l).isDefined && rewritable(r) => implied(EqualTo(r, l))
    // µs-bijective NTZ lane: exact transfer, every comparison and both
    // comparison directions (mirrored above), no positivity guard needed
    case GreaterThanOrEqual(l, r) if microsOf(l).isDefined =>
      for (a <- microsOf(l); v <- litVal(r)) yield GreaterThanOrEqual(a, ntzLit(v))
    case GreaterThan(l, r) if microsOf(l).isDefined =>
      for (a <- microsOf(l); v <- litVal(r)) yield GreaterThan(a, ntzLit(v))
    case LessThanOrEqual(l, r) if microsOf(l).isDefined =>
      for (a <- microsOf(l); v <- litVal(r)) yield LessThanOrEqual(a, ntzLit(v))
    case LessThan(l, r) if microsOf(l).isDefined =>
      for (a <- microsOf(l); v <- litVal(r)) yield LessThan(a, ntzLit(v))
    case EqualTo(l, r) if microsOf(l).isDefined =>
      for (a <- microsOf(l); v <- litVal(r)) yield EqualTo(a, ntzLit(v))
    case GreaterThanOrEqual(l, r) =>
      for ((a, k) <- divOf(l); v <- litVal(r) if v > 0 && v <= Long.MaxValue / k)
        yield GreaterThanOrEqual(a, Literal(v * k))
    case GreaterThan(l, r) =>
      for ((a, k) <- divOf(l); v <- litVal(r) if v >= 0 && v + 1 <= Long.MaxValue / k)
        yield GreaterThanOrEqual(a, Literal((v + 1) * k))
    case LessThanOrEqual(l, r) =>
      for ((a, k) <- divOf(l); v <- litVal(r) if v >= 0 && v + 1 <= Long.MaxValue / k)
        yield LessThanOrEqual(a, Literal((v + 1) * k - 1))
    case LessThan(l, r) =>
      for ((a, k) <- divOf(l); v <- litVal(r) if v > 0 && v <= Long.MaxValue / k)
        yield LessThanOrEqual(a, Literal(v * k - 1))
    case EqualTo(l, r) =>
      for ((a, k) <- divOf(l); v <- litVal(r) if v > 0 && v + 1 <= Long.MaxValue / k)
        yield And(GreaterThanOrEqual(a, Literal(v * k)),
          LessThanOrEqual(a, Literal((v + 1) * k - 1)))
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val derived = conjuncts.flatMap(implied)
        .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
      if (derived.isEmpty) f
      else Filter(derived.foldLeft(cond)(And(_, _)), child)
  }
}
