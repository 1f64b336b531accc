package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Restores filter pushdown over NANOS-encoded timestamp columns.
  *
  * Parquet TIMESTAMP(NANOS) columns are read as raw int64 nanos and converted
  * with `timestamp_micros(col div 1000)` (Tables.load — Spark's vectorized
  * reader has no nanos type). That wraps the scan column in function calls,
  * so a time-range predicate like `ts >= timestamp'…'` can no longer be
  * translated into a parquet PushedFilter — at the 100 TB design point a
  * time-windowed query would full-scan the fact table (found by the r7
  * ClickBench plan audit: cb12's range predicate stayed in the Filter node).
  *
  * The rewrite is the exact inverse of Spark's `div` (IntegralDivide), which
  * truncates toward ZERO — not floor. With q = trunc(c/1000) and m = micros(L):
  *
  *   q >= m  ⟺  c >= lo(m)   where lo(m) = m·1000        for m > 0
  *                                         m·1000 − 999   for m ≤ 0
  *   q <= m  ⟺  c <= hi(m)   where hi(m) = m·1000        for m < 0
  *                                         m·1000 + 999   for m ≥ 0
  *   q >  m  ⟺  c >= lo(m+1);   q < m  ⟺  c <= hi(m−1)
  *   q  = m  ⟺  lo(m) <= c <= hi(m)
  *
  * (For negative c, trunc rounds UP: c = −1500 → q = −1, so q >= −1 must
  * admit c down to −1999 = lo(−1) — a pure ×1000 bound would silently drop
  * pre-epoch rows.) Applied only when the other side is a non-null timestamp
  * literal whose micros fit a Long after ×1000 with the ±999 slack.
  *
  * Null semantics are unchanged (comparisons stay null-propagating on c).
  * Installed via spark.experimental.extraOptimizations (session path) and
  * injectOptimizerRule (GraftExtensions cluster path); both run before
  * physical planning, so FileSourceStrategy sees a bare-column comparison it
  * can translate.
  */
object NanosTimestampPushdown extends Rule[LogicalPlan] {

  /** Matches timestamp_micros(c div 1000) and yields the raw nanos column. */
  private object NanosToMicrosToTs {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(c, d, _))
          if c.dataType == LongType && d.foldable &&
             Option(d.eval()).exists(_.asInstanceOf[Number].longValue() == 1000L) =>
        Some(c)
      case _ => None
    }
  }

  private def micros(lit: Literal): Option[Long] = lit match {
    // Two-sided guard: math.abs(Long.MinValue) is negative, so an abs-based
    // check admits Long.MinValue and the ×1000 below overflows. The ±1000
    // slack also covers the +1/−1 micro adjustments and the ±999 nano slack.
    case Literal(v: Long, TimestampType)
        if v > Long.MinValue / 1000 + 1000 && v < Long.MaxValue / 1000 - 1000 => Some(v)
    case _ => None
  }

  /** Smallest nanos c with trunc(c/1000) >= m. */
  private def lo(m: Long): Long = if (m > 0) m * 1000 else m * 1000 - 999
  /** Largest nanos c with trunc(c/1000) <= m. */
  private def hi(m: Long): Long = if (m < 0) m * 1000 else m * 1000 + 999

  private def nanosLit(n: Long): Literal = Literal(n, LongType)

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThanOrEqual(NanosToMicrosToTs(c), l: Literal) if micros(l).isDefined =>
      GreaterThanOrEqual(c, nanosLit(lo(micros(l).get)))
    case GreaterThan(NanosToMicrosToTs(c), l: Literal) if micros(l).isDefined =>
      GreaterThanOrEqual(c, nanosLit(lo(micros(l).get + 1)))
    case LessThan(NanosToMicrosToTs(c), l: Literal) if micros(l).isDefined =>
      LessThanOrEqual(c, nanosLit(hi(micros(l).get - 1)))
    case LessThanOrEqual(NanosToMicrosToTs(c), l: Literal) if micros(l).isDefined =>
      LessThanOrEqual(c, nanosLit(hi(micros(l).get)))
    case EqualTo(NanosToMicrosToTs(c), l: Literal) if micros(l).isDefined =>
      And(GreaterThanOrEqual(c, nanosLit(lo(micros(l).get))),
        LessThanOrEqual(c, nanosLit(hi(micros(l).get))))
    // mirrored literal-first forms
    case LessThanOrEqual(l: Literal, NanosToMicrosToTs(c)) if micros(l).isDefined =>
      GreaterThanOrEqual(c, nanosLit(lo(micros(l).get)))
    case LessThan(l: Literal, NanosToMicrosToTs(c)) if micros(l).isDefined =>
      GreaterThanOrEqual(c, nanosLit(lo(micros(l).get + 1)))
    case GreaterThan(l: Literal, NanosToMicrosToTs(c)) if micros(l).isDefined =>
      LessThanOrEqual(c, nanosLit(hi(micros(l).get - 1)))
    case GreaterThanOrEqual(l: Literal, NanosToMicrosToTs(c)) if micros(l).isDefined =>
      LessThanOrEqual(c, nanosLit(hi(micros(l).get)))
    case EqualTo(l: Literal, NanosToMicrosToTs(c)) if micros(l).isDefined =>
      And(GreaterThanOrEqual(c, nanosLit(lo(micros(l).get))),
        LessThanOrEqual(c, nanosLit(hi(micros(l).get))))
  }
}
