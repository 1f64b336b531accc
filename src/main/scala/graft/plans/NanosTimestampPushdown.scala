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
  * The rewrite is exact integer arithmetic on the floor division
  * (`floor(x/1000) >= m  ⟺  x >= 1000·m`, etc.), applied only when the other
  * side is a non-null timestamp literal whose micros fit a Long after ×1000:
  *
  *   timestamp_micros(c div 1000) >= L  →  c >= micros(L)·1000
  *   timestamp_micros(c div 1000) >  L  →  c >= (micros(L)+1)·1000
  *   timestamp_micros(c div 1000) <  L  →  c <  micros(L)·1000
  *   timestamp_micros(c div 1000) <= L  →  c <  (micros(L)+1)·1000
  *   timestamp_micros(c div 1000) =  L  →  c >= m·1000 AND c < (m+1)·1000
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
    case Literal(v: Long, TimestampType)
        if math.abs(v) < Long.MaxValue / 1000 - 1000 => Some(v)
    case _ => None
  }

  private def nanosLit(n: Long): Literal = Literal(n, LongType)

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThanOrEqual(NanosToMicrosToTs(c), l: Literal) if micros(l).isDefined =>
      GreaterThanOrEqual(c, nanosLit(micros(l).get * 1000))
    case GreaterThan(NanosToMicrosToTs(c), l: Literal) if micros(l).isDefined =>
      GreaterThanOrEqual(c, nanosLit((micros(l).get + 1) * 1000))
    case LessThan(NanosToMicrosToTs(c), l: Literal) if micros(l).isDefined =>
      LessThan(c, nanosLit(micros(l).get * 1000))
    case LessThanOrEqual(NanosToMicrosToTs(c), l: Literal) if micros(l).isDefined =>
      LessThan(c, nanosLit((micros(l).get + 1) * 1000))
    case EqualTo(NanosToMicrosToTs(c), l: Literal) if micros(l).isDefined =>
      And(GreaterThanOrEqual(c, nanosLit(micros(l).get * 1000)),
        LessThan(c, nanosLit((micros(l).get + 1) * 1000)))
    // mirrored literal-first forms
    case LessThanOrEqual(l: Literal, NanosToMicrosToTs(c)) if micros(l).isDefined =>
      GreaterThanOrEqual(c, nanosLit(micros(l).get * 1000))
    case LessThan(l: Literal, NanosToMicrosToTs(c)) if micros(l).isDefined =>
      GreaterThanOrEqual(c, nanosLit((micros(l).get + 1) * 1000))
    case GreaterThan(l: Literal, NanosToMicrosToTs(c)) if micros(l).isDefined =>
      LessThan(c, nanosLit(micros(l).get * 1000))
    case GreaterThanOrEqual(l: Literal, NanosToMicrosToTs(c)) if micros(l).isDefined =>
      LessThan(c, nanosLit((micros(l).get + 1) * 1000))
    case EqualTo(l: Literal, NanosToMicrosToTs(c)) if micros(l).isDefined =>
      And(GreaterThanOrEqual(c, nanosLit(micros(l).get * 1000)),
        LessThan(c, nanosLit((micros(l).get + 1) * 1000)))
  }
}
