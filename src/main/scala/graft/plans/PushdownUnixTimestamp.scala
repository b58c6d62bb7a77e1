package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, IntegerType, TimestampType}

/** Optimizer rule: `unix_timestamp(ts) ⋈ <integer literal>` →
  * `ts ⋈ <timestamp literal>`.
  *
  * The reference's `UT(` macro (database.py:227-234) steers users into
  * `UNIX_TIMESTAMP(ts) >= 1704412800`-style predicates — which wrap the
  * column in a function call, so the parquet reader cannot push the filter
  * down and every row group is scanned. This rule rewrites the comparison
  * onto the bare column, restoring PushedFilters / row-group pruning.
  *
  * unix_timestamp() truncates sub-second parts TOWARD ZERO (probed on
  * Spark 4.1: '1969-12-31 23:59:59.5' → 0, not floor's −1), so for an
  * integer literal v >= 1 the exact equivalences on a non-null timestamp
  * are:
  *   trunc(ts) >= v  ⟺  ts >= v        trunc(ts) >  v  ⟺  ts >= v+1
  *   trunc(ts) <= v  ⟺  ts <  v+1      trunc(ts) <  v  ⟺  ts <  v
  *   trunc(ts) =  v  ⟺  v <= ts < v+1
  * For v <= 0 the toward-zero truncation breaks them — trunc(ts) >= 0
  * admits ts ∈ (−1 s, 0) which `ts >= 0` would drop — so literals below 1
  * are left alone (no pushdown, still correct). The literal is also
  * bounded so the seconds→micros scaling cannot overflow a Long.
  */
object PushdownUnixTimestamp extends Rule[LogicalPlan] {

  private def tsLit(seconds: Long): Literal =
    Literal(seconds * 1000000L, TimestampType) // micros

  private object SecondsLit {
    // v+1 must also survive the micros scaling: bound by MaxValue/1e6 − 1
    private val MaxSeconds = Long.MaxValue / 1000000L - 1
    private def ok(v: Long): Option[Long] = if (v >= 1 && v <= MaxSeconds) Some(v) else None
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => ok(v)
      case Literal(v: Int, IntegerType) => ok(v.toLong)
      case Cast(Literal(v: Long, LongType), _, _, _) => ok(v)
      case Cast(Literal(v: Int, IntegerType), _, _, _) => ok(v.toLong)
      case _ => None
    }
  }

  /** unix_timestamp over a plain timestamp column (no parsing involved). */
  private object UnixTsOfTimestamp {
    def unapply(e: Expression): Option[Expression] = e match {
      case UnixTimestamp(child, _, _, _) if child.dataType == TimestampType => Some(child)
      case Cast(UnixTimestamp(child, _, _, _), LongType, _, _)
          if child.dataType == TimestampType => Some(child)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThanOrEqual(UnixTsOfTimestamp(ts), SecondsLit(v)) =>
      GreaterThanOrEqual(ts, tsLit(v))
    case GreaterThan(UnixTsOfTimestamp(ts), SecondsLit(v)) =>
      GreaterThanOrEqual(ts, tsLit(v + 1))
    case LessThanOrEqual(UnixTsOfTimestamp(ts), SecondsLit(v)) =>
      LessThan(ts, tsLit(v + 1))
    case LessThan(UnixTsOfTimestamp(ts), SecondsLit(v)) =>
      LessThan(ts, tsLit(v))
    case EqualTo(UnixTsOfTimestamp(ts), SecondsLit(v)) =>
      And(GreaterThanOrEqual(ts, tsLit(v)), LessThan(ts, tsLit(v + 1)))
    // mirrored literal-first orientations
    case LessThanOrEqual(SecondsLit(v), UnixTsOfTimestamp(ts)) =>
      GreaterThanOrEqual(ts, tsLit(v))
    case LessThan(SecondsLit(v), UnixTsOfTimestamp(ts)) =>
      GreaterThanOrEqual(ts, tsLit(v + 1))
    case GreaterThanOrEqual(SecondsLit(v), UnixTsOfTimestamp(ts)) =>
      LessThan(ts, tsLit(v + 1))
    case GreaterThan(SecondsLit(v), UnixTsOfTimestamp(ts)) =>
      LessThan(ts, tsLit(v))
    case EqualTo(SecondsLit(v), UnixTsOfTimestamp(ts)) =>
      And(GreaterThanOrEqual(ts, tsLit(v)), LessThan(ts, tsLit(v + 1)))
  }
}
