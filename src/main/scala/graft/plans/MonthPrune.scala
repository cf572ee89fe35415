package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{StringType, TimestampType}

/** Partition-pruning optimizer rule for the store layout: a level table
  * partitions by `p_month` (the UTC `yyyy-MM` of `interval` — the
  * writers' invariant), but an ad-hoc reader filters on the DATA column
  * `interval`, which alone prunes nothing — the scan lists every month
  * of the level. The store's own API derives the month predicate by
  * hand ([[graft.store.HoardStore.readLevelRange]]); this rule does the
  * same rewrite INSIDE Catalyst for any plan that filters a level scan,
  * so `spark.read.parquet(level).where($"interval" >= a && $"interval"
  * < b)` touches 2 partitions instead of 600 without knowing the trick.
  *
  * Soundness: the added `p_month IN (...)` conjunct is IMPLIED by the
  * interval bounds under the layout invariant (month list is computed
  * inclusively on both edges, so over-inclusion is the only possible
  * error — harmless, the original predicate still applies). The rule
  * only fires on relations carrying BOTH the `p_month` STRING partition
  * column and an `interval` TIMESTAMP data column — the store level
  * signature — and never when the filter already constrains `p_month`
  * (idempotence). Registered by `Graft.configure` via
  * `spark.experimental.extraOptimizations`.
  */
object MonthPrune extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, rel: LogicalRelation) =>
      rel.relation match {
        case hfs: HadoopFsRelation
          if hfs.partitionSchema.fieldNames.contains("p_month") =>
          val monthAttr = rel.output.find(a =>
            a.name == "p_month" && a.dataType == StringType)
          val intervalAttr = rel.output.find(a =>
            a.name == "interval" && a.dataType == TimestampType)
          (monthAttr, intervalAttr) match {
            case (Some(m), Some(iv))
              if !cond.references.exists(_.semanticEquals(m)) =>
              boundsUs(cond, iv) match {
                case Some((loUs, hiUs)) if loUs <= hiUs =>
                  val months = monthsCovering(
                    Math.floorDiv(loUs, 1000000L),
                    Math.floorDiv(hiUs, 1000000L) + 1)
                  Filter(And(cond,
                    In(m, months.map(s => Literal(s)))), rel)
                case _ => f
              }
            case _ => f
          }
        case _ => f
      }
  }

  /** Conjunct scan for literal bounds on the interval column; returns
    * (lo, hi) in epoch MICROS, both inclusive-ish (hi rounded up by the
    * caller) — only when BOTH sides are bounded, since an unbounded
    * side would enumerate the whole retention.
    */
  private def boundsUs(cond: Expression,
                       iv: Attribute): Option[(Long, Long)] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case o => Seq(o)
    }
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    conjuncts(cond).foreach {
      case GreaterThanOrEqual(a: Attribute, Literal(v: Long, TimestampType))
        if a.semanticEquals(iv) => lo = Some(lo.fold(v)(math.max(_, v)))
      case GreaterThan(a: Attribute, Literal(v: Long, TimestampType))
        if a.semanticEquals(iv) => lo = Some(lo.fold(v)(math.max(_, v)))
      case LessThan(a: Attribute, Literal(v: Long, TimestampType))
        if a.semanticEquals(iv) => hi = Some(hi.fold(v)(math.min(_, v)))
      case LessThanOrEqual(a: Attribute, Literal(v: Long, TimestampType))
        if a.semanticEquals(iv) => hi = Some(hi.fold(v)(math.min(_, v)))
      case LessThanOrEqual(Literal(v: Long, TimestampType), a: Attribute)
        if a.semanticEquals(iv) => lo = Some(lo.fold(v)(math.max(_, v)))
      case LessThan(Literal(v: Long, TimestampType), a: Attribute)
        if a.semanticEquals(iv) => lo = Some(lo.fold(v)(math.max(_, v)))
      case GreaterThanOrEqual(Literal(v: Long, TimestampType), a: Attribute)
        if a.semanticEquals(iv) => hi = Some(hi.fold(v)(math.min(_, v)))
      case GreaterThan(Literal(v: Long, TimestampType), a: Attribute)
        if a.semanticEquals(iv) => hi = Some(hi.fold(v)(math.min(_, v)))
      case _ => ()
    }
    for { l <- lo; h <- hi } yield (l, h)
  }

  /** UTC `yyyy-MM` keys covering [fromSec, toSec) — the same month math
    * the store's writers use to DEFINE p_month, so the derived list can
    * never under-include.
    */
  private def monthsCovering(fromSec: Long, toSec: Long): Seq[String] = {
    import java.time.{Instant, YearMonth, ZoneOffset}
    val start = YearMonth.from(
      Instant.ofEpochSecond(fromSec).atZone(ZoneOffset.UTC))
    val end = YearMonth.from(
      Instant.ofEpochSecond(math.max(fromSec, toSec - 1))
        .atZone(ZoneOffset.UTC))
    Iterator.iterate(start)(_.plusMonths(1)).takeWhile(!_.isAfter(end))
      .map(ym => f"${ym.getYear}%04d-${ym.getMonthValue}%02d").toSeq
  }
}
