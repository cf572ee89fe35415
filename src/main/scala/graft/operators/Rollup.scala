package graft.operators

import graft.core.{ArchivePolicy, Time}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The xFilesFactor-gated cascading downsample — the reference's
  * `propagate` (`src/hoard.coffee:71-178`) re-expressed as a tumbling
  * aggregate.
  *
  * Contract items preserved (SURVEY §2.2.7/8):
  *  - expectedPoints = coarserStep / finerStep; an interval receives a
  *    value only when knownPoints / expectedPoints >= xff (`:142-156`,
  *    `>=` at the boundary);
  *  - aggregate = arithmetic mean of the *known* finer points (`:156`);
  *  - cascade is level-by-level finest→coarsest, each level aggregating
  *    from the level directly above (mean-of-means, `:364-379`), never
  *    from raw points.
  *
  * Scale: each hop is one `groupBy` with partial aggregation; the group
  * key (series, coarser interval) is a strict coarsening of the previous
  * hop's key, so AQE can often satisfy the next hop with a local shuffle.
  */
object Rollup {

  /** One downsample hop. Input columns: (seriesCol, intervalCol: timestamp
    * aligned at finerStep, valueCol: double). Output: same shape at
    * coarserStep.
    *
    * `cf` picks the consolidation function (avg/min/max/sum/last) — the
    * reference hardcodes the mean and flags the gap itself
    * (`src/hoard.coffee:156`); "last" = value of the latest finer slot.
    */
  def downsample(finer: DataFrame, seriesCol: String, intervalCol: String,
                 valueCol: String, finerStep: Long, coarserStep: Long,
                 xff: Double, cf: String = "avg"): DataFrame = {
    require(coarserStep % finerStep == 0, s"$coarserStep not a multiple of $finerStep")
    val expected = (coarserStep / finerStep).toDouble
    val agged = cf match {
      case "avg"  => avg(col(valueCol))
      // decimal-exact mean: partial-aggregation order cannot perturb the
      // result; the output is additionally quantized to 6 decimals so a
      // further cascade hop over it stays order-independent too
      case "avg_exact" =>
        (sum(col(valueCol).cast("decimal(18,6)")).cast("double") /
          count(col(valueCol))).cast("decimal(18,6)").cast("double")
      case "min"  => min(col(valueCol))
      case "max"  => max(col(valueCol))
      case "sum"  => sum(col(valueCol))
      // decimal-exact sum (same determinism argument as avg_exact)
      case "sum_exact" =>
        sum(col(valueCol).cast("decimal(18,6)")).cast("double")
      case "last" => max_by(col(valueCol), col("__fi"))
      case other  => throw new IllegalArgumentException(s"unknown cf: $other")
    }
    finer
      .withColumn("__fi", col(intervalCol)) // pre-group copy for "last"
      .groupBy(col(seriesCol),
        Time.align(col(intervalCol), coarserStep).as(intervalCol))
      .agg(agged.as(valueCol), count(col(valueCol)).as("__known"))
      // xff gate: >= keeps the boundary case, matching `knownPercent >= xff`
      .where(col("__known").cast("double") / lit(expected) >= lit(xff))
      .drop("__known")
  }

  /** Full cascade: returns one DataFrame per archive level, keyed by step.
    * `finest` must already be aligned+deduped at the finest step.
    */
  def cascade(finest: DataFrame, seriesCol: String, intervalCol: String,
              valueCol: String, policy: ArchivePolicy): Map[Long, DataFrame] = {
    val steps = policy.sorted.map(_.step)
    steps.tail.foldLeft(Map(steps.head -> finest)) { (acc, coarser) =>
      val finerStep = steps(steps.indexOf(coarser) - 1)
      acc + (coarser -> downsample(acc(finerStep), seriesCol, intervalCol,
        valueCol, finerStep, coarser, policy.xff, policy.cf))
    }
  }
}
