package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dense gap-filled window — the reference's fetch returns one slot per
  * interval in [fromInterval, toInterval), `null` where no point matches
  * (`src/hoard.coffee:493-509`; SURVEY §2.2.3/9).
  *
  * Spark shape: a `sequence()` spine per series LEFT JOINed with the
  * data. The spine is tiny ((to-from)/step rows per series) and generated
  * distributed via explode — no driver-side loop; the join key
  * (series, interval) matches the data's natural clustering so AQE
  * broadcast-joins the spine when small.
  */
object GapFill {

  /** Build the dense spine for every series in `seriesUniverse` and left
    * join `values` onto it.
    *
    * @param seriesUniverse one row per series (column `seriesCol`)
    * @param fromInterval   inclusive lower bound, epoch seconds, aligned
    * @param toInterval     exclusive upper bound, epoch seconds, aligned
    */
  def densify(values: DataFrame, seriesUniverse: DataFrame, seriesCol: String,
              intervalCol: String, valueCols: Seq[String],
              fromInterval: Long, toInterval: Long, step: Long): DataFrame = {
    require(fromInterval < toInterval, "Invalid time interval")
    val spine = seriesUniverse.select(
      col(seriesCol),
      explode(sequence(
        timestamp_seconds(lit(fromInterval)),
        timestamp_seconds(lit(toInterval - step)),
        expr(s"INTERVAL $step SECOND"))).as(intervalCol))
    spine.join(values, Seq(seriesCol, intervalCol), "left")
      .select((col(seriesCol) +: col(intervalCol) +: valueCols.map(col)): _*)
  }
}
