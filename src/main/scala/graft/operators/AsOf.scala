package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** As-of lookups: latest value at or before a point in time. The
  * reference exposes this only implicitly (a fetch of the slot covering
  * `t`), but it is the canonical time-series read (SURVEY §2.4 H6).
  */
object AsOf {

  /** Per series, the value carried by the row with the greatest
    * (ts, seq) <= t. One aggregate, partial-agg friendly — no window
    * sort, no shuffle of losing rows.
    */
  def latestAtOrBefore(df: DataFrame, seriesCol: String, tsCol: String,
                       seqCol: String, valueCol: String, t: Column): DataFrame =
    df.where(col(tsCol) <= t)
      .groupBy(col(seriesCol))
      .agg(
        max_by(col(valueCol), struct(col(tsCol), col(seqCol))).as(valueCol),
        max(col(tsCol)).as(tsCol))

  /** Distributed as-of join: for every left row, attach the latest right
    * row (per key) with rightTs <= leftTs. Implemented with the
    * union+window pattern (single sort per key, no N×M range explosion):
    * tag both sides, union, and carry the last right value forward with
    * `last(ignoreNulls)` over (key ORDER BY ts, side, seq).
    *
    * `rightSeq` makes ties between right rows at the same timestamp
    * deterministic (highest seq wins) — without it, tied rows would
    * resolve by shuffle order.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, rightVal: String,
               outCol: String, rightSeq: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = left.withColumn("__side", lit(1))
      .withColumn("__ts", col(leftTs))
      .withColumn("__seq", lit(0L))
      .withColumn("__rv", lit(null).cast(right.schema(rightVal).dataType))
    val r = right.select(Seq(col(key), col(rightTs).as("__ts"),
        col(rightVal).as("__rv"),
        rightSeq.map(c => col(c).cast("long")).getOrElse(lit(0L)).as("__seq"))
        : _*)
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows (side 0) sort before left rows at equal ts => "at or
    // before"; among tied right rows the highest seq is carried last
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), col("__seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(outCol, last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .drop("__side", "__ts", "__rv", "__seq")
  }
}
