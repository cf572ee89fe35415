package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation: hot grouping keys (one series getting
  * 100× the points) serialize a single reducer in a plain groupBy.
  * Salting splits every key across `buckets` partial groups, then a
  * second (tiny) aggregation combines the partials. sum/count/min/max
  * compose exactly; mean = combined sum / combined count.
  *
  * AQE's skew handling covers joins; aggregation skew still needs this
  * pattern. Deterministic: the salt only routes rows, every composition
  * below is order-insensitive (integer counts, min/max, and sums that
  * callers should round per the oracle rules).
  */
object Skew {

  def saltedStats(df: DataFrame, keyCols: Seq[String], valueCol: String,
                  buckets: Int): DataFrame = {
    require(buckets > 0)
    val keys = keyCols.map(col)
    val partial = df
      .withColumn("__salt", pmod(xxhash64(input_file_name(),
        monotonically_increasing_id()), lit(buckets.toLong)))
      .groupBy(keys :+ col("__salt"): _*)
      .agg(sum(col(valueCol)).as("__sum"), count(col(valueCol)).as("__n"),
        min(col(valueCol)).as("__min"), max(col(valueCol)).as("__max"))
    partial
      .groupBy(keys: _*)
      .agg(sum(col("__sum")).as("sum_value"), sum(col("__n")).as("n"),
        min(col("__min")).as("min_value"), max(col("__max")).as("max_value"))
      .withColumn("mean_value", col("sum_value") / col("n"))
  }
}
