package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Registry shims for Spark's own Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind runtime row-level semi-join filtering), which ship in
  * spark-catalyst but are NOT exposed in the public function registry.
  * Registering them (`graft_bloom_agg`, `graft_might_contain`) lets
  * the pipeline build an explicit Bloom semi-join reduction: hash the
  * probe side's keys into a compact bitmap (bits, not 64-bit entries —
  * ~13× smaller than broadcasting the key set), broadcast it as a
  * LITERAL into the big side's scan, and drop non-candidate rows
  * before they ever shuffle. Exactness is restored by the exact join
  * that follows (false positives survive the prefilter and die in the
  * join; false negatives cannot occur).
  */
object BloomFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => BloomFilterAggregate(exprs.head, exprs(1), exprs(2), 0, 0),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => BloomFilterMightContain(exprs.head, exprs(1)),
      "scala_udf")
  }
}
