package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity: exact cosine (fold over zipped arrays — stays
  * inside whole-stage codegen, no UDF), brute-force top-k as the
  * correctness baseline, and signed-random-projection LSH buckets as
  * the scale path (candidates drop from N² to N²/buckets).
  */
object Embeddings {

  /** Double-precision copy of a float array column. */
  def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential-fold dot product of two double array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query row, the k most similar
    * non-self candidates. Similarity is rounded to 6 decimals BEFORE
    * ranking so float-accumulation ulps can never flip an order; ties
    * break on neighbor id.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      asDouble(col("embedding")).as("qv"))
    val c = candidates.select(col("vec_id").as("neighbor_id"),
      asDouble(col("embedding")).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qv"), col("cv")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
  }

  /** Signed-random-projection bucket id per vector: `planes` fixed
    * deterministic hyperplanes (LCG-derived weights so the SQL oracle
    * reproduces them), bucket = bit-pack of dot-product signs.
    */
  def lshBuckets(vectors: DataFrame, planes: Int): DataFrame = {
    val exploded = vectors.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("d0", "x")))
      .select(col("vec_id"), (col("d0") + 1).as("d"), col("x").cast("double").as("x"))
      .crossJoin(spark_range_df(planes))
    val w = (pmod(lit(1103515245L) * (col("j") * 64 + col("d")) + 12345L,
      lit(2048L)).cast("double") / 2048.0) - 0.5
    exploded
      .groupBy(col("vec_id"), col("j"))
      .agg(round(sum(w * col("x")), 6).as("dotp"))
      .groupBy(col("vec_id"))
      .agg(sum(when(col("dotp") > 0,
        expr("shiftleft(cast(1 as bigint), cast(j as int))"))
        .otherwise(0L)).as("bucket"))
  }

  private def spark_range_df(n: Int) = {
    import org.apache.spark.sql.SparkSession
    SparkSession.active.range(n).select(col("id").as("j"))
  }
}
