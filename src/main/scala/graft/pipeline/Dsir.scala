package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling"): represent target and raw corpora as hashed-n-gram
  * bag-of-words distributions over B buckets, weight every raw
  * document by its log importance ratio Σ_features ln(p_target(b) /
  * p_raw(b)), and keep the highest-weighted documents. The paper
  * samples with Gumbel noise; this implementation keeps the
  * deterministic log-ratio scoring (the part that carries all the
  * signal) and exposes the weight so callers can select top-k or
  * threshold — here selection is the likelihood-ratio rule w > 0
  * ("looks more target-like than raw-like"), which is exact,
  * rank-free, and engine-independent.
  *
  * Scale shape: the two feature distributions compress to ONE O(B)
  * table (B = 4096 rows regardless of corpus size) that BROADCASTS to
  * the scoring stream — scoring a 100 TB corpus is a single narrow
  * scan + broadcast join + one map-side-combinable groupBy. Weights
  * are integer micro-log-ratios (the [[LanguageModel]] rounding
  * contract) so sums are order-independent and cross-engine exact.
  */
object Dsir {

  /** Hashed uni+bigram feature buckets per doc: (idCol, b) with
    * b = hashId(feature) mod `buckets`, one row per occurrence.
    * Narrow (split → explode); no shuffle.
    */
  def featureBuckets(docs: DataFrame, idCol: String, textCol: String,
                     buckets: Int): DataFrame = {
    val uni = TextOps.tokens(docs, idCol, textCol)
      .select(col(idCol), col("token").as("feat"))
    val bi = TextOps.shinglesOfText(docs, idCol, textCol, 2)
      .select(col(idCol), col("shingle").as("feat"))
    uni.unionByName(bi)
      .select(col(idCol),
        pmod(TextOps.hashId(col("feat")), lit(buckets.toLong)).as("b"))
  }

  /** Per-bucket integer log importance weights: llw_micro(b) =
    * round(ln((ct+1)(Tr+B) / ((cr+1)(Tt+B))) · 1e6) — Laplace-smoothed
    * target/raw ratio over the full B-bucket spine (empty buckets
    * included, so the table is always exactly B rows).
    */
  def bucketWeights(featTarget: DataFrame, featRaw: DataFrame,
                    buckets: Int): DataFrame = {
    val spine = SparkSession.active.range(buckets).select(col("id").as("b"))
    val ct = featTarget.groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val cr = featRaw.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val j = spine.join(ct, Seq("b"), "left").join(cr, Seq("b"), "left")
      .select(col("b"), coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val tot = j.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    j.crossJoin(broadcast(tot))
      .select(col("b"), col("ct"), col("cr"),
        round(log(
          ((col("ct") + 1).cast("double") * (col("tr") + buckets).cast("double")) /
          ((col("cr") + 1).cast("double") * (col("tt") + buckets).cast("double"))
        ) * 1e6, 0).cast("long").as("llw_micro"))
  }

  /** Per-doc importance weight: broadcast-join the O(B) weight table
    * to the feature stream, integer-sum per doc. Output: (idCol,
    * n_feats, w_micro, avg_w).
    */
  def score(featB: DataFrame, idCol: String, weights: DataFrame): DataFrame =
    featB.join(broadcast(weights.select(col("b"), col("llw_micro"))), "b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("llw_micro")).as("w_micro"))
      .withColumn("avg_w",
        round(col("w_micro").cast("double") / 1e6 / col("n_feats"), 6))
}
