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

  /** Hashed uni+bigram feature buckets per doc: (idCols…, b) with
    * b = hashId(feature) mod `buckets`, one row per occurrence; every
    * column in `idCols` is carried through so membership tags (e.g.
    * target/raw) ride the stream instead of requiring a corpus-sized
    * join back. Narrow (split → transform → explode); no shuffle.
    */
  def featureBuckets(docs: DataFrame, idCols: Seq[String], textCol: String,
                     buckets: Int): DataFrame = {
    val ids = idCols.map(col)
    val arr = col("__arr")
    val spans = when(size(arr) >= 2,
      transform(sequence(lit(1), size(arr) - 1),
        i => concat_ws(" ", slice(arr, i, lit(2)))))
      .otherwise(array().cast("array<string>"))
    val base = docs.select(ids :+ split(col(textCol), " ").as("__arr"): _*)
    val uni = base.select(ids :+ explode(arr).as("feat"): _*)
    val bi = base.select(ids :+ explode(spans).as("feat"): _*)
    uni.unionByName(bi)
      .select(ids :+
        pmod(TextOps.hashId(col("feat")), lit(buckets.toLong)).as("b"): _*)
  }

  def featureBuckets(docs: DataFrame, idCol: String, textCol: String,
                     buckets: Int): DataFrame =
    featureBuckets(docs, Seq(idCol), textCol, buckets)

  /** Per-bucket integer log importance weights: llw_micro(b) =
    * round(ln((ct+1)(Tr+B) / ((cr+1)(Tt+B))) · 1e6) — Laplace-smoothed
    * target/raw ratio over the full B-bucket spine (empty buckets
    * included, so the table is always exactly B rows).
    */
  def bucketWeights(featTarget: DataFrame, featRaw: DataFrame,
                    buckets: Int): DataFrame =
    weightsFromCounts(
      featTarget.groupBy(col("b")).agg(count(lit(1)).as("ct"))
        .join(featRaw.groupBy(col("b")).agg(count(lit(1)).as("cr")),
          Seq("b"), "full"),
      buckets)

  /** Single-pass weight build over a TAGGED feature stream (one scan
    * of the corpus instead of one per side): `isTarget` splits the
    * per-bucket counts inside one map-side-combinable aggregation.
    */
  def bucketWeightsTagged(featB: DataFrame, isTarget: Column,
                          buckets: Int): DataFrame =
    weightsFromCounts(
      featB.groupBy(col("b")).agg(
        sum(when(isTarget, 1L).otherwise(0L)).as("ct"),
        sum(when(isTarget, 0L).otherwise(1L)).as("cr")),
      buckets)

  private def weightsFromCounts(counts: DataFrame, buckets: Int): DataFrame = {
    val spine = SparkSession.active.range(buckets).select(col("id").as("b"))
    val j = spine.join(counts, Seq("b"), "left")
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
    * to the feature stream, integer-sum per doc (any carried tag
    * columns stay in the group key). Output: (idCols…, n_feats,
    * w_micro, avg_w).
    */
  def score(featB: DataFrame, idCols: Seq[String],
            weights: DataFrame): DataFrame =
    featB.join(broadcast(weights.select(col("b"), col("llw_micro"))), "b")
      .groupBy(idCols.map(col): _*)
      .agg(count(lit(1)).as("n_feats"), sum(col("llw_micro")).as("w_micro"))
      .withColumn("avg_w",
        round(col("w_micro").cast("double") / 1e6 / col("n_feats") * 1e6) / 1e6)

  def score(featB: DataFrame, idCol: String, weights: DataFrame): DataFrame =
    score(featB, Seq(idCol), weights)
}
