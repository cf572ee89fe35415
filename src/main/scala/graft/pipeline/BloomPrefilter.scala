package graft.pipeline

import graft.functions.BloomFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit Bloom semi-join reduction (Bloom 1970; the pattern behind
  * Spark's runtime row-level filtering): build a Bloom filter over the
  * SMALL side's join keys, ship it as a literal into the BIG side's
  * scan, and drop rows whose key cannot possibly match before they
  * shuffle. The filter is bits-per-key (~10 bits at 1% fp), an order
  * of magnitude smaller than broadcasting the key set itself — the
  * niche where the probe set is too big for a broadcast hash join but
  * its Bloom image still fits in every executor.
  *
  * Exactness contract: might_contain has NO false negatives, so a
  * downstream exact join sees every true match; false positives ride
  * through the prefilter and are eliminated by that join. Any operator
  * composed as (bloom prefilter → exact join) is therefore
  * bit-identical to the plain exact join — property-tested, and the
  * p26 oracle runs the join without any bloom at all.
  */
object BloomPrefilter {

  /** Serialized Bloom filter over `vidCol` (LongType) of `probe` —
    * ONE driver-held compact value (None when the probe side is
    * empty). `bits` sizes the filter: ~10·expected items ≈ 1% fp.
    */
  def buildBloom(probe: DataFrame, vidCol: String, estItems: Long,
                 bits: Long): Option[Array[Byte]] = {
    BloomFunctions.register(probe.sparkSession)
    Option(probe
      .select(expr(s"graft_bloom_agg($vidCol, ${estItems}L, ${bits}L)").as("bf"))
      .head.getAs[Array[Byte]]("bf"))
  }

  /** Rows of `corpus` whose `vidCol` might be in the bloom — the
    * shuffle-reducing scan filter. An empty probe side keeps nothing.
    */
  def prefilter(corpus: DataFrame, vidCol: String,
                bloom: Option[Array[Byte]]): DataFrame = {
    BloomFunctions.register(corpus.sparkSession)
    bloom match {
      case Some(bytes) =>
        corpus.where(call_function("graft_might_contain",
          lit(bytes), col(vidCol)))
      case None => corpus.where(lit(false))
    }
  }

  /** Bloom-prefiltered cross-corpus span-membership audit: for each
    * probe-side doc, how many of its distinct spans (`vidCol`) appear
    * anywhere in the corpus side. The corpus scan is prefiltered by
    * the probe-side bloom, so only candidate vids shuffle into the
    * exact membership join. Output: (idCol, n_spans, n_known,
    * known_ratio) — provably identical to the un-prefiltered join.
    */
  def spanMembership(probe: DataFrame, corpus: DataFrame, idCol: String,
                     vidCol: String, estItems: Long = 1 << 20,
                     bits: Long = 10L << 20): DataFrame = {
    val probeVids = probe.select(col(vidCol)).distinct()
    val bloom = buildBloom(probeVids, vidCol, estItems, bits)
    val candidates = prefilter(corpus.select(col(vidCol)), vidCol, bloom)
      .distinct()
    val known = probe.join(candidates, Seq(vidCol), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_known"))
    probe.groupBy(col(idCol)).agg(count(lit(1)).as("n_spans"))
      .join(known, Seq(idCol), "left")
      .select(col(idCol), col("n_spans"),
        coalesce(col("n_known"), lit(0L)).as("n_known"))
      .withColumn("known_ratio",
        round(col("n_known").cast("double") / col("n_spans") * lit(1e6)) / lit(1e6))
  }
}
