package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact top-k cosine pairs over SPARSE integer-weighted vectors —
  * term-frequency bag-of-words similarity, the classic AllPairs/L2AP
  * setting (Bayardo et al. WWW'07, Anastasiu & Karypis L2AP, public
  * literature) where dimension-posting-list prefix filtering genuinely
  * prunes: vocabulary is huge, each document touches a tiny fraction
  * of it, and rare terms make short posting lists.
  *
  * Plan (the weighted sibling of [[Jaccard.exactTopK]]):
  *  1. τ bound: MinHash-LSH candidates over the UNWEIGHTED vid sets
  *     are exactly cosine-verified; the kth best verified similarity
  *     lower-bounds the kth best overall.
  *  2. L2 prefix filter at τ: order each document's terms by ascending
  *     global document frequency (rarest first, total order (df, vid));
  *     with s_r = the L2 norm of the doc's suffix from rank r on, any
  *     pair with cos ≥ τ must share a term where BOTH sides' relative
  *     suffix norm s_r/‖x‖ is ≥ τ (Cauchy–Schwarz over the first
  *     shared term in the global order). Only those prefix rows join.
  *  3. Exact verification of surviving pairs, cost bounded by the
  *     pairs, not the corpus.
  *
  * All similarity arithmetic is integer until the final division:
  * i = Σ tf_a·tf_b and the squared norms are exact longs, so
  * sim = i / √(n2a·n2b) is bit-identical across engines (products
  * stay far inside the 2^53 double-exact range for real documents).
  *
  * With fewer than k verified candidates τ falls to 0 and the plan
  * switches to the classic single-aggregation inverted-index join —
  * same degenerate-τ reasoning as [[Jaccard.exactTopK]].
  */
object SparseCosine {

  /** Top-k (id_a, id_b, cosine) over rows (idCol, vid, tf), cosine
    * rounded to 6 decimals, ordered (cosine DESC, id_a, id_b).
    */
  def exactTopK(tf: DataFrame, idCol: String, k: Int): DataFrame = {
    val t = tf.select(col(idCol), col("vid"), col("tf").cast("long").as("tf"))
      .localCheckpoint(true)
    val n2 = t.groupBy(idCol).agg(sum(col("tf") * col("tf")).as("n2"))

    // phase 1: verified LSH candidates over the vid SETS -> τ
    val cands = MinHashLsh.candidates(
      MinHashLsh.bands(
        MinHashLsh.signatures(t.select(col(idCol), col("vid")), idCol, 16),
        idCol, r = 4), idCol)
    val candC = verify(cands, t, n2, idCol).select(round(col("c"), 6).as("c"))
      .orderBy(col("c").desc).limit(k).collect()
    val tau = math.max(0.0,
      (if (candC.length < k) 0.0 else candC.last.getDouble(0)) - 1e-6)

    val scored =
      if (tau <= 0.0) {
        // classic inverted-index aggregation (no pair re-verify)
        t.select(col(idCol).as("id_a"), col("vid"), col("tf").as("tfa"))
          .join(t.select(col(idCol).as("id_b"), col("vid"),
            col("tf").as("tfb")), "vid")
          .where(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(sum(col("tfa") * col("tfb")).as("i"))
          .join(n2.select(col(idCol).as("id_a"), col("n2").as("na")), "id_a")
          .join(n2.select(col(idCol).as("id_b"), col("n2").as("nb")), "id_b")
          .withColumn("c", col("i").cast("double") /
            sqrt(col("na").cast("double") * col("nb")))
      } else {
        // phase 2: L2 suffix-norm prefix filter at τ. suffix² at rank r
        // is n2 − Σ tf² of earlier ranks; index the row iff
        // suffix²/n2 ≥ τ² (with a 1e-9 float back-off so a borderline
        // row is INDEXED, never pruned).
        val dfreq = t.groupBy("vid").agg(count(lit(1)).as("df"))
        val w = Window.partitionBy(col(idCol)).orderBy(col("df"), col("vid"))
        val pre = t.join(dfreq, "vid")
          .join(n2, idCol)
          .withColumn("cum", coalesce(sum(col("tf") * col("tf"))
            .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .where((col("n2") - col("cum")).cast("double") >=
            lit(tau * tau - 1e-9) * col("n2"))
        val pairs = pre.select(col(idCol).as("id_a"), col("vid"))
          .join(pre.select(col(idCol).as("id_b"), col("vid")), "vid")
          .where(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct()
        // phase 3: exact verification on surviving pairs only
        verify(pairs, t, n2, idCol)
      }

    scored
      .select(col("id_a"), col("id_b"), round(col("c"), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
      .limit(k)
  }

  /** Exact (i, na, nb, c) for an explicit pair frame — pair-bounded. */
  private def verify(pairs: DataFrame, t: DataFrame, n2: DataFrame,
                     idCol: String): DataFrame =
    pairs
      .join(t.select(col(idCol).as("id_a"), col("vid"), col("tf").as("tfa")),
        "id_a")
      .join(t.select(col(idCol).as("id_b"), col("vid"), col("tf").as("tfb")),
        Seq("id_b", "vid"))
      .groupBy("id_a", "id_b").agg(sum(col("tfa") * col("tfb")).as("i"))
      .join(n2.select(col(idCol).as("id_a"), col("n2").as("na")), "id_a")
      .join(n2.select(col(idCol).as("id_b"), col("n2").as("nb")), "id_b")
      .withColumn("c", col("i").cast("double") /
        sqrt(col("na").cast("double") * col("nb")))
}
