package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact top-k Jaccard pairs WITHOUT the all-pairs inverted-index join.
  *
  * The naive exact plan (self-join on shingle id, count intersections)
  * shuffles one row per co-occurrence — ~50M rows at sf0.1 and
  * quadratic-ish beyond; it was the single slowest declared query. This
  * operator computes the IDENTICAL result with a threshold algorithm:
  *
  *  1. τ bound: MinHash-LSH candidates are exactly verified; the kth
  *     best candidate similarity is a LOWER bound τ on the kth best
  *     overall (a subset's kth best can only be lower). LSH missing
  *     pairs only lowers τ — never correctness.
  *  2. ≥k-of-m counting probe at τ (the ppjoin/AllPairs prefix bound
  *     of Xiao et al. / Bayardo et al., strengthened by counting —
  *     see [[thresholdPairs]]): order each set's shingles by
  *     ascending global document frequency (rarest first; window
  *     partitioned per document — no global sort); any pair with
  *     J >= τ must share k_eff = min(3, ⌈τ·n⌉) of one side's first
  *     min(n, n − ⌈τ·n⌉ + 3) shingles. The equi-join probes only
  *     those windows — the rare end of the posting lists — plus a
  *     size-ratio filter (min/max >= τ) and a map-combinable count
  *     threshold before any verification.
  *  3. Exact verification of the surviving pairs (a pair-bounded join,
  *     not a corpus join), then top-k by (rounded J desc, ids).
  *
  * τ is relaxed by 1e-6 before filtering so ROUND(j, 6) ties at the
  * cutoff cannot exclude a pair the naive plan would have ranked in.
  * With fewer than k verified candidates τ falls to 0 and the plan
  * switches to the classic single-aggregation inverted-index join
  * (counting intersections directly in the self-join's groupBy) — a
  * degenerate prefix filter would instead enumerate every
  * co-occurring pair AND re-verify each one, strictly worse than
  * naive. Only reachable on inputs with almost no similar pairs.
  */
object Jaccard {

  /** Top-k (id_a, id_b, jaccard) over distinct set rows (idCol, vid),
    * jaccard rounded to 6 decimals, ordered (jaccard DESC, id_a, id_b).
    */
  def exactTopK(sets: DataFrame, idCol: String, k: Int): DataFrame = {
    val bg = sets.select(col(idCol), col("vid")).localCheckpoint(true)
    val sizes = bg.groupBy(idCol).agg(count(lit(1)).as("n"))

    // phase 1: verified LSH candidates -> τ (driver pulls ONE scalar)
    val cands = MinHashLsh.candidates(
      MinHashLsh.bands(MinHashLsh.signatures(bg, idCol, 16), idCol, r = 4), idCol)
    val candJ = verify(cands, bg, sizes, idCol).select(col("j"))
      .orderBy(col("j").desc).limit(k).collect()
    val tau = math.max(0.0,
      (if (candJ.length < k) 0.0 else candJ.last.getDouble(0)) - 1e-6)

    val scored =
      if (tau <= 0.0) {
        // no usable bound: classic inverted-index aggregation (one
        // groupBy over the co-occurrence join; no pair re-verify)
        bg.select(col(idCol).as("id_a"), col("vid"))
          .join(bg.select(col(idCol).as("id_b"), col("vid")), "vid")
          .where(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("i"))
          .join(sizes.select(col(idCol).as("id_a"), col("n").as("na")), "id_a")
          .join(sizes.select(col(idCol).as("id_b"), col("n").as("nb")), "id_b")
          .withColumn("j",
            col("i").cast("double") / (col("na") + col("nb") - col("i")))
      } else {
        // phases 2+3: prefix-filter join at τ + exact verification
        thresholdPairs(bg, idCol, tau)
      }

    scored
      .select(col("id_a"), col("id_b"),
        (round(col("j") * lit(1e6)) / lit(1e6)).as("jaccard"))
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(k)
  }

  /** Exact (id_a, id_b, i, na, nb, j) for EVERY pair with J ≥ τ —
    * provably complete, via the ≥k-of-m COUNTING strengthening of the
    * ppjoin/AllPairs prefix theorem (the symmetric twin of
    * [[containmentPairs]], which proved the shape at 100× scale):
    *
    *  - J ≥ τ forces i = |A∩B| ≥ τ/(1+τ)·(n_a+n_b) ≥ τ·n_a (since
    *    n_b ≥ i), i.e. EVERY J-qualifying pair also satisfies the
    *    ordered-containment bound C(a→b) ≥ τ in BOTH directions. So
    *    the containment window guarantee holds verbatim with the
    *    lower-id side probing: with ℓ = n_a − ⌈τ·n_a⌉ + 1, B misses
    *    at most ℓ − 1 of A's tokens, hence among A's
    *    m = min(n_a, ℓ + minShared − 1) RAREST tokens (ascending
    *    global (df, vid) order) B must share
    *    k_eff = min(minShared, ⌈τ·n_a⌉) — a per-pair COUNT threshold
    *    applied by a map-combinable aggregation before any exact
    *    verification. The classic ℓ-prefix/share-≥1 generator (with
    *    its per-occurrence positional filter) is the k_eff = 1
    *    special case; on a vocabulary-saturated corpus (df ~ N/V on
    *    even the rarest tokens) its candidate volume is ~quadratic
    *    (sf10 measured 2.67e9 post-positional-filter candidates
    *    against a LINEAR true-pair set), while each extra required
    *    shared rare token multiplies false-candidate rejection.
    *  - Size-ratio filter: J ≥ τ ⟹ min(n_a,n_b) ≥ τ·max(n_a,n_b),
    *    applied per occurrence inside the probe join's codegen stage.
    *
    * Unlike banded MinHash-LSH, no qualifying pair can escape — at
    * sf0.1 banding with 32 hashes / r=3 drops a true J ≥ 0.7 pair,
    * which is why the dedup operators candidate through THIS path.
    * Callers wanting an integer-exact threshold apply their own
    * filter on (i, na, nb); the τ given here only has to be ≤ the
    * real cutoff (candidates are a superset).
    */
  def thresholdPairs(sets: DataFrame, idCol: String, tau: Double,
                     minShared: Int = 3): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val bg = sets.select(col(idCol), col("vid"))
    val sizes = bg.groupBy(idCol).agg(count(lit(1)).as("n"))
    val dfreq = bg.groupBy("vid").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("df"), col("vid"))
    val ranked = bg.join(dfreq, "vid")
      .withColumn("r", row_number().over(w))
      .join(sizes, idCol)
    // ≥k-of-m group probe: A (the lower id) keeps only its rarest-token
    // window, B probes with its whole list (the count is over A-window
    // tokens PRESENT in B — restricting B too would drop matches a
    // qualifying pair is entitled to). All ceil() bounds back the float
    // product off by 1e-9 first, so an epsilon-above-integral τ·n can
    // only LENGTHEN the window / LOWER k_eff — never prune a
    // qualifying pair.
    val ellA = col("na") - ceil(lit(tau) * col("na") - lit(1e-9)) + 1
    val kEff = least(lit(minShared), col("na") - ellA + 1)
    val windowA = ranked
      .where(col("r") <=
        least(col("n"), col("n") - ceil(lit(tau) * col("n") - lit(1e-9))
          + lit(minShared)))
      .select(col(idCol).as("id_a"), col("vid"), col("n").as("na"))
    val pairs = windowA
      .join(ranked.select(col(idCol).as("id_b"), col("vid"),
        col("n").as("nb")), "vid")
      .where(col("id_a") < col("id_b"))
      .where(least(col("na"), col("nb")).cast("double") >=
        lit(tau) * greatest(col("na"), col("nb")) - lit(1e-9))
      .groupBy("id_a", "id_b", "na")
      .agg(count(lit(1)).as("shared_in_window"))
      .where(col("shared_in_window") >= kEff)
      .select("id_a", "id_b")
    verify(pairs, bg, sizes, idCol)
  }

  /** Exact ORDERED containment pairs: every (id_a, id_b), a ≠ b, with
    * C(a→b) = |S_a ∩ S_b| / |S_a| ≥ τ, as (id_a, id_b, i, na, nb, c).
    *
    * The naive posting-list self-join shuffles one row per token
    * co-occurrence — Σ_vid df² rows, quadratic on a corpus whose
    * vocabulary stops growing (every token ever hotter). This computes
    * the IDENTICAL result with a counting strengthening of the prefix
    * theorem (the ≥k-of-m group probe):
    *
    *  - Prefix theorem (asymmetric): C(a→b) ≥ τ forces
    *    |S_a ∖ S_b| ≤ ℓ − 1 where ℓ = n_a − ⌈τ·n_a⌉ + 1, so among
    *    ANY m tokens of A, B shares at least m − ℓ + 1. Taking A's
    *    m = min(n_a, ℓ + minShared − 1) RAREST tokens in ascending
    *    global (df, vid) order, a qualifying pair must share
    *    k_eff = min(minShared, ⌈τ·n_a⌉) of them — a per-pair COUNT
    *    threshold on the probe join's output, applied by a
    *    map-combinable aggregation before any exact verification.
    *    The classic ℓ-prefix/share-≥1 generator is the k_eff = 1
    *    special case; its selectivity collapses on a vocabulary-
    *    saturated corpus (df ~ N/V on even the rarest tokens — sf10
    *    measured 4.17e9 probe occurrences against a true-pair set
    *    that is LINEAR in N), while each extra required shared rare
    *    token multiplies false-candidate rejection.
    *  - Size filter: i ≤ min(n_a, n_b) with i ≥ ⌈τ·n_a⌉ forces
    *    n_b ≥ ⌈τ·n_a⌉ (an excerpt can only be contained in a doc at
    *    least as large as its shared part).
    *
    * Candidates then verify exactly (pair-bounded join, not a corpus
    * join). τ only has to be ≤ the caller's real cutoff — callers
    * wanting an integer-exact threshold filter on (i, na) afterwards.
    */
  def containmentPairs(sets: DataFrame, idCol: String, tau: Double,
                       minShared: Int = 3): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    val bg = sets.select(col(idCol), col("vid"))
    val sizes = bg.groupBy(idCol).agg(count(lit(1)).as("n"))
    val dfreq = bg.groupBy("vid").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("df"), col("vid"))
    // every doc's full list carries its global rank once; the A side
    // keeps only its rarest-token window, the B side the whole list
    // (asymmetric — containment gives no right-hand prefix to exploit)
    val ranked = bg.join(dfreq, "vid")
      .withColumn("r", row_number().over(w))
      .join(sizes, idCol)
    // ≥k-of-m group probe (the prefix theorem, strengthened by
    // counting): with ℓ = n_a − ⌈τ·n_a⌉ + 1, B misses at most ℓ − 1
    // of A's tokens, so among A's m = min(n_a, ℓ + minShared − 1)
    // RAREST tokens B must share ≥ k_eff = m − ℓ + 1 =
    // min(minShared, n_a − ℓ + 1). The ℓ-prefix/≥1 generator is the
    // k_eff = 1 special case — on a vocabulary-saturated corpus its
    // selectivity collapses (every prefix token's df ~ N/V, sf10
    // measured 4.17e9 probe occurrences against a LINEAR true-pair
    // set), while requiring 3 shared rare tokens multiplies the
    // false-candidate rejection without touching completeness. The
    // per-occurrence positional filter of the k=1 form is dropped:
    // it only guarantees survival of a pair's EARLIEST common token,
    // which is incompatible with counting (true pairs would lose
    // later occurrences and miss the threshold).
    val ellA = col("na") - ceil(lit(tau) * col("na") - lit(1e-9)) + 1
    val kEff = least(lit(minShared), col("na") - ellA + 1)
    val windowA = ranked
      .where(col("r") <=
        least(col("n"), col("n") - ceil(lit(tau) * col("n") - lit(1e-9))
          + lit(minShared)))
      .select(col(idCol).as("id_a"), col("vid"), col("n").as("na"))
    val pairs = windowA
      .join(ranked.select(col(idCol).as("id_b"), col("vid"),
        col("n").as("nb")), "vid")
      .where(col("id_a") =!= col("id_b"))
      .where(col("nb").cast("double") >= lit(tau) * col("na") - lit(1e-9))
      .groupBy("id_a", "id_b", "na")
      .agg(count(lit(1)).as("shared_in_window"))
      .where(col("shared_in_window") >= kEff)
      .select("id_a", "id_b")
    verify(pairs, bg, sizes, idCol)
      .withColumn("c", col("i").cast("double") / col("na"))
      .drop("j")
  }

  /** Exact (i, na, nb, j) for an explicit pair frame — cost bounded by
    * Σ over pairs of the left set size, not by the corpus.
    */
  private def verify(pairs: DataFrame, sets: DataFrame, sizes: DataFrame,
                     idCol: String): DataFrame =
    pairs
      .join(sets.select(col(idCol).as("id_a"), col("vid")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("vid")), Seq("id_b", "vid"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("i"))
      .join(sizes.select(col(idCol).as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n").as("nb")), "id_b")
      .withColumn("j",
        col("i").cast("double") / (col("na") + col("nb") - col("i")))
}
