package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash signatures + LSH banding for near-duplicate detection —
  * the standard shingle → minhash → band → bucket-join pipeline.
  *
  * Hash family: h_j(x) = ((2j+3)·(x mod P) + 5j+7) mod P over hashed
  * shingle ids — affine over the prime field P = 2^61−1 (Mersenne),
  * exactly reproducible in ANSI SQL (the oracle mirrors it with
  * HUGEINT arithmetic; the engine computes the out-of-64-bit product
  * exactly in whole-stage codegen via [[graft.functions.MersenneAffine]]
  * — multiplyHigh + Mersenne folding, bit-identical to the HUGEINT
  * form). P must dwarf the
  * distinct-shingle count or every h_j factors through the SAME
  * collapsed universe and the functions stop being independent — at
  * 2^61−1 the 60-bit md5-derived ids are reduced injectively, and
  * the non-negative-residue step keeps negative xxhash64 ids
  * well-defined.
  *
  * Scale: signatures are one groupBy over (doc, j) with partial min;
  * banding shuffles 500M docs × b rows, each tiny; the candidate join
  * is an equi-join on (band, key) whose fan-out LSH keeps near-linear.
  */
object MinHashLsh {

  val P = 2305843009213693951L // 2^61 - 1, Mersenne prime

  /** (id, j, mh): the k-wide minhash signature of every document.
    * Input: (id, vid) — one row per (document, shingle-id) occurrence.
    *
    * k min-aggregates in one groupBy (partial-agg, codegen) instead of
    * exploding occurrences k× — the shuffle carries one row per
    * document; the (id, j, mh) shape is recovered with a stack.
    */
  def signatures(shingleIds: DataFrame, idCol: String, k: Int): DataFrame = {
    graft.functions.MersenneAffine.register(shingleIds.sparkSession)
    val mins = (0 until k).map { j =>
      // (2j+3)·v can reach ~2^68: exact via multiplyHigh + Mersenne fold
      min(expr(s"graft_mersenne(vid, ${2 * j + 3}, ${5 * j + 7})")).as(s"m$j")
    }
    val stacked = (0 until k).map(j => s"${j}L, m$j").mkString(", ")
    shingleIds
      .groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), expr(s"stack($k, $stacked) AS (j, mh)"))
  }

  /** (id, band, key): LSH band keys — r consecutive hashes per band,
    * concatenated in j order.
    */
  def bands(sigs: DataFrame, idCol: String, r: Int): DataFrame =
    sigs.groupBy(col(idCol), (col("j") / r).cast("long").as("band"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("j"), col("mh")))),
          x => x.getField("mh").cast("string")), "-").as("key"))

  /** Candidate pairs (id_a < id_b) sharing at least one band bucket. */
  def candidates(bandDf: DataFrame, idCol: String): DataFrame = {
    val a = bandDf.select(col("band"), col("key"), col(idCol).as("id_a"))
    val b = bandDf.select(col("band"), col("key"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "key")).where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Candidate pairs annotated with estimated Jaccard =
    * (matching signature positions) / k.
    */
  def estimate(cands: DataFrame, sigs: DataFrame, idCol: String, k: Int): DataFrame = {
    val sa = sigs.select(col(idCol).as("id_a"), col("j"), col("mh").as("mh_a"))
    val sb = sigs.select(col(idCol).as("id_b"), col("j"), col("mh").as("mh_b"))
    cands.join(sa, "id_a").join(sb, Seq("id_b", "j"))
      .groupBy(col("id_a"), col("id_b"))
      .agg((sum(when(col("mh_a") === col("mh_b"), 1).otherwise(0))
        .cast("double") / k).as("est_jaccard"))
  }
}
