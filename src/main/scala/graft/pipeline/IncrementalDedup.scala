package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental corpus-update dedup: match an INCOMING document batch
  * against an EXISTING corpus via a cross-side-only LSH band join,
  * then exact-verify. The existing side's band keys and shingle-id
  * sets are what a production pipeline persists as its dedup index —
  * per-update work is O(incoming + collided buckets), independent of
  * the existing corpus's pair count, and existing×existing pairs are
  * never enumerated.
  *
  * Exact verification (integer-form τ: 17·i ≥ 7·(ni+ne) ⟺ jaccard ≥
  * 0.7) makes the result independent of the hash family, so the
  * batch query (p23) is gated by an all-pairs DuckDB oracle and the
  * streaming wrapper (s4) must converge to the identical answer.
  *
  * Both entry points take (id, vid) DISTINCT shingle-id frames so
  * callers choose the hash (xxhash64 engine-only, hashId for oracle
  * parity) and the shingle width once.
  */
object IncrementalDedup {

  /** (id_in, id_ex, jaccard): every incoming-vs-existing pair with
    * exact jaccard ≥ 0.7, found through the cross-side band join.
    */
  def crossMatches(inIds: DataFrame, exIds: DataFrame,
                   idCol: String): DataFrame = {
    def bandsOf(ids: DataFrame) = MinHashLsh.bands(
      MinHashLsh.signatures(ids, idCol, 32), idCol, r = 3)
    val cands = bandsOf(exIds)
      .select(col("band"), col("key"), col(idCol).as("id_ex"))
      .join(bandsOf(inIds)
        .select(col("band"), col("key"), col(idCol).as("id_in")),
        Seq("band", "key"))
      .select("id_in", "id_ex").distinct()
    val inSz = inIds.groupBy(idCol).agg(count(lit(1)).as("ni"))
      .withColumnRenamed(idCol, "id_in")
    val exSz = exIds.groupBy(idCol).agg(count(lit(1)).as("ne"))
      .withColumnRenamed(idCol, "id_ex")
    cands
      .join(inIds.select(col(idCol).as("id_in"), col("vid")), "id_in")
      .join(exIds.select(col(idCol).as("id_ex"), col("vid")),
        Seq("id_ex", "vid"))
      .groupBy("id_in", "id_ex").agg(count(lit(1)).as("i"))
      .join(inSz, "id_in")
      .join(exSz, "id_ex")
      .where(col("i") * 17 >= (col("ni") + col("ne")) * 7)
      .select(col("id_in"), col("id_ex"),
        round(col("i").cast("double") / (col("ni") + col("ne") - col("i")), 6)
          .as("jaccard"))
  }

  /** One row per matched incoming id: match count + best witness
    * (highest jaccard, ties to the lowest existing id).
    */
  def bestWitness(matches: DataFrame): DataFrame =
    matches.groupBy("id_in")
      .agg(count(lit(1)).as("n_matches"),
        max_by(struct(col("id_ex"), col("jaccard")),
          struct(col("jaccard"), -col("id_ex"))).as("best"))
      .select(col("id_in").as("doc_id"), col("n_matches"),
        col("best.id_ex").as("best_match"),
        col("best.jaccard").as("best_jaccard"))
}
