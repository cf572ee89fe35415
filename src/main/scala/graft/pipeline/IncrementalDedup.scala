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

  /** The persisted index of the existing corpus: band keys for
    * candidate generation, shingle-id sets + set sizes for exact
    * verification. A production pipeline maintains these as tables
    * and only APPENDS to them as batches are accepted.
    */
  final case class Index(bands: DataFrame, ids: DataFrame, sizes: DataFrame)

  def buildIndex(exIds: DataFrame, idCol: String): Index = Index(
    MinHashLsh.bands(MinHashLsh.signatures(exIds, idCol, 32), idCol, r = 3),
    exIds,
    exIds.groupBy(idCol).agg(count(lit(1)).as("ne")))

  /** (id_in, id_ex, jaccard): every incoming-vs-existing pair with
    * exact jaccard ≥ 0.7, found through the cross-side band join.
    */
  def crossMatches(inIds: DataFrame, exIds: DataFrame,
                   idCol: String): DataFrame =
    crossMatches(inIds, buildIndex(exIds, idCol), idCol)

  /** Persisted-index form: only the INCOMING side is hashed here, so
    * the per-update cost is O(incoming + collided buckets) no matter
    * how large the indexed corpus is.
    */
  def crossMatches(inIds: DataFrame, index: Index,
                   idCol: String): DataFrame = {
    val inBands = MinHashLsh.bands(
      MinHashLsh.signatures(inIds, idCol, 32), idCol, r = 3)
    val cands = index.bands
      .select(col("band"), col("key"), col(idCol).as("id_ex"))
      .join(inBands.select(col("band"), col("key"), col(idCol).as("id_in")),
        Seq("band", "key"))
      .select("id_in", "id_ex").distinct()
    val inSz = inIds.groupBy(idCol).agg(count(lit(1)).as("ni"))
      .withColumnRenamed(idCol, "id_in")
    cands
      .join(inIds.select(col(idCol).as("id_in"), col("vid")), "id_in")
      .join(index.ids.select(col(idCol).as("id_ex"), col("vid")),
        Seq("id_ex", "vid"))
      .groupBy("id_in", "id_ex").agg(count(lit(1)).as("i"))
      .join(inSz, "id_in")
      .join(index.sizes.withColumnRenamed(idCol, "id_ex"), "id_ex")
      .where(col("i") * 17 >= (col("ni") + col("ne")) * 7)
      .select(col("id_in"), col("id_ex"),
        (round(col("i").cast("double") / (col("ni") + col("ne") - col("i"))
          * lit(1e6)) / lit(1e6)).as("jaccard"))
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
