package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact BM25 (Okapi) retrieval over a tokenized corpus — the lexical
  * half of a training-data / RAG search stack (the dense half is
  * P7/P8/P9/P13's ANN family).
  *
  * Scale shape (the reason this is NOT a generic "search engine"):
  * the query term set is O(10), so every corpus-sized intermediate is
  * either a per-doc partial aggregate (doc length) or a partial
  * aggregate over `tokens ⋉ queryTerms` (term frequencies after a
  * codegen'd `isin` filter at the scan). The document-frequency table
  * and the corpus stats (N, avgdl) are O(|terms|) and O(1) and join
  * back by broadcast — nothing corpus-sized ever shuffles twice, and
  * the final top-k is a TakeOrderedAndProject, not a global sort.
  *
  * Determinism across engines: per-term scores are rounded to 1e-6
  * and summed as DECIMAL, so the only float ops are ln / div / mul on
  * identical doubles (correctly-rounded IEEE in both engines at this
  * precision — same stance as [[LanguageModel]]'s micro-log-probs).
  */
object Bm25 {

  /** (doc_id, score, n_hit) for every document matching ≥1 query term.
    *
    * @param toks  (idCol, token) one row per token occurrence
    * @param terms the query's terms (deduplicated by the caller)
    */
  def score(toks: DataFrame, idCol: String, terms: Seq[String],
            k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    // O(1) corpus stats: exact integer totals, then one IEEE division
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = toks.where(col("token").isin(terms: _*))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    // O(|terms|) document frequencies; broadcast back onto tf
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df), "token")
      .join(dl, idCol) // both sides already hash-partitioned by idCol
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("term_score",
        // tf*k1 + tf (not tf*(k1+1)): the oracle mirrors this exact form so
        // both engines evaluate the same IEEE ops on the same doubles
        round(col("idf") * (col("tf") * k1 + col("tf")) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))), 6)
          .cast("decimal(28,6)"))
    scored.groupBy(col(idCol))
      .agg(sum(col("term_score")).cast("double").as("score"),
        count(lit(1)).as("n_hit"))
  }
}
