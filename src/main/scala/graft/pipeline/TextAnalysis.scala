package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for corpus curation: language-ID scoring, quality
  * metrics, token counting, and document fingerprints. Pure column
  * expressions (codegen-friendly, no UDFs).
  */
object TextAnalysis {

  /** Tiny in-model stopword lists per language (n-gram/stopword
    * heuristic). Real deployments swap in fastText-style models behind
    * the same (text → lang, score) contract.
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Per-language stopword hit count over a tokens DataFrame
    * (id, pos, token); winner = max (score, lang) with alphabetical
    * tiebreak. Output: (id, lang_pred, lang_score).
    */
  def languageId(toks: DataFrame, idCol: String): DataFrame = {
    val scores = Stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      sum(when(col("token").isInCollection(words), 1).otherwise(0))
        .cast("long").as(s"s_$lang")
    }
    val scored = toks.groupBy(col(idCol)).agg(scores.head, scores.tail: _*)
    val langs = Stopwords.keys.toSeq.sorted
    // greatest over (score, inv, lang) structs; `inv` ranks languages in
    // REVERSE alphabetical order so score-ties resolve to the
    // alphabetically-first language (matching the oracle's CASE chain)
    val bestStruct = greatest(langs.reverse.map(l =>
      struct(col(s"s_$l").as("score"),
        lit(langs.size - langs.indexOf(l)).as("inv"),
        lit(l).as("lang"))): _*)
    scored.select(col(idCol), bestStruct.getField("lang").as("lang_pred"),
      bestStruct.getField("score").as("lang_score"))
  }

  /** Quality metrics per document, all from one pass over the text. */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val nTok = size(toks).cast("long")
    val nChar = length(col(textCol)).cast("long")
    val nDistinct = size(array_distinct(toks)).cast("long")
    docs.select(col(idCol),
      nTok.as("n_tokens"),
      nChar.as("n_chars"),
      nDistinct.as("n_distinct"),
      round(nDistinct.cast("double") / nTok, 6).as("distinct_ratio"),
      round((nChar - (nTok - 1)).cast("double") / nTok, 6).as("avg_token_len"),
      // crude quality: repetition-penalized log-length
      round(log(nTok.cast("double") + 1) * (nDistinct.cast("double") / nTok), 6)
        .as("quality"))
  }

  /** Whitespace + byte-derived token-count estimates (BPE-ish ~4
    * bytes/token heuristic).
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nChar = length(col(textCol)).cast("long")
    docs.select(col(idCol),
      size(split(col(textCol), " ")).cast("long").as("n_ws_tokens"),
      nChar.as("n_chars"),
      ceil(nChar.cast("double") / 4.0).cast("long").as("est_bpe_tokens"))
  }

  /** Position-weighted rolling fingerprint over hashed token ids:
    * fp = Σ ((vid mod P) · ((31·pos + 7) mod P)) mod P — order-sensitive
    * (a permuted document fingerprints differently), integer-exact; the
    * mod-P reduction of the 64-bit id keeps the multiply inside Long.
    */
  def fingerprints(tokenIds: DataFrame, idCol: String): DataFrame = {
    val P = 1000003L
    tokenIds.groupBy(col(idCol))
      .agg(pmod(sum(pmod(pmod(col("vid"), lit(P)) *
          pmod(col("pos") * 31 + 7, lit(P)), lit(P))),
        lit(P)).as("fingerprint"))
  }
}
