package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy longest-match subword encoding (the WordPiece/BPE-apply
  * inference step — Wu et al. 2016's "greedy longest-match-first"
  * against a FIXED vocabulary) — the other half of the tokenizer story
  * next to T8's vocabulary induction: given a pinned piece vocabulary,
  * segment every word into the longest matching pieces left to right,
  * unknown characters consumed one at a time as `?` pieces.
  *
  * Scale shape (why this is not a per-token UDF crawl):
  *  1. Encoding runs over DISTINCT words only — the dictionary-encode
  *     trick. The distinct-word frame is sublinear in the corpus (Heaps'
  *     law), and occurrences get their pieces back by broadcast join.
  *  2. The longest-match table `lmp(word, pos) = longest vocab piece
  *     prefixing word[pos..]` is ONE broadcast join (vocab is O(|V|),
  *     always broadcast) + one max_by partial aggregate — fully
  *     codegen'd, no per-row driver logic.
  *  3. The greedy chain walk (pos -> pos + len(piece)) is inherently
  *     sequential PER WORD, so it runs as a typed per-word fold over
  *     the word's ≤|word| lmp rows — the [[graft.operators.SeriesFold]]
  *     contract: group size bounded by word length, never corpus size.
  *
  * Determinism: at a given (word, pos) two vocab pieces of equal length
  * that both match are the SAME string, so max_by(piece, length) has no
  * real ties and the segmentation is unique — identical on any engine,
  * any partitioning (mirrored by a DuckDB recursive-CTE walk).
  */
object Subword {

  /** (word, pieces, n_pieces, n_unk) for every input word; `pieces` is
    * the space-joined segmentation with `?` marking unknown chars.
    *
    * @param words one `word` column, assumed distinct non-empty
    * @param vocab the pinned piece vocabulary
    */
  def encode(words: DataFrame, vocab: Seq[String]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val v = vocab.toDF("piece")
    val lmp = words
      .select(col("word"), explode(sequence(lit(1), length(col("word"))))
        .as("pos"))
      .join(broadcast(v),
        substring(col("word"), col("pos"), length(col("piece"))) ===
          col("piece"), "left")
      .groupBy(col("word"), col("pos"))
      .agg(max_by(col("piece"), length(col("piece"))).as("piece"))
    lmp.select(col("word"), col("pos"), col("piece"))
      .as[(String, Int, Option[String])]
      .groupByKey(_._1)
      .mapGroups { (word, it) =>
        // one word's positions: bounded by word length, never corpus
        val m = new Array[String](word.length + 2)
        it.foreach(r => r._3.foreach(p => m(r._2) = p))
        val sb = new StringBuilder
        var pos = 1; var n = 0L; var unk = 0L
        while (pos <= word.length) {
          val p = m(pos)
          if (p == null) { unk += 1; n += 1; sb.append('?'); pos += 1 }
          else { n += 1; sb.append(p); pos += p.length }
          if (pos <= word.length) sb.append(' ')
        }
        (word, sb.toString, n, unk)
      }
      .toDF("word", "pieces", "n_pieces", "n_unk")
  }
}
