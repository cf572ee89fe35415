package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tokenization primitives shared by the dedup / text-analysis
  * operators. All outputs are 1-based positions to match SQL oracles.
  *
  * Scale note: `vocabIds` assigns dense ids with a global sort — used
  * only by the oracle-checked queries, where cross-engine determinism
  * requires arithmetic-friendly ids. The production hasher for 100 TB
  * corpora is `xxhash64` (no join, no global sort); every operator in
  * this package takes the token-id column as input so either source
  * works.
  */
object TextOps {

  /** (idCol, pos, token) — one row per token occurrence, pos 1-based. */
  def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos0", "token")))
      .select(col(idCol), (col("pos0") + 1).as("pos"), col("token"))

  /** Word k-shingles via window lead — (idCol, pos, shingle). */
  def shingles(toks: DataFrame, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val parts = (0 until k).map {
      case 0 => col("token")
      case i => lead(col("token"), i).over(w)
    }
    toks.select(col(idCol), col("pos"),
        concat_ws(" ", parts: _*).as("shingle"),
        parts.last.isNotNull.as("__complete"))
      .where(col("__complete")).drop("__complete")
  }

  /** Dense deterministic ids over the distinct values of `valueCol`
    * (binary string order). Oracle-parity path; see scale note above.
    */
  def vocabIds(df: DataFrame, valueCol: String): DataFrame =
    df.select(valueCol).distinct()
      .withColumn("vid", row_number().over(Window.orderBy(col(valueCol))).cast("long"))
}
