package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 32-bit SimHash fingerprints + Hamming-distance near-dup pairs.
  *
  * Each token id is spread to 32 bits with a Knuth multiplicative
  * hash; per bit, occurrences vote ±1; the sign of the vote is the
  * fingerprint bit. Near-dups = pairs with popcount(xor) below a
  * threshold. All integer arithmetic — bit-stable across engines.
  */
object SimHash {

  private val Spread = 2654435761L // Knuth's multiplicative constant
  private val Mod32 = 4294967296L  // 2^32

  /** (id, simhash): input one row per (document, token-id) occurrence.
    *
    * One groupBy with 32 per-bit vote aggregates (all inside one
    * whole-stage-codegen hash aggregation) instead of exploding every
    * occurrence 32× — the shuffle carries one row per document.
    */
  def fingerprints(tokenIds: DataFrame, idCol: String): DataFrame = {
    val g = pmod(col("vid") * Spread, lit(Mod32))
    val votes = (0 until 32).map { b =>
      // vote: +1 when the spread hash has bit b set, else -1
      sum(expr(s"(shiftright(g, $b) & 1) * 2 - 1")).as(s"v$b")
    }
    tokenIds
      .select(col(idCol), g.as("g"))
      .groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until 32).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** Pairs (id_a < id_b) with Hamming distance <= maxDist.
    * The all-pairs comparison here is the exact reference shape; at
    * corpus scale, pre-bucket by 8-bit simhash chunks (pigeonhole:
    * distance<=3 over 4 chunks guarantees one exact chunk match) and
    * join per chunk — same fingerprints feed either strategy.
    */
  def nearPairs(fps: DataFrame, idCol: String, maxDist: Int): DataFrame = {
    val a = fps.select(col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val b = fps.select(col(idCol).as("id_b"), col("simhash").as("sh_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxDist)
  }
}
