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
  private val Mod31 = 2147483648L  // 2^31: keeps vid·Spread inside Long

  /** (id, simhash): input one row per (document, token-id) occurrence.
    * Token ids may be any 64-bit hash — the mod-2^31 reduction first
    * bounds the multiply at ~5.7e18 (inside signed 64-bit).
    *
    * One groupBy with 32 per-bit vote aggregates (all inside one
    * whole-stage-codegen hash aggregation) instead of exploding every
    * occurrence 32× — the shuffle carries one row per document.
    */
  def fingerprints(tokenIds: DataFrame, idCol: String): DataFrame = {
    val g = pmod(pmod(col("vid"), lit(Mod31)) * Spread, lit(Mod32))
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

  /** Pairs (id_a < id_b) with Hamming distance <= maxDist — all-pairs
    * comparison. Exactness baseline for tests at small SF; the engine
    * path is [[nearPairsBucketed]], which returns the identical result
    * through an equi-join.
    */
  def nearPairs(fps: DataFrame, idCol: String, maxDist: Int): DataFrame = {
    val a = fps.select(col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val b = fps.select(col(idCol).as("id_b"), col("simhash").as("sh_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxDist)
  }

  /** Bit layout of the 7 pigeonhole chunks: 4×5 + 3×4 = 32 bits. */
  private val Chunks: Seq[(Int, Int)] =
    Seq((0, 5), (5, 5), (10, 5), (15, 5), (20, 4), (24, 4), (28, 4))

  /** Same result as [[nearPairs]], bucketed: the fingerprint splits
    * into 7 chunks; a pair within Hamming distance 6 differs in at most
    * 6 chunk positions, so SOME chunk matches exactly (pigeonhole).
    * Candidates therefore come from 7 shuffle equi-joins on
    * (chunk index, chunk value) — never a cross join — then the exact
    * Hamming filter and a distinct() (a pair can match several chunks)
    * trim to the true pair set. Fan-out is 7 rows per document; bucket
    * sizes stay balanced because the chunks are hash bits.
    */
  def nearPairsBucketed(fps: DataFrame, idCol: String, maxDist: Int): DataFrame = {
    require(maxDist < Chunks.size,
      s"pigeonhole guarantee needs maxDist < ${Chunks.size}, got $maxDist")
    val chunkCols = Chunks.zipWithIndex.map { case ((off, w), i) =>
      struct(lit(i).as("c"),
        shiftright(col("simhash"), off).bitwiseAND(lit((1L << w) - 1)).as("v"))
    }
    val ex = fps.select(col(idCol), col("simhash"),
        explode(array(chunkCols: _*)).as("ch"))
      .select(col(idCol), col("simhash"),
        col("ch.c").as("c"), col("ch.v").as("v"))
    val a = ex.select(col("c"), col("v"), col(idCol).as("id_a"),
      col("simhash").as("sh_a"))
    val b = ex.select(col("c"), col("v"), col(idCol).as("id_b"),
      col("simhash").as("sh_b"))
    a.join(b, Seq("c", "v")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxDist)
      .distinct()
  }
}
