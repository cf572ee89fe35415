package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** 63-bit SimHash fingerprints + Hamming-distance near-dup pairs,
  * bucketable Manku-style (the Google near-dup detection layout:
  * a wide fingerprint split into few chunks so each chunk is a
  * selective equi-join key).
  *
  * Each token id is spread to two 32-bit words with multiplicative
  * hashes (Knuth's constant and a second public odd constant); per
  * bit, occurrences vote ±1; the sign of the vote is the fingerprint
  * bit. 63 bits (word1's 32 + word2's low 31) keep the packed value
  * inside a positive signed 64-bit integer on both engines. Near-dups
  * = pairs with popcount(xor) <= maxDist. All integer arithmetic —
  * bit-stable across engines.
  *
  * A 63-bit fingerprint (vs the minimal 32) is what makes bucketing
  * WORK: with Hamming <= 3 the pigeonhole needs only 4 chunks, so each
  * chunk carries ~16 bits ≈ 65k bucket values — vote-skewed corpora
  * still spread out, where 5-bit chunks of a 32-bit fingerprint
  * collapse into 32 buckets and the candidate join degenerates toward
  * all-pairs.
  */
object SimHash {

  private val Spread1 = 2654435761L // Knuth's multiplicative constant
  private val Spread2 = 2246822519L // xxHash PRIME32_2 (public constant)
  private val Mod32 = 4294967296L   // 2^32
  private val Mod31 = 2147483648L   // 2^31: keeps vid·spread inside Long

  val Bits = 63

  /** (id, simhash): input one row per (document, token-id) occurrence.
    * Token ids may be any 64-bit hash — the mod-2^31 reduction first
    * bounds each multiply at ~5.7e18 (inside signed 64-bit).
    *
    * One groupBy with 63 per-bit vote aggregates (all inside one
    * whole-stage-codegen hash aggregation) instead of exploding every
    * occurrence 63× — the shuffle carries one row per document.
    */
  def fingerprints(tokenIds: DataFrame, idCol: String): DataFrame =
    fingerprintsWeighted(tokenIds.withColumn("__w", lit(1L)), idCol, "__w")

  /** Weighted SimHash: one row per (document, token-id) with an integer
    * weight column — each bit's vote is ±weight (the tf-weighted vote of
    * the classic Charikar construction), so the fingerprint tracks the
    * direction of the WEIGHTED term vector and Hamming distance tracks
    * the angle: cos ≈ 0.998 ⇒ E[Hamming] ≈ 63·(3.6°/180°) ≈ 1.3.
    * Integer vote sums — bit-stable at any parallelism.
    */
  def fingerprintsWeighted(rows: DataFrame, idCol: String,
                           weightCol: String): DataFrame = {
    val g1 = pmod(pmod(col("vid"), lit(Mod31)) * Spread1, lit(Mod32))
    val g2 = pmod(pmod(col("vid"), lit(Mod31)) * Spread2, lit(Mod32))
    val votes = (0 until Bits).map { b =>
      // vote: +weight when the spread word has the bit set, else -weight
      val (w, bit) = if (b < 32) ("g1", b) else ("g2", b - 32)
      sum(expr(s"((shiftright($w, $bit) & 1) * 2 - 1) * __wt")).as(s"v$b")
    }
    rows
      .select(col(idCol), col(weightCol).cast("long").as("__wt"),
        g1.as("g1"), g2.as("g2"))
      .groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until Bits).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(0L))
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

  /** Bit layout of `blocks` pigeonhole blocks over the 63 fingerprint
    * bits: the first 63 % blocks get one extra bit (blocks=4 →
    * 16,16,16,15 — the historical chunk layout).
    */
  private def blockLayout(blocks: Int): Seq[(Int, Int)] = {
    val base = Bits / blocks
    val widths = Seq.tabulate(blocks)(i => base + (if (i < Bits % blocks) 1 else 0))
    widths.scanLeft(0)(_ + _).zip(widths)
  }

  /** Same result as [[nearPairs]], bucketed (Manku, Jain & Das Sarma
    * 2007 §3): the fingerprint splits into `blocks` blocks; a pair
    * within Hamming distance d differs in at most d block positions,
    * so SOME (blocks − d)-subset of blocks matches exactly
    * (pigeonhole — every such subset is a join table, and the clean
    * blocks of a qualifying pair contain one). Candidates come from
    * C(blocks, blocks−d) shuffle equi-joins on (table index, packed
    * block values) — never a cross join — then the exact Hamming
    * filter and a distinct() (a pair can match several tables) trim
    * to the true pair set.
    *
    * The blocks/tables trade is the Manku space–selectivity dial:
    * blocks=4, d≤3 keys each of 4 tables on ~16 bits — fine while
    * fingerprints spread, but a vote-skewed corpus (tokens shared by
    * most docs drive most bits the same way) concentrates them and
    * 16-bit buckets go hot, candidates ~N²/2^16 per table. blocks=6,
    * d≤3 keys C(6,3)=20 tables on ~33 bits — 5× the fan-out rows
    * (still one narrow row per (doc, table)) for 2^17× the key
    * space, which holds candidate volume ~linear on exactly the
    * corpora that break the 4-block layout. Output is identical
    * either way (PipelineScaleSpec cross-checks both against the
    * all-pairs baseline).
    */
  def nearPairsBucketed(fps: DataFrame, idCol: String, maxDist: Int,
                        blocks: Int = 4): DataFrame = {
    require(maxDist < blocks,
      s"pigeonhole guarantee needs maxDist < blocks=$blocks, got $maxDist")
    require(blocks <= 16, s"blocks=$blocks: layout is for few wide blocks")
    val layout = blockLayout(blocks)
    val blockVal = layout.map { case (off, w) =>
      shiftright(col("simhash"), off).bitwiseAND(lit((1L << w) - 1))
    }
    val chunkCols = (0 until blocks).combinations(blocks - maxDist)
      .toSeq.zipWithIndex.map { case (combo, i) =>
        // pack the combo's block values into one long key (≤ 11·3 = 33
        // bits at blocks=6): fold left, shifting by each next width
        val packed = combo.map(b => (blockVal(b), layout(b)._2))
          .reduceLeft[(org.apache.spark.sql.Column, Int)] {
            case ((acc, _), (v, w)) => (shiftleft(acc, w) + v, w)
          }._1
        struct(lit(i).as("c"), packed.as("v"))
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
