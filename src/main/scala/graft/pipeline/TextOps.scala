package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tokenization primitives shared by the dedup / text-analysis
  * operators. All outputs are 1-based positions to match SQL oracles.
  *
  * Token/shingle ids are HASHED per row (`hashId` / `xxhash64`) — no
  * vocabulary join, no global sort, no driver state; the id assignment
  * is embarrassingly parallel at any corpus size. `hashId` (md5-derived
  * 60-bit) is the oracle-parity hash (DuckDB reproduces it in SQL);
  * `xxhash64` is the cheaper engine-only alternative — every operator
  * in this package takes the id column as input so either works.
  */
object TextOps {

  /** (idCol, pos, token) — one row per token occurrence, pos 1-based. */
  def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("pos0", "token")))
      .select(col(idCol), (col("pos0") + 1).as("pos"), col("token"))

  /** Word k-shingles as pure array expressions — (idCol, shingle),
    * one row per span position (multiplicity preserved), NO shuffle.
    *
    * The window variant below costs a full exchange + per-partition
    * sort of the ENTIRE token stream before the first hash — at
    * corpus scale that is the single largest shuffle in every dedup
    * pipeline. This stays narrow (split → transform → explode) and
    * keeps span generation inside whole-stage codegen; only hashed
    * span ids (or partial aggregates) ever shuffle downstream.
    * Property-tested multiset-equal to [[shingles]].
    */
  def shinglesOfText(docs: DataFrame, idCol: String, textCol: String,
                     k: Int): DataFrame = {
    // materialize the token array in its own projection: referenced as
    // an attribute, it is computed once per row — inlining the split
    // into the transform lambda re-tokenizes the whole text for EVERY
    // span (O(tokens²) per doc; measured 2.4x on t5)
    val arr = col("__arr")
    val spans = when(size(arr) >= k,
      transform(sequence(lit(1), size(arr) - (k - 1)),
        i => concat_ws(" ", slice(arr, i, lit(k)))))
      .otherwise(array().cast("array<string>"))
    docs.select(col(idCol), split(col(textCol), " ").as("__arr"))
      .select(col(idCol), explode(spans).as("shingle"))
  }

  /** Word k-shingles via window lead — (idCol, pos, shingle). Kept for
    * callers that need the span POSITION; span-set/multiset consumers
    * should use [[shinglesOfText]] (no shuffle).
    */
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

  /** 60-bit deterministic content id: the first 15 hex chars of the
    * value's md5, parsed base-16 — pure per-row arithmetic (no
    * vocabulary join, no global sort). DuckDB reproduces it as
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`, which is what
    * makes the hashed-id pipeline oracle-checkable cross-engine.
    * Collisions: ~N²/2^61 for N distinct values — negligible, and
    * identical on both engines even if one occurred.
    */
  def hashId(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
}
