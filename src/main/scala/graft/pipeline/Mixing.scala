package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic domain-mixture sampling: given integer target weights
  * per source and a token budget, keep each document independently with
  * probability rate_s = min(1, budget · w_s / (W · supply_s)) so the
  * kept corpus approaches the target mixture without exceeding the
  * budget. (The training-mixture step of a data pipeline — "2× web,
  * 1× code, capped at N tokens".)
  *
  * The keep decision is a pure per-row predicate on a 60-bit content
  * hash: keep ⟺ h · supply_s · W < budget · w_s · 2^60, evaluated in
  * DECIMAL(38,0) so it is integer-exact and bit-identical on any
  * engine and any partitioning (magnitudes: h ≤ 2^60 ≈ 1.2e18,
  * supply ≤ 2.5e13 tokens at 100 TB, W ≤ 1e3 → products < 1e35 < 1e38).
  * The min(1, ·) cap is implicit: rate ≥ 1 makes the RHS dominate every
  * possible h. Per-source supplies are one partial-aggregated groupBy
  * broadcast back — no shuffle of the corpus itself, one scan total.
  */
object Mixing {

  /** Adds (n_tok, keep) to `docs`. `weight`: integer target weight per
    * row's source (must be constant per source); `budgetDiv`: budget =
    * total_supply / budgetDiv.
    */
  def sampleToMixture(docs: DataFrame, idCol: String, srcCol: String,
                      textCol: String, weight: Column,
                      budgetDiv: Int): DataFrame = {
    val dec = "decimal(38,0)"
    val d = docs.select(col(idCol), col(srcCol),
      size(split(col(textCol), " ")).cast("long").as("n_tok"),
      TextOps.hashId(concat(lit("mix-"), col(idCol).cast("string"))).as("h"),
      weight.cast("long").as("w"))
    val supply = d.groupBy(col(srcCol), col("w"))
      .agg(sum(col("n_tok")).as("supply"))
    val tot = supply.agg(sum(col("supply")).as("total"),
      sum(col("w")).as("bigw"))
    val twoPow60 = lit(1152921504606846976L).cast(dec)
    d.join(broadcast(supply), Seq(srcCol, "w"))
      .crossJoin(broadcast(tot))
      .withColumn("keep",
        col("h").cast(dec) * col("supply").cast(dec) * col("bigw").cast(dec) <
          expr(s"total div $budgetDiv").cast(dec) * col("w").cast(dec) * twoPow60)
      .select(col(idCol), col(srcCol), col("n_tok"), col("keep"))
  }
}
