package graft.tools

import graft.pipeline.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-duplicate stress for the keep-first dedup family (p1/p33/p35):
  * two corpora of EQUAL row count — one all-distinct, one where every
  * row is the SAME document (a single content hash / line hash / span
  * hash carrying 100% of the corpus) — and the skew gate is wall time
  * on the duplicated corpus within 2× of the distinct corpus.
  *
  * This is the workload the round-6 rewrite targets: keep-first as a
  * lid/sid/md5-PARTITIONED window sorts the hot key's entire group in
  * one task (observed >10× here before the rewrite), while the
  * min(struct) aggregate + streaming join probe map-side-combines the
  * hot key down to one row per mapper and never accumulates per-key
  * state on the probe.
  *
  * Usage: runMain graft.tools.DupStress [rows]   (default 1,000,000)
  */
object DupStress {

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = graft.Graft.session(cores = 32, appName = "graft-dupstress")
    spark.sparkContext.setLogLevel("WARN")
    val ok = run(spark, n)
    spark.stop()
    if (!ok) sys.exit(1)
  }

  /** The envelope as a boolean (StressAll's unit): every op's
    * hot-duplicate ratio ≤ 2× its all-distinct time, and keep-first
    * keeps exactly the first survivor however hot the key.
    */
  def run(spark: org.apache.spark.sql.SparkSession, n: Long): Boolean = {
    // 16 tokens/doc: two 8-token lines, nine 8-token spans per doc.
    // distinct: last token varies per doc → every hash unique.
    // dup: byte-identical docs → ONE md5 / line / span key corpus-wide.
    val stem = (1 to 15).map("w" + _).mkString(" ")
    val distinct = spark.range(n).select(col("id").as("doc_id"),
      concat(lit(stem + " t"), col("id")).as("text"))
      .localCheckpoint(true)
    val dup = spark.range(n).select(col("id").as("doc_id"),
      lit(stem + " t0").as("text"))
      .localCheckpoint(true)

    def exactDedup(d: DataFrame): DataFrame = {
      val h = d.select(col("doc_id"),
        md5(col("text").cast("binary")).as("text_md5"))
      val firsts = h.groupBy(col("text_md5"))
        .agg(min(col("doc_id")).as("first_id"))
      h.join(firsts, "text_md5")
        .select(col("doc_id"), col("text_md5"),
          (col("doc_id") === col("first_id")).as("keep"))
    }

    val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
      ("p1_exact", exactDedup),
      ("p33_line", d => TextAnalysis.lineDedup(d, "doc_id", "text", k = 8)),
      ("p35_substr", d => TextAnalysis.substrDedup(d, "doc_id", "text", k = 8)),
      // one domain, every line shared by ALL docs: the hottest possible
      // (source, lid) doc-frequency key — must stay combiner-shaped
      ("p40_boiler", d => TextAnalysis.boilerplateStrip(
        d.withColumn("source", lit("s0")), "doc_id", "text", "source",
        k = 8, minDocs = 2)))

    val results = for ((name, op) <- ops) yield {
      def run(d: DataFrame): Double = {
        op(d).write.format("noop").mode("overwrite").save() // warm
        time(op(d).write.format("noop").mode("overwrite").save())
      }
      val tu = run(distinct); val th = run(dup)
      println(f"[dup] $name%-11s distinct ${tu}%.2f s  dup ${th}%.2f s  " +
        f"ratio ${th / tu}%.2f")
      (name, th / tu)
    }
    // keep-first result sanity on the duplicated corpus: exactly one
    // survivor (the smallest doc_id) however hot the key
    val kept = exactDedup(dup).where(col("keep")).count()
    val keptLine = TextAnalysis.lineDedup(dup, "doc_id", "text", k = 8)
      .agg(sum(col("n_kept"))).head().getLong(0)
    println(s"[dup] survivors: exact=$kept (want 1) lineKept=$keptLine (want 2)")

    results.foreach { case (name, r) =>
      val verdict = if (r <= 2.0) "OK (<=2x)" else "FAIL (>2x)"
      println(f"[dup] $name%-11s $r%.2f  $verdict")
    }
    results.forall(_._2 <= 2.0) && kept == 1L && keptLine == 2L
  }
}
