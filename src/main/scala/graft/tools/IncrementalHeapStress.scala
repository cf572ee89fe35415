package graft.tools

import org.apache.spark.sql.functions._

/** The incremental-dedup capped-heap gate (r12 verdict item 8): the
  * batch ppjoin generator earned its 8 GB-executor evidence in r12
  * (PpjoinHeapStress); the streaming path — [[graft.pipeline
  * .IncrementalDedup]] index build plus the cross-side adaptive probe
  * — is the PRODUCTION continuous-crawl shape and had none. This main
  * is the test body: over the same Heaps-mode ~100k-doc corpus, build
  * the persisted index from the ~90% "existing" split, probe the ~10%
  * "incoming" batch through crossMatches, and count verified matches,
  * all inside whatever heap the launcher gave THIS JVM. [[StressAll]]
  * spawns it with -Xmx8g / local[4] (the executor-equivalent shape)
  * and asserts a zero exit — build and probe must degrade to spill,
  * never OOM.
  *
  * Standalone: runMain graft.tools.IncrementalHeapStress <fixtureDir> [cores]
  */
object IncrementalHeapStress {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cores = if (args.length > 1) args(1).toInt else 4
    val spark = graft.Graft.session(cores = cores,
      appName = "graft-incdedup-heap")
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ids = graft.pipeline.TextOps
      .shinglesOfText(docs, "doc_id", "text", 3)
      .select(col("doc_id"), xxhash64(col("shingle")).as("vid"))
      .distinct()
    val existing = ids.where(pmod(col("doc_id"), lit(10)) =!= 0)
    val incoming = ids.where(pmod(col("doc_id"), lit(10)) === 0)
    val index = graft.pipeline.IncrementalDedup
      .buildIndex(existing, "doc_id")
    val matches = graft.pipeline.IncrementalDedup
      .crossMatches(incoming, index, "doc_id").count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[incdedup-heap] docs=${docs.count()} matches=$matches " +
      f"gen=${graft.pipeline.IncrementalDedup.lastGenerator.get()} " +
      f"heapMaxGb=${Runtime.getRuntime.maxMemory() / 1e9}%.1f " +
      f"cores=$cores wall=$dt%.1f s")
    spark.stop()
  }

  /** Child-JVM launch; true iff the child exits 0. */
  def runCapped(dir: String, xmx: String = "8g", cores: Int = 4): Boolean =
    ChildJvm.runCapped("graft.tools.IncrementalHeapStress",
      Seq(dir, cores.toString), xmx, "incdedup-heap")
}
