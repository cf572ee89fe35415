package graft.tools

import org.apache.spark.sql.functions._

/** The ppjoin capped-heap gate (round-11 verdict item 4): the sf10h
  * sweep proved the counting-generator build can OOM a shared 8 GB
  * local[32] heap at 500k docs, and the "fine on 8 GB real executors"
  * claim was an assertion. This main IS the test body: run
  * `Jaccard.thresholdPairs` end-to-end over a Heaps-mode ~100k-doc
  * corpus inside whatever heap the launcher gave THIS JVM.
  * [[StressAll]] spawns it as a CHILD JVM with -Xmx8g and local[4]
  * (the executor-equivalent shape) and asserts a zero exit — the
  * generator must degrade to spill, never OOM.
  *
  * Standalone: runMain graft.tools.PpjoinHeapStress <fixtureDir> [cores]
  */
object PpjoinHeapStress {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cores = if (args.length > 1) args(1).toInt else 4
    val spark = graft.Graft.session(cores = cores,
      appName = "graft-ppjoin-heap")
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count()
    val ids = graft.pipeline.TextOps
      .shinglesOfText(docs, "doc_id", "text", 3)
      .select(col("doc_id"), xxhash64(col("shingle")).as("vid"))
      .distinct().localCheckpoint(true)
    val pairs = graft.pipeline.Jaccard
      .thresholdPairs(ids, "doc_id", tau = 0.7)
      .where(col("i") * 17 >= (col("na") + col("nb")) * 7)
      .count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[ppjoin-heap] docs=$nDocs pairs=$pairs " +
      f"gen=${graft.pipeline.Jaccard.lastGenerator.get()} " +
      f"heapMaxGb=${Runtime.getRuntime.maxMemory() / 1e9}%.1f " +
      f"cores=$cores wall=$dt%.1f s")
    spark.stop()
  }

  /** Launch [[main]] in a child JVM with a capped heap; true iff the
    * child exits 0 (an OOM-killed or heap-exhausted child does not).
    */
  def runCapped(dir: String, xmx: String = "8g", cores: Int = 4): Boolean =
    ChildJvm.runCapped("graft.tools.PpjoinHeapStress",
      Seq(dir, cores.toString), xmx, "ppjoin-heap")
}
