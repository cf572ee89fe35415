package graft.tools

import graft.Tables
import graft.pipeline.{Jaccard, TextOps}
import org.apache.spark.sql.functions._

/** Times thresholdPairs under each forced generator at a given dir/τ —
  * the measurement behind the adaptive generator decision.
  *
  * Usage: runMain graft.tools.GenCompare <sfDir> [tau]
  */
object GenCompare {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tau = if (args.length > 1) args(1).toDouble else 0.7
    val spark = graft.Graft.session(cores = 32, appName = "graft-gencompare")
    spark.sparkContext.setLogLevel("ERROR")
    val ids = TextOps.shinglesOfText(Tables.load(spark, dir, "documents"),
        "doc_id", "text", 3)
      .select(col("doc_id"), xxhash64(col("shingle")).as("vid"))
      .distinct().localCheckpoint(true)
    for (gen <- Seq("prefix", "counting"); i <- 1 to 2) {
      val t0 = System.nanoTime()
      Jaccard.thresholdPairs(ids, "doc_id", tau, forceGenerator = Some(gen))
        .write.format("noop").mode("overwrite").save()
      println(f"$gen run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"(${Jaccard.lastGenerator.get})")
    }
    spark.stop()
  }
}
