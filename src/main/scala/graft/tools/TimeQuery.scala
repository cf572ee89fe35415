package graft.tools

import graft.{Graft, SparkEntry}

/** Dev tool: time individual declared queries.
  * Usage: runMain graft.tools.TimeQuery <sfDir> <name> [name...]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Graft.session(cores = 32, appName = "graft-time")
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { n =>
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"$n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
