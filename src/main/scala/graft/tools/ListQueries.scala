package graft.tools

/** Print every declared query name, one per line — lets scale-sweep
  * scripts compute SPARK_GRAFT_BENCH_EXCLUDE sets from the CURRENT
  * surface instead of a stale artifact's key list.
  */
object ListQueries {
  def main(args: Array[String]): Unit =
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach(println)
}
