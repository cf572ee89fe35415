package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-contract smoke: a BARE session (none of our own configs —
  * catches settings that only work inside graft.Graft.session, e.g.
  * the parquet-nanos flag) driving SparkEntry.entry; exits non-zero
  * unless rows > 0.
  */
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows: $n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
