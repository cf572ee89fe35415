package graft.tools

import graft.SparkEntry
import graft.Graft

/** Dev tool: dump formatted physical plans for the named queries (or a
  * default headline set) so scan pushdown / broadcast / codegen spans
  * can be reviewed. Usage: runMain graft.tools.ExplainDump [names...]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session(cores = 8, appName = "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_scan", "q2_agg", "q3_join", "q4_multijoin", "h1_lww")
    names.foreach { n =>
      println(s"\n=============== $n ===============")
      println(SparkEntry.queries(n)(spark, "/root/testdata/sf0.01")
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
