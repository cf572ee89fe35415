package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":…,"value":…,"unit":"sec","queries":{…},"sf":…}.
  *
  * Each query is executed with the noop sink so the full plan
  * (including result production) runs without collect-to-driver
  * overhead; a warm-up query first absorbs JVM/codegen start-up cost
  * so per-query numbers measure the plan, not the JIT.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = Graft.session(cores = cpus, appName = "graft-bench")
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up: a join+agg exercises scan, shuffle, codegen paths
    run("q3_join")

    val names = SparkEntry.queries.keys.toSeq.sorted
    val first = names.map(n => n -> run(n))
    // the 5 slowest get 2 more runs and report their MEDIAN, so
    // round-over-round regressions on the expensive queries are
    // attributable above single-run machine noise
    val slow = first.filter(_._2 >= 0).sortBy(-_._2).take(5).map(_._1).toSet
    val results = first.map { case (n, t0) =>
      if (!slow(n) || t0 < 0) n -> t0
      else n -> Seq(t0, run(n), run(n)).sorted.apply(1)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val p50 = slow.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"p50of3":$p50,"sf":"$sfDir"}""")
    spark.stop()
  }
}
