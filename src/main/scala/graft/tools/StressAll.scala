package graft.tools

/** The one-command stress gate (round-11 verdict item 6): runs every
  * scale-stress envelope — hot-duplicate dedup (DupStress), hot-key /
  * flash-crowd skew (SkewStress), wide-universe render facade
  * (GraphiteStress), and optimistic-commit contention (ManifestStress)
  * — and ASSERTS each tool's recorded envelope instead of printing
  * numbers for a human to eyeball. A regression in any envelope (a
  * keep-first fold going window-shaped, a top-k rank going single-task,
  * a lost manifest batch) turns the command red; quoting BENCH_NOTES is
  * no longer the only record.
  *
  * Default sizes are CI-scale (minutes, not the 1M/4M campaign sizes
  * whose absolute numbers BENCH_NOTES records); the envelopes asserted
  * are RATIOS and SHAPE BOUNDS, which hold at any size.
  *
  * Usage: runMain graft.tools.StressAll [rows]   (default 200,000)
  * Exits nonzero on any failed envelope.
  */
object StressAll {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val spark = graft.Graft.session(cores = 32, appName = "graft-stressall")
    spark.sparkContext.setLogLevel("WARN")

    val suites: Seq[(String, () => Boolean)] = Seq(
      ("DupStress", () => DupStress.run(spark, n)),
      ("SkewStress", () => SkewStress.run(spark, n)),
      ("GraphiteStress", () => GraphiteStress.run(spark, n)),
      ("ManifestStress", () => ManifestStress.run(spark, writers = 4,
        batches = 3)))

    val results = suites.map { case (name, body) =>
      val ok = try body() catch {
        case e: Throwable =>
          println(s"[stressall] $name threw: ${e.getMessage}")
          false
      }
      println(s"[stressall] $name: " + (if (ok) "PASS" else "FAIL"))
      (name, ok)
    }
    val failed = results.filterNot(_._2).map(_._1)
    println(if (failed.isEmpty) "[stressall] ALL ENVELOPES GREEN"
      else s"[stressall] FAILED: ${failed.mkString(", ")}")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
