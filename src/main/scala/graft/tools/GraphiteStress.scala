package graft.tools

import graft.Graft
import graft.operators.GraphiteTarget
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wide-universe stress for the render façade: the declared g-queries
  * exercise COMPOSITION depth over a handful of series (the events
  * universe is bounded by event types), but a production graphite
  * backend serves MILLIONS of series — the shapes that must hold there
  * are different plan facts:
  *
  *   - tag/glob SELECTION must stay a codegen'd scan predicate (never
  *     an index lookup the engine doesn't have, never a shuffle);
  *   - per-series aggregates (highest/filterSeries/…) must produce one
  *     row per series and broadcast back, so cost tracks the DATA, not
  *     series-count × data;
  *   - grouped fan-in (groupByTags/groupByNode) must be ONE hash agg
  *     whose output is bounded by group count;
  *   - /metrics/find over the catalog must aggregate, never collect.
  *
  * Generates n series (default 1,000,000) × 24 hourly buckets of
  * deterministic xxhash64 values in the carbon tagged-metric name form
  * (`web.s<k>.cpu;dc=dc<k%4>;host=h<k%1000>`), evaluates one target per
  * shape, and prints wall seconds + output row counts. No asserts on
  * time (boxes differ) — the gate is the printed shape facts: row
  * counts bounded as designed, and every run completing at 24M rows in
  * seconds. Results land in BENCH_NOTES.
  *
  * Usage: runMain graft.tools.GraphiteStress [series] (default 1e6)
  */
object GraphiteStress {

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = Graft.session(cores = 32, appName = "graphite-stress")
    spark.sparkContext.setLogLevel("WARN")
    val ok = run(spark, n)
    spark.stop()
    if (!ok) sys.exit(1)
  }

  /** The envelope as a boolean (StressAll's unit): output row counts
    * exactly at their designed bounds — the facts that prove selection
    * stayed a scan predicate, per-series aggregates stayed bounded,
    * fan-in stayed one hash agg, and the catalog browse aggregated.
    * (Wall times print for the BENCH_NOTES record; boxes differ, so
    * the asserted facts are counts, not seconds.)
    */
  def run(spark: org.apache.spark.sql.SparkSession, n: Long): Boolean = {
    val base = 1704067200L // 2024-01-01 UTC
    val universe: DataFrame = spark.range(n).select(
        concat(lit("web.s"), col("id"), lit(".cpu"),
          lit(";dc=dc"), pmod(col("id"), lit(4)),
          lit(";host=h"), pmod(col("id"), lit(1000))).as("series"),
        col("id"))
      .crossJoin(spark.range(24).select(
        timestamp_seconds(lit(base) + col("id") * 3600L).as("bucket"),
        col("id").as("h")))
      .select(col("series"),
        col("bucket"),
        (pmod(xxhash64(col("id"), col("h")), lit(100000)).cast("double") /
          lit(1000.0)).as("value"))
      .repartition(64)

    println(s"[gstress] series=$n rows=${n * 24}")

    def runOne(label: String, target: String,
               boundNote: String): (String, Long) = {
      val (cnt, t) = time(GraphiteTarget.eval(target, universe, 3600).count())
      println(f"[gstress] $label%-22s ${t}%7.2f s  rows=$cnt%-10d $boundNote")
      (label, cnt)
    }

    val hosts = math.min(n, 1000L)
    val checks = Seq(
      // tag selection (1/4 of the universe) + per-series score + top-5:
      // the score agg is one row per selected series, TakeOrdered over
      // that bounded frame, semi-join back
      (runOne("highest(seriesByTag)",
        "highest(seriesByTag('dc=dc1'), 5, 'max')",
        "bound: 5 series x 24 buckets = 120"), 120L, 120L),
      // grouped fan-in across the full universe: ONE hash agg keyed
      // (host, bucket) -> hosts x 24 rows out of 24n in
      (runOne("groupByTags(sum)",
        "groupByTags(seriesByTag('name=~web\\.'), 'sum', 'host')",
        s"bound: $hosts hosts x 24 = ${hosts * 24}"), hosts * 24, hosts * 24),
      // per-series threshold filter: agg + broadcast semi-join, output
      // tracks the surviving data (avg>75 of uniform(0,100) over 24
      // points: rare — bounded by the dc2 slice, usually near zero)
      (runOne("filterSeries(avg)",
        "filterSeries(seriesByTag('dc=dc2'), 'average', '>', 75)",
        "bound: selected series' rows"), 0L, (n / 4 + 1) * 24),
      // glob selection staying a scan predicate (one series of n)
      (runOne("glob one-of-1M",
        s"movingAverage(web.s${math.max(0L, n - 1)}.cpu*, 4)",
        "bound: 24"), 24L, 24L),
      // positional list pairing at ~n/4-vs-n/4 series: the rank frames
      // are distributed sorted zipWithIndex (r12 — no single-task
      // row_number sort of the matched universe), the pair map
      // broadcasts, output = the first list's rows. The two dc
      // residues are chosen so BOTH lists have equal length at ANY n
      // (ids ≡ r (mod 4) count ⌊(n−r+3)/4⌋, one extra for r < n%4;
      // the operator raises on unequal lists by graphite contract, so
      // a fixed (0,1) pairing went spuriously red for odd n — r12
      // advice): residues (1,2) are equal unless n%4 == 2, where
      // (0,1) are.
      {
        val (da, db) = if (n % 4 == 2) (0, 1) else (1, 2)
        val dcCnt = (n - da + 3) / 4
        (runOne("divideSeriesLists",
          s"divideSeriesLists(seriesByTag('dc=dc$da'), seriesByTag('dc=dc$db'))",
          s"bound: $dcCnt x 24 = ${dcCnt * 24}"), dcCnt * 24, dcCnt * 24)
      })

    // /metrics/find over the full-name catalog: aggregate, never collect
    val names = universe.select("series").distinct()
    val (fc, ft) = time(GraphiteTarget.findNodes(names, "web.*").count())
    println(f"[gstress] findNodes(web.*)     ${ft}%7.2f s  rows=$fc%-10d bound: n distinct s<k> nodes")

    val ok = checks.forall { case ((label, cnt), lo, hi) =>
      val pass = cnt >= lo && cnt <= hi
      if (!pass) println(s"[gstress] $label OUT OF BOUNDS: $cnt not in [$lo, $hi]")
      pass
    } && fc == n
    if (fc != n) println(s"[gstress] findNodes OUT OF BOUNDS: $fc != $n")
    ok
  }
}
