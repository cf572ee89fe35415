package graft

import graft.operators.GraphiteTarget
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-11 facade closure: the render-context tail (smartSummarize
  * from/alignTo alignment, relative timeSlice, useSeriesAbove and
  * applyByNode re-probing) plus the determinism fixes to the
  * 'last'/'current' fold (graphite's safeLast, series-name
  * tie-breaking) and weightedAverage's one-series-per-key contract.
  * Exact expected values over hand-computable universes.
  */
class GraphiteContextSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(h: Int) =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(h * 3600L))

  private def uni = Seq(
    ("m.a", ts(0), 1.0), ("m.a", ts(1), 2.0), ("m.a", ts(2), 4.0), ("m.a", ts(3), 3.0),
    ("m.b", ts(0), 10.0), ("m.b", ts(1), 10.0), ("m.b", ts(2), 20.0), ("m.b", ts(3), 40.0)
  ).toDF("series", "bucket", "value")

  private def web = Seq(
    ("web.s1.req", ts(0), 1.0), ("web.s1.req", ts(1), 2.0),
    ("web.s2.req", ts(0), 3.0), ("web.s2.req", ts(1), 5.0),
    ("web.s1.err", ts(0), 1.0), ("web.s1.err", ts(1), 1.0)
  ).toDF("series", "bucket", "value")

  /** trailing nulls exercise the safeLast semantics */
  private def nulled = Seq(
    ("m.a", ts(0), Some(1.0)), ("m.a", ts(1), Some(2.0)), ("m.a", ts(2), None),
    ("m.b", ts(0), Some(5.0)), ("m.b", ts(1), None), ("m.b", ts(2), None)
  ).toDF("series", "bucket", "value")

  private def run(t: String, u: DataFrame = uni): Seq[(String, Long, Option[Double])] =
    GraphiteTarget.eval(t, u, 3600)
      .select(col("series"), col("bucket").cast("long"), col("value"))
      .as[(String, Long, Option[Double])].collect().toSeq
      .sortBy(r => (r._1, r._2))

  private def renderRows(targets: Seq[String], u: DataFrame, from: Long,
                         until: Long): Seq[(String, Long, Option[Double])] =
    GraphiteTarget.render(targets, u, 3600, from, until)
      .select(col("series"), col("bucket").cast("long"), col("value"))
      .as[(String, Long, Option[Double])].collect().toSeq
      .sortBy(r => (r._1, r._2))

  // ---------------------------------------------------- safeLast fixes

  test("'last'/'current' folds skip trailing nulls (graphite's safeLast)") {
    // aggregateLine flattens each series to its latest NON-null value
    val line = run("aggregateLine(m.*, 'current')", nulled)
    assert(line.filter(_._1 == "m.a").map(_._3) ==
      Seq(Some(2.0), Some(2.0), Some(2.0)))
    assert(line.filter(_._1 == "m.b").map(_._3) ==
      Seq(Some(5.0), Some(5.0), Some(5.0)))
    // currentAbove sees 5.0 for m.b (not the trailing null)
    assert(run("currentAbove(m.*, 3)", nulled).map(_._1).distinct == Seq("m.b"))
  }

  test("per-bucket 'last' is deterministic: series name breaks the tie") {
    // aggregate(..., 'last') groups by BUCKET — every row ties on the
    // bucket, so the fold must pick by the series tie-break, the
    // largest name whose value is non-null
    val got = run("aggregate(m.*, 'last')", nulled)
    assert(got.map(_._3) == Seq(Some(5.0), Some(2.0), None))
  }

  // ------------------------------------------- weightedAverage contract

  test("weightedAverage raises when a node key matches several series") {
    // node 0 is 'web' for every series — three series collapse onto
    // one key, which would silently inflate the join; the plan-level
    // guard must raise instead
    val bad = GraphiteTarget.eval("weightedAverage(web.*.*, web.*.*, 0)",
      web, 3600)
    val e = intercept[Exception](bad.collect())
    assert(e.getMessage.contains("more than one series") ||
      Option(e.getCause).exists(_.getMessage.contains("more than one series")))
    // the one-per-key case still works: Σ(v·w)/Σ(w) self-weighted
    val ok = run("weightedAverage(web.*.req, web.*.req, 1)", web)
    assert(ok.map(_._3.get) == Seq(2.5, 4.142857))
  }

  // ------------------------------------------------------ smartSummarize

  test("smartSummarize aligns buckets to the render window's from") {
    // from = 1.5h: buckets fall on the 1.5h + k·2h grid, NOT the epoch
    // grid summarize would use
    val got = renderRows(Seq("smartSummarize(m.a, '2h', 'sum')"),
      uni, from = 5400L, until = 14400L)
    assert(got == Seq(("m.a", 5400L, Some(7.0))))
    // alignTo 'hours' truncates the origin to 1h → the epoch-hour grid
    val aligned = renderRows(
      Seq("smartSummarize(m.a, '2h', 'sum', 'hours')"),
      uni, from = 5400L, until = 14400L)
    assert(aligned == Seq(("m.a", 3600L, Some(4.0)), ("m.a", 10800L, Some(3.0))))
    // outside a render context the function fails loudly at build time
    val e = intercept[IllegalArgumentException](
      run("smartSummarize(m.a, '2h')"))
    assert(e.getMessage.contains("render request context"))
  }

  test("truncateEpoch lands on UTC calendar boundaries") {
    // 2024-01-10 13:47:05 UTC
    val t = 1704894425L
    assert(GraphiteTarget.truncateEpoch(t, "minutes") == 1704894420L)
    assert(GraphiteTarget.truncateEpoch(t, "1h") == 1704891600L)
    assert(GraphiteTarget.truncateEpoch(t, "days") == 1704844800L)
    // 2024-01-10 is a Wednesday; the week starts Monday 2024-01-08
    assert(GraphiteTarget.truncateEpoch(t, "weeks") == 1704672000L)
    assert(GraphiteTarget.truncateEpoch(t, "months") == 1704067200L)
    assert(GraphiteTarget.truncateEpoch(t, "1y") == 1704067200L)
    intercept[IllegalArgumentException](
      GraphiteTarget.truncateEpoch(t, "fortnights"))
  }

  // ------------------------------------------------- relative timeSlice

  test("timeSlice resolves relative specs against the render now") {
    // epoch render anchors now at untilSec = 4h: '-2h'..'now' keeps
    // buckets in [2h, 4h], nulls the rest
    val got = renderRows(Seq("timeSlice(m.a, '-2h', 'now')"),
      uni, from = 0L, until = 14400L)
    assert(got.map(_._3) == Seq(None, None, Some(4.0), Some(3.0)))
    // a bare eval has no now — string specs must fail loudly
    val e = intercept[IllegalArgumentException](
      run("timeSlice(m.a, '-2h', 'now')"))
    assert(e.getMessage.contains("render request context"))
    // epoch bounds still work without a context
    assert(run("timeSlice(m.a, 3600, 7200)").map(_._3) ==
      Seq(None, Some(2.0), Some(4.0), None))
  }

  // --------------------------------------------------- useSeriesAbove

  test("useSeriesAbove re-probes the universe with replaced names") {
    // web.s1.req (max 2) and web.s2.req (max 5) pass the >1.5 gate →
    // candidate names web.s1.err and web.s2.err; only web.s1.err
    // exists, so the probe returns exactly its rows (graphite's
    // removeEmptySeries tail falls out of the semi-join)
    val got = run("useSeriesAbove(web.*.req, 1.5, 'req', 'err')", web)
    assert(got == Seq(
      ("web.s1.err", 0L, Some(1.0)), ("web.s1.err", 3600L, Some(1.0))))
    // nothing passes the gate → empty
    assert(run("useSeriesAbove(web.*.req, 99, 'req', 'err')", web).isEmpty)
    // the store-side fetch plan covers the replaced globs
    val leaves = GraphiteTarget.globLeaves(
      GraphiteTarget.parse("useSeriesAbove(web.*.req, 1.5, 'req', 'err')"))
    assert(leaves.toSet == Set("web.*.req", "web.*.err"))
  }

  // ----------------------------------------------------- applyByNode

  test("applyByNode evaluates the template once per node prefix") {
    val got = run("applyByNode(web.*.*, 1, 'sumSeries(%.*)', '%.total')", web)
    assert(got == Seq(
      ("web.s1.total", 0L, Some(2.0)), ("web.s1.total", 3600L, Some(3.0)),
      ("web.s2.total", 0L, Some(3.0)), ("web.s2.total", 3600L, Some(5.0))))
    // without newName the inner call text names the outputs
    val named = run("applyByNode(web.*.req, 1, 'sumSeries(%.req)')", web)
    assert(named.map(_._1).distinct.sorted ==
      Seq("sumSeries(web.s1.req)", "sumSeries(web.s2.req)"))
    // an empty match is an empty frame, not an error
    assert(run("applyByNode(web.nosuch.*, 1, 'sumSeries(%.*)')", web).isEmpty)
    // the fetch plan includes the prefix-widened template leaves
    val leaves = GraphiteTarget.globLeaves(
      GraphiteTarget.parse("applyByNode(web.*.*, 1, 'sumSeries(%.cpu)')"))
    assert(leaves.toSet == Set("web.*.*", "web.*.cpu"))
  }

  // ------------------------------------------- r12 context-tail fixes

  test("time under render is data-independent and anchors at from") {
    // a universe with a HOLE at hour 1 and a from that is NOT a
    // multiple of the tick step: graphite's timeFunction steps from
    // `from` regardless of the data, so the gap cannot drop a tick and
    // the grid is from-anchored (r11 advice: the spine-filtered form
    // dropped ticks and epoch-anchored)
    val holey = Seq(("m.a", ts(0), 1.0), ("m.a", ts(2), 4.0), ("m.a", ts(3), 3.0))
      .toDF("series", "bucket", "value")
    val got = renderRows(Seq("time('tick', 7200)"), holey,
      from = 3600L, until = 4 * 3600L)
    assert(got == Seq(
      ("tick", 3600L, Some(3600.0)), ("tick", 10800L, Some(10800.0))))
    // the bare-eval fallback keeps the documented spine behavior
    val bare = run("time('tick', 7200)", holey)
    assert(bare == Seq(("tick", 0L, Some(0.0)), ("tick", 7200L, Some(7200.0))))
  }

  test("summarize xFilesFactor denominator clamps to the render window") {
    // window = [0h, 6h) with a 4h interval: the second coarse bucket
    // holds only 2 of its 4 slots inside the window. m.a is dense over
    // the window (6 points) — graphite's nonNull/len(values) sees 2/2
    // there, so xff=0.75 keeps BOTH buckets; the full-capacity
    // denominator (the r11 advice finding) would null the boundary
    // bucket at 2/4
    val dense = (0 until 6).map(h => ("m.a", ts(h), 1.0))
      .toDF("series", "bucket", "value")
    val got = renderRows(
      Seq("summarize(setXFilesFactor(m.a, 0.75), '4h', 'sum')"), dense,
      from = 0L, until = 6 * 3600L)
    assert(got.map(r => (r._2, r._3)) ==
      Seq((0L, Some(4.0)), (4 * 3600L, Some(2.0))))
    // a genuinely sparse boundary bucket still nulls: 1 of its 2
    // in-window slots misses the 0.75 gate
    val sparse = dense.where(col("bucket") =!= ts(5))
    val got2 = renderRows(
      Seq("summarize(setXFilesFactor(m.a, 0.75), '4h', 'sum')"), sparse,
      from = 0L, until = 6 * 3600L)
    assert(got2.map(r => (r._2, r._3)) ==
      Seq((0L, Some(4.0)), (4 * 3600L, None)))
  }

  test("multiplySeries poisons missing-or-null factor buckets (safeMul)") {
    // graphite multiplies with safeMul — None POISONS (unlike the
    // None-skipping safeSum family): a bucket where any factor is
    // null OR has no row at all yields a present null row, never a
    // dropped bucket and never a one-sided product (r12 advice sweep;
    // the old inner-join fold dropped bucket 1h entirely)
    val sparse = Seq(
      ("m.a", ts(0), Some(2.0)), ("m.a", ts(1), Some(3.0)),
      ("m.a", ts(2), None),
      ("m.b", ts(0), Some(5.0)), ("m.b", ts(2), Some(7.0))
    ).toDF("series", "bucket", "value")
    val got = run("multiplySeries(m.a, m.b)", sparse)
    assert(got.map(r => (r._2, r._3)) ==
      Seq((0L, Some(10.0)), (3600L, None), (7200L, None)))
    // aggregateSeriesLists' named folds stay None-SKIPPING (safeSum):
    // the one-sided bucket folds the present side alone
    val agg = run("aggregateSeriesLists(m.a, m.b, 'sum')", sparse)
    assert(agg.map(r => (r._2, r._3)) ==
      Seq((0L, Some(7.0)), (3600L, Some(3.0)), (7200L, Some(7.0))))
  }

  test("reduceSeries asPercent emits null where a matcher side is missing") {
    val deep = Seq(
      ("p.h0", ts(0), 50.0), ("p.h0", ts(1), 30.0),
      ("p.h1", ts(0), 100.0)
    ).toDF("series", "bucket", "value")
    val got = run("reduceSeries(mapSeries(p.*, 0), 'asPercent', 1, 'h0', 'h1')",
      deep)
    assert(got == Seq(
      ("p.reduce.asPercent", 0L, Some(50.0)),
      ("p.reduce.asPercent", 3600L, None)))
  }

  test("timeShift evaluates its subtree under the SHIFTED context") {
    // graphite-web shifts the inner requestContext: under
    // timeShift('4h') the inner summarize's xff denominators clamp to
    // [from−4h, until−4h) — the window the data was FETCHED on — not
    // the request window (r12 advice). Data: dense [0h, 6h); request
    // [4h, 10h); shift +4h ⇒ inner window [0h, 6h). Inner coarse
    // buckets: 0h (4/4 slots, sum 4) and 4h (2 of 2 IN-WINDOW slots,
    // sum 2 — kept at xff .75 because the shifted window clamps the
    // denominator to 2). Shifted out: (4h, 4.0), (8h, 2.0).
    val dense = (0 until 6).map(h => ("m.a", ts(h), 1.0))
      .toDF("series", "bucket", "value")
    val got = renderRows(
      Seq("timeShift(summarize(setXFilesFactor(m.a, 0.75), '4h', 'sum'), '4h')"),
      dense, from = 4 * 3600L, until = 10 * 3600L)
    assert(got.map(r => (r._2, r._3)) ==
      Seq((4 * 3600L, Some(4.0)), (8 * 3600L, Some(2.0))))
    // the genuinely sparse shifted boundary still nulls under the
    // shifted denominator (1 of 2 in-window slots)
    val sparse = dense.where(col("bucket") =!= ts(5))
    val got2 = renderRows(
      Seq("timeShift(summarize(setXFilesFactor(m.a, 0.75), '4h', 'sum'), '4h')"),
      sparse, from = 4 * 3600L, until = 10 * 3600L)
    assert(got2.map(r => (r._2, r._3)) ==
      Seq((4 * 3600L, Some(4.0)), (8 * 3600L, None)))
  }

  test("timeShift(time(...)) keeps the leading ticks") {
    // the generated grid anchors on the SHIFTED window [0h, 4h) and
    // shifts forward — all four ticks land in the request window
    // [2h, 6h). The unshifted-ctx form generated on [2h, 6h), shifted
    // to [4h, 8h) and re-clamped, silently dropping the ticks in
    // [2h, 4h) (r12 advice).
    val got = renderRows(Seq("timeShift(time('tick'), '2h')"), uni,
      from = 2 * 3600L, until = 6 * 3600L)
    assert(got == (2 to 5).map(h =>
      ("tick", h * 3600L, Some((h - 2) * 3600.0))))
  }
}
