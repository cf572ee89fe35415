package graft

import graft.operators.GraphiteTarget
import org.apache.spark.sql.functions._

/** r14 universe-sharing internals: the static fetch counter (now aware
  * of spine/annotation fetchers and the ctx'd grid forms), the name-
  * predicate collector that pre-filters the shared materialization,
  * the shift-range bound behind the render path's widened clamp, and
  * end-to-end equality of the shared render/eval paths against their
  * unshared single-target forms.
  */
class GraphiteShareSpec extends SparkTestBase {
  private def p(t: String) = GraphiteTarget.parse(t)

  test("universeFetches: globs, two-pass, spine and ctx grids") {
    assert(GraphiteTarget.universeFetches(
      p("sumSeries(events.{click,view})"), ctxMode = true) === 1)
    // a two-pass fn consumes its subtree twice
    assert(GraphiteTarget.universeFetches(
      p("maximumAbove(events.click, 10)"), ctxMode = false) === 2)
    // ctx grids are spark.range leaves; bare grids read the bucket spine
    assert(GraphiteTarget.universeFetches(
      p("time('tick', 7200)"), ctxMode = true) === 0)
    assert(GraphiteTarget.universeFetches(
      p("time('tick', 7200)"), ctxMode = false) === 1)
    // aliasQuery reads its input AND the lasts lookup
    assert(GraphiteTarget.universeFetches(
      p("aliasQuery(events.click, 'click', 'view', 'c %d')"),
      ctxMode = true) === 2)
    // fallbackSeries probes + re-consumes its primary on top of the
    // constantLine spine read
    assert(GraphiteTarget.universeFetches(
      p("fallbackSeries(events.nosuch, constantLine(42))"),
      ctxMode = false) === 3)
  }

  test("namePreds: bounded trees collect, spine/tagless trees refuse") {
    assert(GraphiteTarget.namePreds(
      p("maximumAbove(events.click, 10)"), ctxMode = false)
      .exists(_.size === 1))
    // constantLine's spine reads every series' buckets — no predicate
    // may prune the shared universe
    assert(GraphiteTarget.namePreds(
      p("fallbackSeries(events.nosuch, constantLine(42))"),
      ctxMode = false).isEmpty)
    // ctx'd time() fetches nothing, so the glob pred still collects
    assert(GraphiteTarget.namePreds(
      p("group(events.click, time('tick', 7200))"), ctxMode = true)
      .exists(_.size === 1))
    assert(GraphiteTarget.namePreds(
      p("group(events.click, time('tick', 7200))"), ctxMode = false).isEmpty)
    // aliasQuery: wildcard-free input glob → input + rewritten-name
    // predicates; wildcarded input → refuse (regex rewrite of a
    // pattern is unsound across wildcard spans)
    assert(GraphiteTarget.namePreds(
      p("aliasQuery(events.click, 'click', 'view', 'c %d')"),
      ctxMode = true).exists(_.size === 2))
    assert(GraphiteTarget.namePreds(
      p("aliasQuery(events.*, 'click', 'view', 'c %d')"),
      ctxMode = true).isEmpty)
    // tagged selection is a pushable predicate too
    assert(GraphiteTarget.namePreds(
      p("seriesByTag('dc=dc0')"), ctxMode = false).exists(_.size === 1))
  }

  test("shiftRange bounds the union fetch window statically") {
    assert(GraphiteTarget.shiftRange(p("events.click")) === ((0L, 0L)))
    assert(GraphiteTarget.shiftRange(
      p("timeShift(events.click, '1d')")) === ((-86400L, -86400L)))
    assert(GraphiteTarget.shiftRange(
      p("group(events.click, timeShift(events.click, '1d'))"))
      === ((-86400L, 0L)))
    // timeStack '1d' 0..7: unsigned duration means the past, copies
    // fetch [from + i*(-86400), ...) for i in 0..6
    assert(GraphiteTarget.shiftRange(
      p("timeStack(events.click, '1d', 0, 7)")) === ((-518400L, 0L)))
    // nested shifts compose
    assert(GraphiteTarget.shiftRange(
      p("timeShift(timeShift(events.click, '1d'), '1h')"))
      === ((-90000L, -90000L)))
  }

  test("shared ctx'd render equals per-target unshared renders") {
    import spark.implicits._
    val base = 1704067200L // 2024-01-01 00:00 UTC
    val rows = (0 until 96).flatMap { h =>
      Seq(("events.click", base + h * 3600L, h.toDouble),
        ("events.view", base + h * 3600L, (h * 2).toDouble))
    }
    val universe = rows.toDF("series", "ts", "value")
      .select(col("series"), timestamp_seconds(col("ts")).as("bucket"),
        col("value"))
    val targets = Seq("sumSeries(events.{click,view})",
      "alias(timeShift(sumSeries(events.{click,view}), '1d'), 'shifted')")
    val from = base + 2 * 86400L
    val until = base + 4 * 86400L
    def collectSorted(ts: Seq[String]) =
      GraphiteTarget.render(ts, universe, 3600L, from, until, None)
        .select(col("series"), col("bucket").cast("long"), col("value"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    // one target at a time: a single sumSeries fetch never shares, so
    // this is the r13 (per-leaf clamp pushdown) execution path
    val unshared = collectSorted(Seq(targets.head)) ++
      collectSorted(Seq(targets(1)))
    val shared = collectSorted(targets)
    assert(shared.sortBy(t => (t._1, t._2)) ===
      unshared.sortBy(t => (t._1, t._2)))
    assert(shared.nonEmpty)
  }

  test("name-pruned shared eval equals the unshared evaluation") {
    import spark.implicits._
    val base = 1704067200L
    val rows = (0 until 48).flatMap { h =>
      Seq(("events.click", base + h * 3600L, h.toDouble),
        ("events.view", base + h * 3600L, 1000.0 + h),
        ("other.series", base + h * 3600L, -1.0))
    }
    val universe = rows.toDF("series", "ts", "value")
      .select(col("series"), timestamp_seconds(col("ts")).as("bucket"),
        col("value"))
    // two-pass fn over a selective glob: shares (fetches=2) and pushes
    // the name predicate into the materialized universe
    val out = GraphiteTarget.eval("maximumAbove(events.click, -1)",
        universe, 3600L)
      .select(col("series"), col("value")).collect()
    assert(out.forall(_.getString(0) == "events.click"))
    assert(out.length === 48)
  }
}
