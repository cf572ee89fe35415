package graft

import graft.operators.GraphiteTarget
import graft.operators.GraphiteTarget._
import org.apache.spark.sql.functions._

class GraphiteTargetSpec extends SparkTestBase {

  import spark.implicits._

  // ------------------------------------------------------------ parser

  test("parser: bare glob, call, nesting, braces, strings, numbers") {
    assert(parse("web.srv1.cpu") == Glob("web.srv1.cpu"))
    assert(parse("sumSeries(web.*.req)") ==
      Call("sumSeries", Seq(TargetArg(Glob("web.*.req")))))
    assert(parse("scale(sumSeries(events.{click,view}), 100)") ==
      Call("scale", Seq(
        TargetArg(Call("sumSeries", Seq(TargetArg(Glob("events.{click,view}"))))),
        NumArg(100))))
    assert(parse("summarize(x.y, \"1d\", 'sum')") ==
      Call("summarize", Seq(TargetArg(Glob("x.y")), StrArg("1d"), StrArg("sum"))))
    assert(parse("offset(a.b, -2.5)") ==
      Call("offset", Seq(TargetArg(Glob("a.b")), NumArg(-2.5))))
    // braces swallow their commas; argument commas still split
    assert(parse("group(a.{x,y}, b.*)") ==
      Call("group", Seq(TargetArg(Glob("a.{x,y}")), TargetArg(Glob("b.*")))))
  }

  test("parser: canonical text round-trips for naming") {
    val t = "movingAverage(averageSeries(events.*),6)"
    assert(text(parse(t)) == t)
    assert(text(parse("summarize(a.b, \"1d\", \"sum\")")) ==
      "summarize(a.b,\"1d\",\"sum\")")
  }

  test("parser: rejects malformed targets") {
    intercept[IllegalArgumentException](parse("sumSeries(a.b"))
    intercept[IllegalArgumentException](parse("a.{x,y"))
    intercept[IllegalArgumentException](parse("scale(a.b, 1) trailing"))
    intercept[IllegalArgumentException](parse("noSuchFn(a.b)") match {
      case c: Call => GraphiteTarget.evalNode(c, spark.emptyDataFrame, 60)
      case _ => fail("expected call")
    })
  }

  test("glob → regex: * is node-local, braces alternate, ? single char") {
    assert("web.srv1.cpu".matches(globToRegex("web.*.cpu")))
    assert(!"web.srv1.sub.cpu".matches(globToRegex("web.*.cpu")))
    assert("events.click".matches(globToRegex("events.{click,view}")))
    assert(!"events.error".matches(globToRegex("events.{click,view}")))
    assert("a1.b".matches(globToRegex("a?.b")))
    assert(!"a12.b".matches(globToRegex("a?.b")))
  }

  test("duration literals") {
    assert(parseDuration("90s") == 90L)
    assert(parseDuration("6h") == 21600L)
    assert(parseDuration("1d") == 86400L)
    assert(parseDuration("2w") == 1209600L)
    assert(parseDuration("-1d") == -86400L)
    assert(parseDuration("5min") == 300L)
    intercept[IllegalArgumentException](parseDuration("yesterday"))
  }

  // --------------------------------------------------------- evaluator

  private def ts(h: Int) =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(h * 3600L))

  /** two series, 4 hourly points each */
  private def uni = Seq(
    ("m.a", ts(0), 1.0), ("m.a", ts(1), 2.0), ("m.a", ts(2), 4.0), ("m.a", ts(3), 3.0),
    ("m.b", ts(0), 10.0), ("m.b", ts(1), 10.0), ("m.b", ts(2), 20.0), ("m.b", ts(3), 40.0)
  ).toDF("series", "bucket", "value")

  private def run(t: String): Seq[(String, Long, Option[Double])] =
    GraphiteTarget.eval(t, uni, 3600)
      .select(col("series"), col("bucket").cast("long"), col("value"))
      .as[(String, Long, Option[Double])].collect().toSeq
      .sortBy(r => (r._1, r._2))

  test("sumSeries + scale compose; result named by canonical text") {
    val got = run("scale(sumSeries(m.*), 2)")
    assert(got == Seq(
      ("sumSeries(m.*)", 0L, Some(22.0)), ("sumSeries(m.*)", 3600L, Some(24.0)),
      ("sumSeries(m.*)", 7200L, Some(48.0)), ("sumSeries(m.*)", 10800L, Some(86.0))))
  }

  test("averageSeries quantizes the ratio; movingAverage windows it") {
    val got = run("averageSeries(m.*)")
    assert(got.map(_._3.get) == Seq(5.5, 6.0, 12.0, 21.5))
    val ma = run("movingAverage(averageSeries(m.*), 2)")
    assert(ma.map(_._3.get) == Seq(5.5, 5.75, 9.0, 16.75))
  }

  test("derivative family: head null, counter reset null, perSecond rate") {
    val d = run("derivative(m.a)")
    assert(d == Seq(("m.a", 0L, None), ("m.a", 3600L, Some(1.0)),
      ("m.a", 7200L, Some(2.0)), ("m.a", 10800L, Some(-1.0))))
    val nn = run("nonNegativeDerivative(m.a)")
    assert(nn.map(_._3) == Seq(None, Some(1.0), Some(2.0), None))
    val ps = run("perSecond(m.b)")
    assert(ps.map(_._3) == Seq(None, Some(0.0), Some(10.0 / 3600).map(v =>
      math.round(v * 1e6) / 1e6), Some(20.0 / 3600).map(v =>
      math.round(v * 1e6) / 1e6)))
  }

  test("integral and keepLastValue") {
    assert(run("integral(m.a)").map(_._3.get) == Seq(1.0, 3.0, 7.0, 10.0))
    // keepLastValue forward-fills the nulls a derivative introduces
    val k = run("keepLastValue(nonNegativeDerivative(m.a))")
    assert(k.map(_._3) == Seq(None, Some(1.0), Some(2.0), Some(2.0)))
  }

  test("timeShift moves buckets; summarize re-buckets with the cf") {
    val sh = run("timeShift(m.a, \"1h\")")
    assert(sh.map(_._2) == Seq(3600L, 7200L, 10800L, 14400L))
    val sm = run("summarize(m.b, \"2h\", \"sum\")")
    assert(sm == Seq(("m.b", 0L, Some(20.0)), ("m.b", 7200L, Some(60.0))))
    val smMax = run("summarize(m.b, \"2h\", \"max\")")
    assert(smMax.map(_._3.get) == Seq(10.0, 40.0))
    val smLast = run("summarize(m.b, \"2h\", \"last\")")
    assert(smLast.map(_._3.get) == Seq(10.0, 40.0))
  }

  test("asPercent, divideSeries, diff-style composition") {
    val ap = run("asPercent(m.*)")
    val at0 = ap.filter(_._2 == 0L).map(r => r._1 -> r._3.get).toMap
    assert(at0("m.a") == math.round(1.0 / 11.0 * 100 * 1e6) / 1e6)
    assert(at0("m.b") == math.round(10.0 / 11.0 * 100 * 1e6) / 1e6)
    val dv = run("divideSeries(m.b, m.a)")
    assert(dv.map(_._3.get) == Seq(10.0, 5.0, 5.0, math.round(40.0 / 3.0 * 1e6) / 1e6))
  }

  test("diffSeries subtracts the rest's per-bucket sum; absent subtrahend is 0") {
    val d = run("diffSeries(m.b, m.a)")
    assert(d.map(_._3.get) == Seq(9.0, 8.0, 16.0, 37.0))
    // minuend-absent buckets stay absent: m.a has all 4 buckets here,
    // so diff against a filtered self leaves the asymmetric definition
    // visible via the sum-of-rest path
    val d2 = run("diffSeries(sumSeries(m.*), m.a, m.b)")
    assert(d2.map(_._3.get) == Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("regex include/exclude and threshold filters") {
    assert(run("exclude(m.*, \"a$\")").forall(_._1 == "m.b"))
    assert(run("grep(m.*, \"a$\")").forall(_._1 == "m.a"))
    // m.a: max 4, avg 2.5, last 3; m.b: max 40, avg 20, last 40
    assert(run("maximumAbove(m.*, 10)").forall(_._1 == "m.b"))
    assert(run("maximumBelow(m.*, 10)").forall(_._1 == "m.a"))
    assert(run("minimumAbove(m.*, 5)").forall(_._1 == "m.b"))
    assert(run("averageAbove(m.*, 10)").forall(_._1 == "m.b"))
    assert(run("averageBelow(m.*, 10)").forall(_._1 == "m.a"))
    assert(run("currentAbove(m.*, 10)").forall(_._1 == "m.b"))
    assert(run("currentBelow(m.*, 10)").forall(_._1 == "m.a"))
    assert(run("maximumAbove(m.*, 1000)").isEmpty)
  }

  test("moving window family: sum, max, min, median, stdev") {
    assert(run("movingSum(m.a, 2)").map(_._3.get) == Seq(1.0, 3.0, 6.0, 7.0))
    assert(run("movingMax(m.a, 2)").map(_._3.get) == Seq(1.0, 2.0, 4.0, 4.0))
    assert(run("movingMin(m.b, 2)").map(_._3.get) == Seq(10.0, 10.0, 10.0, 20.0))
    assert(run("movingMedian(m.a, 3)").map(_._3.get) == Seq(1.0, 1.5, 2.0, 3.0))
    // trailing population stddev from exact sums
    assert(run("stdev(m.b, 2)").map(_._3.get) == Seq(0.0, 0.0, 5.0, 10.0))
  }

  test("scalar additions: invert, squareRoot, logarithm, pow, null repair, clipping") {
    assert(run("invert(m.a)").map(_._3.get) ==
      Seq(1.0, 0.5, 0.25, math.round(1.0 / 3.0 * 1e6) / 1e6))
    assert(run("squareRoot(m.b)").map(_._3.get) ==
      Seq(math.sqrt(10), math.sqrt(10), math.sqrt(20), math.sqrt(40)))
    assert(run("logarithm(m.b)").map(_._3.get) ==
      Seq(1.0, 1.0, math.round(math.log10(20) * 1e6) / 1e6,
        math.round(math.log10(40) * 1e6) / 1e6))
    assert(run("pow(m.a, 2)").map(_._3.get) == Seq(1.0, 4.0, 16.0, 9.0))
    assert(run("removeBelowValue(m.b, 15)").map(_._3) ==
      Seq(None, None, Some(20.0), Some(40.0)))
    assert(run("transformNull(removeAboveValue(m.b, 15), -1)").map(_._3.get) ==
      Seq(10.0, 10.0, -1.0, -1.0))
  }

  test("percentile family flattens or nulls against the per-series quantile") {
    // sorted m.a = [1,2,3,4], p50 interpolates to 2.5
    assert(run("nPercentile(m.a, 50)").map(_._3.get) == Seq(2.5, 2.5, 2.5, 2.5))
    assert(run("removeAbovePercentile(m.a, 50)").map(_._3) ==
      Seq(Some(1.0), Some(2.0), None, None))
    assert(run("removeBelowPercentile(m.a, 50)").map(_._3) ==
      Seq(None, None, Some(4.0), Some(3.0)))
  }

  test("cross-series additions: range, stddev, product in argument order") {
    assert(run("rangeOfSeries(m.*)").map(_._3.get) == Seq(9.0, 8.0, 16.0, 37.0))
    assert(run("stddevSeries(m.*)").map(_._3.get) == Seq(4.5, 4.0, 8.0, 18.5))
    val mul = run("multiplySeries(m.a, m.b)")
    assert(mul.forall(_._1 == "multiplySeries(m.a,m.b)"))
    assert(mul.map(_._3.get) == Seq(10.0, 20.0, 80.0, 120.0))
  }

  test("consolidate: maxDataPoints coarsens by the smallest fitting factor with the set's cf") {
    import graft.operators.GraphiteTarget.consolidate
    val set = GraphiteTarget.evalNode(parse("m.a"), uni, 3600)
    // 4 hourly points over [0, 4h): cap 2 → factor 2 → 2h buckets, avg
    val avg = consolidate(set, 0L, 14400L, 2).df
      .orderBy("bucket").select("value").collect().map(_.getDouble(0)).toSeq
    assert(avg == Seq(1.5, 3.5))
    // consolidateBy('max') rides the set into the consolidation
    val mx = consolidate(
      GraphiteTarget.evalNode(parse("consolidateBy(m.a, 'max')"), uni, 3600),
      0L, 14400L, 2)
    assert(mx.step == 7200L)
    assert(mx.df.orderBy("bucket").select("value")
      .collect().map(_.getDouble(0)).toSeq == Seq(2.0, 4.0))
    // under the cap: untouched
    assert(consolidate(set, 0L, 14400L, 4).step == 3600L)
    // 'last' takes the latest fine bucket of each coarse bucket
    val lst = consolidate(
      GraphiteTarget.evalNode(parse("consolidateBy(m.a, 'last')"), uni, 3600),
      0L, 14400L, 2)
    assert(lst.df.orderBy("bucket").select("value")
      .collect().map(_.getDouble(0)).toSeq == Seq(2.0, 3.0))
  }

  test("findNodes: tree browse returns depth-matched nodes with leaf/branch flags") {
    import graft.operators.GraphiteTarget.findNodes
    val names = Seq("a.b", "a.b.c", "a.d", "x").toDF("series")
    def got(q: String) = findNodes(names, q).orderBy("node")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getBoolean(2))).toSeq
    // depth 1: 'a' is branch-only, 'x' leaf-only
    assert(got("*") == Seq(("a", false, true), ("x", true, false)))
    // depth 2: a.b is BOTH (a.b ends there, a.b.c continues), a.d leaf
    assert(got("a.*") == Seq(("a.b", true, true), ("a.d", true, false)))
    // glob narrows: brace selects one child
    assert(got("a.{d}") == Seq(("a.d", true, false)))
    // deeper than any series: empty
    assert(got("x.*").isEmpty)
  }

  test("alias family and selection") {
    assert(run("alias(sumSeries(m.*), \"total\")").forall(_._1 == "total"))
    assert(run("aliasByNode(m.a, 1)").forall(_._1 == "a"))
    // m.b has the higher average → highestAverage(…, 1) keeps only it
    assert(run("highestAverage(m.*, 1)").forall(_._1 == "m.b"))
    assert(run("highestMax(m.*, 1)").forall(_._1 == "m.b"))
    assert(run("highestCurrent(m.*, 1)").forall(_._1 == "m.b"))
    assert(run("lowestCurrent(m.*, 1)").forall(_._1 == "m.a"))
    assert(run("lowestAverage(m.*, 1)").forall(_._1 == "m.a"))
    assert(run("aliasByMetric(m.a)").forall(_._1 == "a"))
    // negative node index counts from the right (graphite contract)
    assert(run("aliasByNode(m.a, -1)").forall(_._1 == "a"))
    assert(run("aliasByNode(m.a, -2)").forall(_._1 == "m"))
    val g = run("group(m.a, m.b)")
    assert(g.map(_._1).distinct.sorted == Seq("m.a", "m.b"))
  }

  test("divideSeries/multiplySeries reject a multi-series operand") {
    // m.* evaluates to two series: graphite-web raises; the silent
    // alternative is a fanned-out bucket join with duplicated rows
    val e1 = intercept[Exception](run("divideSeries(m.a, m.*)"))
    assert(e1.getMessage.contains("exactly one series") ||
      Option(e1.getCause).exists(_.getMessage.contains("exactly one series")))
    val e2 = intercept[Exception](run("multiplySeries(m.*, m.a)"))
    assert(e2.getMessage.contains("exactly one series") ||
      Option(e2.getCause).exists(_.getMessage.contains("exactly one series")))
    // single-series operands still work
    assert(run("multiplySeries(m.a, m.b)").map(_._3.get) ==
      Seq(10.0, 20.0, 80.0, 120.0))
  }

  test("render: relative time specs and timeShift fetch-window widening") {
    assert(parseTimeSpec("now", 1000L) == 1000L)
    assert(parseTimeSpec("1311163200", 0L) == 1311163200L)
    assert(parseTimeSpec("-24h", 100000L) == 100000L - 86400L)
    assert(parseTimeSpec("now-7d", 1000000L) == 1000000L - 604800L)
    assert(parseTimeSpec("now+1h", 1000L) == 4600L)
    intercept[IllegalArgumentException](parseTimeSpec("yesterday", 0L))

    // window [1h, 3h): plain target sees buckets 1h,2h; the shifted
    // target must surface the 0h,1h data AT 1h,2h — data from BEFORE
    // `from` that a naive pre-clamp would have dropped
    val got = GraphiteTarget.render(
      Seq("alias(timeShift(m.a, \"1h\"), 'sh')", "m.a"),
      uni, 3600, from = "3600", until = "now", nowSec = 10800L,
      maxDataPoints = None)
      .select(col("series"), col("bucket").cast("long"), col("value"))
      .as[(String, Long, Option[Double])].collect().toSeq
      .sortBy(r => (r._1, r._2))
    assert(got == Seq(
      ("m.a", 3600L, Some(2.0)), ("m.a", 7200L, Some(4.0)),
      ("sh", 3600L, Some(1.0)), ("sh", 7200L, Some(2.0))))
    // negative shift pulls FUTURE data back into the window and the
    // shifted output stays clamped to [from, until)
    val neg = GraphiteTarget.render(
      Seq("timeShift(m.a, \"-1h\")"), uni, 3600,
      fromSec = 3600L, untilSec = 10800L)
      .select(col("bucket").cast("long"), col("value"))
      .as[(Long, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(neg == Seq((3600L, Some(4.0)), (7200L, Some(3.0))))
  }

  test("seriesByTag/aliasByTags: equality, missing-tag, anchored regex, negation") {
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def ts(i: Int) = java.sql.Timestamp.from(base.plusSeconds(i * 3600L))
    val u = Seq(
      ("web.req;dc=east;host=a", ts(0), 1.0),
      ("web.req;dc=west;host=b", ts(0), 2.0),
      ("db.req;dc=east", ts(0), 3.0), // no host tag
      ("web.err;dc=east;host=a", ts(0), 4.0)
    ).toDF("series", "bucket", "value")
    def names(t: String): Set[String] =
      GraphiteTarget.eval(t, u, 3600).select("series").distinct()
        .as[String].collect().toSet
    assert(names("seriesByTag('dc=east')") == Set(
      "web.req;dc=east;host=a", "db.req;dc=east", "web.err;dc=east;host=a"))
    // graphite semantics: 'tag=' (empty value) matches series WITHOUT the tag
    assert(names("seriesByTag('host=')") == Set("db.req;dc=east"))
    // anchored regex on the name pseudo-tag, conjoined with !=
    assert(names("seriesByTag('name=~web\\.', 'host!=b')") == Set(
      "web.req;dc=east;host=a", "web.err;dc=east;host=a"))
    // negated regex
    assert(names("seriesByTag('dc=east', 'name!=~web\\.req')") == Set(
      "db.req;dc=east", "web.err;dc=east;host=a"))
    // aliasByTags renames to the tag values joined by '.'
    assert(names("aliasByTags(seriesByTag('dc=east', 'host=a'), 'host', 'name')")
      == Set("a.web.req", "a.web.err"))
    intercept[IllegalArgumentException](
      GraphiteTarget.eval("seriesByTag('no-operator-here')", u, 3600))
  }

  test("holtWinters render targets: a constant series forecasts itself, zero aberration") {
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val u = (0 until 48).map(i => ("m.c",
      java.sql.Timestamp.from(base.plusSeconds(i * 3600L)), 7.5))
      .toDF("series", "bucket", "value")
    val f = GraphiteTarget.eval("holtWintersForecast(m.c)", u, 3600)
    assert(f.select("series").distinct().as[String].collect().toSeq == Seq("m.c"))
    assert(f.agg(min(col("value")), max(col("value")))
      .as[(Double, Double)].head() == ((7.5, 7.5)))
    val g = GraphiteTarget.eval(
      "group(holtWintersConfidenceBands(m.c), holtWintersAberration(m.c))",
      u, 3600)
    val byS = g.groupBy(col("series"))
      .agg(min(col("value")).as("mn"), max(col("value")).as("mx"),
        count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    assert(byS.keySet == Set("holtWintersConfidenceUpper(m.c)",
      "holtWintersConfidenceLower(m.c)", "holtWintersAberration(m.c)"))
    assert(byS("holtWintersAberration(m.c)") == ((0.0, 0.0, 48L)))
    assert(byS("holtWintersConfidenceUpper(m.c)") == ((7.5, 7.5, 48L)))
    assert(byS("holtWintersConfidenceLower(m.c)") == ((7.5, 7.5, 48L)))
  }
}
