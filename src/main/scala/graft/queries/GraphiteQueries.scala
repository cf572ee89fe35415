package graft.queries

import graft.Tables
import graft.core.Time
import graft.operators.{Dedup, GraphiteTarget}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G1–G5: the Graphite render-`target` façade (SURVEY §2 / round-7
  * verdict item 4) as declared queries — each parses a COMPOSED target
  * string with [[GraphiteTarget]] and must match a hand-built DuckDB
  * plan of the same composition. This is the reference's actual
  * ecosystem surface: hoard stores what graphite-web renders
  * (`/root/reference/README.md:11-16`), so a render-target string is
  * the query language a reference user would bring.
  *
  * Universe: the hourly last-write-wins series per event_type
  * (`events.<type>`, the h-family's series model), which keeps the
  * oracle CTE identical to the long-standing h17/h18 pattern.
  */
object GraphiteQueries {

  /** Hourly lww universe in [[GraphiteTarget]]'s frame shape. */
  private def universe(s: SparkSession, dir: String): DataFrame =
    Dedup.lastWriteWins(Tables.load(s, dir, "events"),
      Seq(col("event_type"), Time.align(col("ts"), 3600).as("bucket")),
      col("event_id"), Seq("value" -> col("value")))
      .select(concat(lit("events."), col("event_type")).as("series"),
        col("bucket"), col("value"))

  private def render(s: SparkSession, dir: String, target: String): DataFrame =
    GraphiteTarget.eval(target, universe(s, dir), step = 3600)
      .select(col("series"), col("bucket").cast("string").as("bucket"),
        round(col("value"), 6).as("value"))
      .orderBy("series", "bucket")

  /** Tagged universe (carbon tagged-metric form): the same hourly lww
    * series split by two deterministic tags derived from user_id —
    * `events.<type>;dc=dc<id%2>;host=h<id%3>` — so tag selection and
    * tag aliasing do real work (6 series per event_type) while the
    * oracle mirrors the tag values from the generating columns.
    */
  private def taggedUniverse(s: SparkSession, dir: String): DataFrame =
    // the tagged name is built BEFORE the lww agg and is itself the
    // grouping key: seriesByTag's predicate then references a grouping
    // column, so Catalyst pushes it BELOW the aggregate — tag selection
    // prunes before the agg shuffle, not after (the thing that matters
    // when the universe is 100 TB of raw events)
    Dedup.lastWriteWins(
      Tables.load(s, dir, "events").select(
        concat(lit("events."), col("event_type"),
          lit(";dc=dc"), pmod(col("user_id"), lit(2)),
          lit(";host=h"), pmod(col("user_id"), lit(3))).as("series"),
        col("ts"), col("event_id"), col("value")),
      Seq(col("series"), Time.align(col("ts"), 3600).as("bucket")),
      col("event_id"), Seq("value" -> col("value")))
      .select(col("series"), col("bucket"), col("value"))

  private def renderTagged(s: SparkSession, dir: String,
                           target: String): DataFrame =
    GraphiteTarget.eval(target, taggedUniverse(s, dir), step = 3600)
      .select(col("series"), col("bucket").cast("string").as("bucket"),
        round(col("value"), 6).as("value"))
      .orderBy("series", "bucket")

  /** Three-level names (`events.<type>.h<user_id%3>`) for the
    * node-prefix macro family (applyByNode) — same hourly lww fold,
    * one more name level so per-prefix evaluation does real work.
    */
  private def deepUniverse(s: SparkSession, dir: String): DataFrame =
    Dedup.lastWriteWins(
      Tables.load(s, dir, "events").select(
        concat(lit("events."), col("event_type"),
          lit(".h"), pmod(col("user_id"), lit(3))).as("series"),
        col("ts"), col("event_id"), col("value")),
      Seq(col("series"), Time.align(col("ts"), 3600).as("bucket")),
      col("event_id"), Seq("value" -> col("value")))
      .select(col("series"), col("bucket"), col("value"))

  /** The DuckDB-side tagged-universe CTE (g18/g19). NOTE: no line may
    * start with `||` — the oracle strings interpolate this text and
    * re-apply stripMargin, which would eat the first pipe.
    */
  private val TU =
    """tu AS (
      |  SELECT concat('events.', event_type,
      |           ';dc=dc', user_id % 2,
      |           ';host=h', user_id % 3) AS series,
      |         event_type, user_id % 2 AS dc, user_id % 3 AS host,
      |         date_trunc('hour', ts) AS bucket,
      |         arg_max(value, event_id) AS value
      |  FROM events GROUP BY 1, 2, 3, 4, 5)""".stripMargin

  /** The DuckDB-side universe CTE (h17/h18's lww pattern). */
  private val U =
    """u AS (
      |  SELECT 'events.' || event_type AS series,
      |         date_trunc('hour', ts) AS bucket,
      |         arg_max(value, event_id) AS value
      |  FROM events GROUP BY 1, 2)""".stripMargin

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // brace glob + cross-series sum + scalar arg
    "g1_target" -> ((s, dir) =>
      render(s, dir, "scale(sumSeries(events.{click,view}), 100)")),

    // star glob + ratio agg + windowed smoothing, 3 levels deep
    "g2_target" -> ((s, dir) =>
      render(s, dir, "movingAverage(averageSeries(events.*), 6)")),

    // per-bucket cross-series normalization
    "g3_target" -> ((s, dir) => render(s, dir, "asPercent(events.*)")),

    // agg → counter derivative → re-bucketing, with string args
    "g4_target" -> ((s, dir) =>
      render(s, dir,
        "summarize(nonNegativeDerivative(sumSeries(events.*)), \"1d\", \"sum\")")),

    // series selection + time shift + renaming
    "g5_target" -> ((s, dir) =>
      render(s, dir, "aliasByNode(timeShift(highestAverage(events.*, 2), \"1d\"), 1)")),

    // threshold filter + regex exclusion (selection family)
    "g6_target" -> ((s, dir) =>
      render(s, dir, "exclude(averageAbove(events.*, 50), \"click\")")),

    // cross-series arithmetic: total minus named components
    "g7_target" -> ((s, dir) =>
      render(s, dir, "diffSeries(sumSeries(events.*), events.click, events.view)")),

    // value clipping + null repair + trailing decimal sum
    "g8_target" -> ((s, dir) =>
      render(s, dir,
        "movingSum(transformNull(removeAboveValue(events.*, 80), 0), 4)")),

    // per-series percentile nulling + inverse selection
    "g9_target" -> ((s, dir) =>
      render(s, dir, "lowestAverage(removeBelowPercentile(events.*, 50), 2)")),

    // cross-series spread + exact scalar transform
    "g10_target" -> ((s, dir) =>
      render(s, dir, "squareRoot(rangeOfSeries(events.*))")),

    // per-bucket series product in pinned argument order
    "g11_target" -> ((s, dir) =>
      render(s, dir, "multiplySeries(invert(events.click), events.view)")),

    // trailing volatility + current-value selection + metric rename
    "g12_target" -> ((s, dir) =>
      render(s, dir, "aliasByMetric(highestCurrent(stdev(events.*, 6), 1))")),

    // cross-series dispersion flattened to its 90th percentile
    "g13_target" -> ((s, dir) =>
      render(s, dir, "nPercentile(stddevSeries(events.*), 90)")),

    // render-time consolidation: a January of hourly sums (744 points)
    // capped at 100 data points → factor-8 coarsening applied with the
    // consolidateBy cf where the data lives (maxDataPoints, THE scale
    // valve of the read path — a 10-year range leaves the cluster as
    // one screen of points)
    "g14_target" -> ((s, dir) => {
      val node = GraphiteTarget.parse("consolidateBy(sumSeries(events.*), 'max')")
      val set = GraphiteTarget.evalNode(node, universe(s, dir), step = 3600)
      val c = GraphiteTarget.consolidate(set,
        1704067200L, 1706745600L, maxPoints = 100) // 2024-01 .. 02-01
      c.df.select(col("series"), col("bucket").cast("long").as("bucket_s"),
          round(col("value"), 6).as("value"))
        .orderBy("series", "bucket_s")
    }),

    // /metrics/find tree browse: one branch probe + one brace-glob leaf
    // probe over the series catalog — the API a graphite-web tree
    // walks; output bounded by matched nodes, never the catalog
    "g15_find" -> ((s, dir) => {
      val names = universe(s, dir).select("series").distinct()
      GraphiteTarget.findNodes(names, "*")
        .unionByName(
          GraphiteTarget.findNodes(names, "events.{click,view,error}"))
        .orderBy("node")
    }),

    // the full /render call: two targets over a clamped two-week
    // window, both consolidated to <=50 points (336 hourly -> factor-7
    // average fold) — one dashboard panel, one frame
    "g16_render" -> ((s, dir) =>
      GraphiteTarget.render(
        Seq("sumSeries(events.{click,view})",
          "alias(averageSeries(events.*), 'avg')"),
        universe(s, dir), step = 3600,
        fromSec = 1704672000L, untilSec = 1705881600L, // Jan 08 .. Jan 22
        maxDataPoints = Some(50))
        .select(col("series"), col("bucket").cast("long").as("bucket_s"),
          round(col("value"), 6).as("value"))
        .orderBy("series", "bucket_s")),

    // /render with graphite's RELATIVE time specs (from=now-7d,
    // until=now; now explicit per the §5.3 stance) and a timeShift'd
    // second target: the shifted data comes from BEFORE `from` — the
    // per-target widened fetch window must pull it in, and the output
    // must still be re-clamped to [from, until)
    "g17_relrender" -> ((s, dir) =>
      GraphiteTarget.render(
        Seq("sumSeries(events.{click,view})",
          "alias(timeShift(sumSeries(events.{click,view}), \"1d\"), 'shifted')"),
        universe(s, dir), step = 3600,
        from = "now-7d", until = "now",
        nowSec = 1706745600L, // 2024-02-01 00:00 — window Jan 25 .. Feb 01
        maxDataPoints = None)
        .select(col("series"), col("bucket").cast("long").as("bucket_s"),
          round(col("value"), 6).as("value"))
        .orderBy("series", "bucket_s")),

    // tagged-series selection: equality + anchored-regex tag
    // expressions over the carbon tagged-metric name form — the
    // filter is one codegen'd name predicate (a pushable scan filter,
    // the same plan shape as a Glob leaf)
    "g18_seriesbytag" -> ((s, dir) =>
      renderTagged(s, dir,
        "seriesByTag('host=h1', 'name=~events\\.(click|view)$')")),

    // tag-driven renaming composed over tag selection (negated
    // equality included): series become <name>.<host>
    "g19_aliasbytags" -> ((s, dir) =>
      renderTagged(s, dir,
        "aliasByTags(seriesByTag('dc=dc0', 'host!=h2'), 'name', 'host')")),

    // seasonal Holt-Winters forecast as a render target: the h25 fold
    // (dyadic constants, daily season at the hourly step) surfaced
    // through the target language; name preserved (per-series
    // transform contract), r6 quantization as in h25
    "g20_hwrender" -> ((s, dir) =>
      GraphiteTarget.eval("holtWintersForecast(events.click)",
        universe(s, dir), step = 3600)
        .select(col("series"), col("bucket").cast("string").as("bucket"),
          (round(col("value") * lit(1e6)) / lit(1e6)).as("value"))
        .orderBy("series", "bucket")),

    // Brutlag bands + aberration as render targets, grouped into one
    // frame: one series fans into upper/lower (wrapped names) and the
    // aberration amount outside the band
    "g21_hwbands" -> ((s, dir) =>
      GraphiteTarget.eval(
        "group(holtWintersConfidenceBands(events.view), " +
          "holtWintersAberration(events.view))",
        universe(s, dir), step = 3600)
        .select(col("series"), col("bucket").cast("string").as("bucket"),
          (round(col("value") * lit(1e6)) / lit(1e6)).as("value"))
        .orderBy("series", "bucket")),

    // grouped aggregation by TAG value over the tagged universe — the
    // fan-in workhorse of tag-based dashboards: tag selection is a
    // pushable name predicate, the group-by-host fold is ONE hash agg
    // keyed (tag-value, bucket)
    "g22_groupbytags" -> ((s, dir) =>
      renderTagged(s, dir,
        "groupByTags(seriesByTag('name=~events\\.'), 'sum', 'host')")),

    // weightedAverage pairs the two sets by node key (event_type) and
    // folds Σ(v·w)/Σ(w) per bucket — self-weighted here so the oracle
    // is the power mean Σv²/Σv
    "g23_wavg" -> ((s, dir) =>
      render(s, dir, "weightedAverage(events.*, events.*, 1)")),

    // the EMA recurrence as a render target over a cross-series sum:
    // points=7 → α=0.25 (dyadic, so the constant is exact in binary on
    // both engines — the h13 determinism stance)
    "g24_emarender" -> ((s, dir) =>
      render(s, dir, "exponentialMovingAverage(sumSeries(events.*), 7)")),

    // linear interpolation across the nulls a value filter introduces:
    // per-series ignore-nulls (value, time) windows on both sides,
    // edges stay null
    "g25_interp" -> ((s, dir) =>
      render(s, dir, "interpolate(removeAboveValue(events.click, 80))")),

    // per-series OLS fit evaluated at every bucket — exact decimal
    // moment sums, closed-form slope/intercept, fit values
    // affine-invariant in the time origin
    "g26_linreg" -> ((s, dir) =>
      render(s, dir, "linearRegression(events.view)")),

    // the exact-arithmetic scalar tail composed: per-series rebase to
    // zero, rate re-based to per-minute, and transition flags —
    // two independent targets in one frame
    "g27_scalartail" -> ((s, dir) =>
      render(s, dir,
        "group(scaleToSeconds(offsetToZero(events.click), 60), " +
          "changed(events.view))")),

    // generic per-series filter + per-bucket cross-series distribution
    // flattened to its 75th percentile
    "g28_filterpct" -> ((s, dir) =>
      render(s, dir,
        "percentileOfSeries(filterSeries(events.*, 'max', '>', 50), 75)")),

    // groupByNode fan-in piped into a per-interval resetting integral:
    // the window just gains the day as a second partition key — no
    // global sort at any scale
    "g29_groupbyint" -> ((s, dir) =>
      render(s, dir,
        "integralByInterval(groupByNode(events.*, 1, 'sum'), '1d')")),

    // the generic trailing window over a groupByNode re-key — range is
    // exact arithmetic (max/min + one subtraction), so the composition
    // is bit-deterministic at any SF
    "g30_movingwindow" -> ((s, dir) =>
      render(s, dir,
        "movingWindow(groupByNode(events.*, 1, 'max'), 6, 'range')")),

    // plan-level fallback (empty primary → generated constant line over
    // the bucket spine) grouped with an epoch-bounded time slice
    "g31_fallback" -> ((s, dir) =>
      render(s, dir,
        "group(fallbackSeries(events.nosuch, constantLine(42)), " +
          "timeSlice(events.click, 1704499200, 1704585599))")),

    // smartSummarize: daily sums aligned to the render window's `from`
    // (03:00 — NOT the epoch grid summarize uses), and the alignTo
    // variant that truncates the origin back to the day boundary — the
    // request context threaded through evaluation, two targets in one
    // render (window Jan 08 03:00 .. Jan 15 03:00)
    "g32_smartsummarize" -> ((s, dir) =>
      GraphiteTarget.render(
        Seq("smartSummarize(events.*, '1d', 'sum')",
          "alias(smartSummarize(events.click, '1d', 'max', 'days'), 'clickmax')"),
        universe(s, dir), step = 3600,
        fromSec = 1704682800L, untilSec = 1705287600L,
        maxDataPoints = None)
        .select(col("series"), col("bucket").cast("long").as("bucket_s"),
          round(col("value"), 6).as("value"))
        .orderBy("series", "bucket_s")),

    // useSeriesAbove: dc0 series whose max clears 280 name their dc1
    // mirrors, which are re-probed from the universe — the derived
    // name set is one bounded per-series agg broadcast as a semi-join
    // (names without a live series drop out)
    "g33_useseriesabove" -> ((s, dir) =>
      renderTagged(s, dir,
        "useSeriesAbove(seriesByTag('dc=dc0'), 280, 'dc=dc0', 'dc=dc1')")),

    // applyByNode: asPercent evaluated once per events.<type> prefix —
    // each host's share of its own type's per-bucket total (the
    // prefix list is the facade's one capped driver collect)
    "g34_applybynode" -> ((s, dir) =>
      GraphiteTarget.eval("applyByNode(events.*.*, 1, 'asPercent(%.*)')",
        deepUniverse(s, dir), step = 3600)
        .select(col("series"), col("bucket").cast("string").as("bucket"),
          round(col("value"), 6).as("value"))
        .orderBy("series", "bucket")),

    // relative timeSlice: '-2d'..'now' resolved against the render
    // request's explicit now (Feb 01) inside a now-relative window —
    // values outside the last two days null, buckets stay
    "g35_relslice" -> ((s, dir) =>
      GraphiteTarget.render(
        Seq("timeSlice(events.click, '-2d', 'now')"),
        universe(s, dir), step = 3600,
        from = "now-7d", until = "now", nowSec = 1706745600L,
        maxDataPoints = None)
        .select(col("series"), col("bucket").cast("long").as("bucket_s"),
          round(col("value"), 6).as("value"))
        .orderBy("series", "bucket_s")),

    // pairwise list combination: the i-th series of each list pairs by
    // name order; divide keeps the dividend's buckets (absent divisor
    // nulls), the aggregate form folds each pair's bucket union
    "g36_serieslists" -> ((s, dir) =>
      render(s, dir,
        "group(divideSeriesLists(events.{click,purchase}, " +
          "events.{signup,view}), " +
          "aggregateSeriesLists(events.{click,purchase}, " +
          "events.{signup,view}, 'sum'))")),

    // map/reduce templating over three-level names: each type's h0
    // share of its h1 mirror — one hash agg keyed (prefix, bucket)
    "g37_reduce" -> ((s, dir) =>
      GraphiteTarget.eval(
        "reduceSeries(mapSeries(events.*.*, 1), 'asPercent', 2, 'h0', 'h1')",
        deepUniverse(s, dir), step = 3600)
        .select(col("series"), col("bucket").cast("string").as("bucket"),
          round(col("value"), 6).as("value"))
        .orderBy("series", "bucket")),

    // generated/fold tail: name-ordered pow fold across two series,
    // logit of a (0,1)-scaled series, and the time generator on its
    // own 2-hour step (a second render target — group() insists on
    // uniform steps, the same reason graphite draws them separately);
    // window = the fixture's full Jan 2024
    "g38_gen" -> ((s, dir) =>
      GraphiteTarget.render(
        Seq("group(powSeries(scale(events.click, 0.01), " +
            "scale(events.signup, 0.01)), " +
            "logit(scale(events.click, 0.001)))",
          "time('tick', 7200)"),
        universe(s, dir), step = 3600,
        fromSec = 1704067200L, untilSec = 1706745600L,
        maxDataPoints = None)
        .select(col("series"), col("bucket").cast("string").as("bucket"),
          round(col("value"), 6).as("value"))
        .orderBy("series", "bucket")),

    // setXFilesFactor riding into summarize: a day only counts with
    // ≥ 0.99·24 non-null hours (complete days only)
    "g39_xff" -> ((s, dir) =>
      render(s, dir,
        "alias(summarize(setXFilesFactor(events.click, 0.99), " +
          "'1d', 'sum'), 'fullday')")),

    // aggregate's 3-arg xFilesFactor form: a bucket only averages
    // when ≥ 0.9 of the universe's series report
    "g40_aggxff" -> ((s, dir) =>
      render(s, dir,
        "alias(aggregate(events.*, 'average', 0.9), 'avg90')")),

    // the facade's function inventory as an artifact: one row per
    // supported render function. The oracle is generated from the SAME
    // Seq (coverage-as-artifact, not a computation check); the
    // companion dispatchability test in GraphiteTailSpec is what keeps
    // the list honest against the evaluator.
    "g41_inventory" -> ((s, _) => {
      import s.implicits._
      GraphiteTarget.functionInventory.toDF("family", "fn")
        .orderBy("family", "fn")
    }),

    // the chart-generator/annotation quartet (r12 verdict missing #3,
    // formerly "unmapped by intent"): sinFunction is amplitude·sin(t)
    // on the request grid (deterministic — only randomWalk is not),
    // verticalLine a two-point 1.0 annotation at its parsed timestamp,
    // events() the matching event stream as 1.0 spikes on the bucket
    // spine, and aliasQuery renames a series by the LAST value of the
    // series its regex-rewritten name points at (one distributed
    // lookup join, never a per-series re-render)
    "g42_annotations" -> ((s, dir) =>
      GraphiteTarget.render(
        Seq("sinFunction('sine', 100, 86400)",
          "verticalLine('1704672000', 'deploy')",
          "events('click', 'signup')",
          "aliasQuery(events.click, 'click', 'view', " +
            "'click (views last: %d)')"),
        universe(s, dir), step = 3600,
        fromSec = 1704067200L, untilSec = 1706745600L,
        maxDataPoints = None)
        .select(col("series"), col("bucket").cast("string").as("bucket"),
          round(col("value"), 6).as("value"))
        .orderBy("series", "bucket"))
  )

  val oracles: Map[String, String] = Map(
    "g1_target" ->
      s"""WITH $U
         |SELECT 'sumSeries(events.{click,view})' AS series,
         |       CAST(bucket AS VARCHAR) AS bucket,
         |       ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
         |               AS DECIMAL(18,6)) AS DOUBLE) * 100, 6) AS value
         |FROM u WHERE series IN ('events.click', 'events.view')
         |GROUP BY bucket ORDER BY series, bucket""".stripMargin,

    "g2_target" ->
      s"""WITH $U,
         |av AS (
         |  SELECT bucket,
         |         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
         |               / COUNT(value) * 1e6) / 1e6 AS v
         |  FROM u GROUP BY bucket)
         |SELECT 'averageSeries(events.*)' AS series,
         |       CAST(bucket AS VARCHAR) AS bucket,
         |       ROUND(ROUND(CAST(SUM(CAST(v AS DECIMAL(18,6))) OVER w AS DOUBLE)
         |             / COUNT(v) OVER w * 1e6) / 1e6, 6) AS value
         |FROM av
         |WINDOW w AS (ORDER BY bucket ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
         |ORDER BY series, bucket""".stripMargin,

    "g3_target" ->
      s"""WITH $U
         |SELECT series, CAST(bucket AS VARCHAR) AS bucket,
         |       ROUND(ROUND(value * 100
         |             / CAST(SUM(CAST(value AS DECIMAL(18,6)))
         |                    OVER (PARTITION BY bucket) AS DOUBLE)
         |             * 1e6) / 1e6, 6) AS value
         |FROM u ORDER BY series, bucket""".stripMargin,

    "g4_target" ->
      s"""WITH $U,
         |tot AS (
         |  SELECT bucket,
         |         CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
         |              AS DECIMAL(18,6)) AS DOUBLE) AS v
         |  FROM u GROUP BY bucket),
         |d AS (
         |  SELECT bucket,
         |         CASE WHEN v >= lag(v) OVER (ORDER BY bucket)
         |              THEN v - lag(v) OVER (ORDER BY bucket) END AS dv
         |  FROM tot)
         |SELECT 'sumSeries(events.*)' AS series,
         |       CAST(CAST(date_trunc('day', bucket) AS TIMESTAMP) AS VARCHAR)
         |         AS bucket,
         |       ROUND(CAST(CAST(SUM(CAST(dv AS DECIMAL(18,6)))
         |               AS DECIMAL(18,6)) AS DOUBLE), 6) AS value
         |FROM d GROUP BY 2 ORDER BY series, bucket""".stripMargin,

    "g6_target" ->
      s"""WITH $U,
         |keep AS (
         |  SELECT series FROM u GROUP BY series
         |  HAVING ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
         |         / COUNT(value) * 1e6) / 1e6 > 50
         |)
         |SELECT u.series, CAST(u.bucket AS VARCHAR) AS bucket,
         |       ROUND(u.value, 6) AS value
         |FROM u JOIN keep ON u.series = keep.series
         |WHERE NOT regexp_matches(u.series, 'click')
         |ORDER BY u.series, bucket""".stripMargin,

    "g7_target" ->
      s"""WITH $U,
         |tot AS (
         |  SELECT bucket,
         |         CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
         |              AS DECIMAL(18,6)) AS DOUBLE) AS v
         |  FROM u GROUP BY bucket),
         |sub AS (
         |  SELECT bucket,
         |         CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
         |              AS DECIMAL(18,6)) AS DOUBLE) AS v
         |  FROM u WHERE series IN ('events.click', 'events.view')
         |  GROUP BY bucket)
         |SELECT 'sumSeries(events.*)' AS series,
         |       CAST(t.bucket AS VARCHAR) AS bucket,
         |       ROUND(t.v - COALESCE(s.v, 0), 6) AS value
         |FROM tot t LEFT JOIN sub s ON t.bucket = s.bucket
         |ORDER BY series, bucket""".stripMargin,

    "g8_target" ->
      s"""WITH $U,
         |t AS (
         |  SELECT series, bucket,
         |         COALESCE(CASE WHEN value <= 80 THEN value END, 0) AS v
         |  FROM u)
         |SELECT series, CAST(bucket AS VARCHAR) AS bucket,
         |       ROUND(CAST(SUM(CAST(v AS DECIMAL(18,6))) OVER w AS DOUBLE), 6)
         |         AS value
         |FROM t WINDOW w AS (PARTITION BY series ORDER BY bucket
         |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
         |ORDER BY series, bucket""".stripMargin,

    "g9_target" ->
      s"""WITH $U,
         |pct AS (
         |  SELECT series, ROUND(quantile_cont(value, 0.5) * 1e6) / 1e6 AS p
         |  FROM u GROUP BY series),
         |r AS (
         |  SELECT u.series, u.bucket,
         |         CASE WHEN u.value >= pct.p THEN u.value END AS v
         |  FROM u JOIN pct USING (series)),
         |st AS (
         |  SELECT series,
         |         ROUND(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
         |               / COUNT(v) * 1e6) / 1e6 AS score
         |  FROM r GROUP BY series
         |  QUALIFY row_number() OVER (ORDER BY score ASC, series) <= 2)
         |SELECT r.series AS series, CAST(r.bucket AS VARCHAR) AS bucket,
         |       ROUND(r.v, 6) AS value
         |FROM r JOIN st ON r.series = st.series
         |ORDER BY r.series, bucket""".stripMargin,

    "g10_target" ->
      s"""WITH $U
         |SELECT 'rangeOfSeries(events.*)' AS series,
         |       CAST(bucket AS VARCHAR) AS bucket,
         |       ROUND(SQRT(MAX(value) - MIN(value)), 6) AS value
         |FROM u GROUP BY bucket ORDER BY series, bucket""".stripMargin,

    // graphite's safeMul POISONS on None: the grid is the union of the
    // two factors' present buckets, and a bucket missing (or null) on
    // EITHER side is null — not dropped, not one-sided (the powSeries
    // None-grid parity, extended to multiplySeries in r13)
    "g11_target" ->
      s"""WITH $U,
         |a AS (
         |  SELECT bucket,
         |         CASE WHEN value <> 0 THEN ROUND(1.0 / value * 1e6) / 1e6 END
         |           AS v
         |  FROM u WHERE series = 'events.click'),
         |b AS (SELECT bucket, value FROM u WHERE series = 'events.view'),
         |g AS (SELECT bucket FROM a UNION SELECT bucket FROM b)
         |SELECT 'multiplySeries(invert(events.click),events.view)' AS series,
         |       CAST(g.bucket AS VARCHAR) AS bucket,
         |       CASE WHEN a.v IS NULL OR b.value IS NULL THEN NULL
         |            ELSE ROUND(ROUND(a.v * b.value * 1e6) / 1e6, 6) END
         |         AS value
         |FROM g LEFT JOIN a ON g.bucket = a.bucket
         |       LEFT JOIN b ON g.bucket = b.bucket
         |ORDER BY series, bucket""".stripMargin,

    "g12_target" ->
      s"""WITH $U,
         |sd AS (
         |  SELECT series, bucket,
         |         ROUND(SQRT(GREATEST(
         |           (CAST(SUM(CAST(value * value AS DECIMAL(18,6))) OVER w
         |                 AS DOUBLE)
         |            - CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
         |              * CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
         |              / COUNT(value) OVER w) / COUNT(value) OVER w, 0))
         |           * 1e6) / 1e6 AS v
         |  FROM u WINDOW w AS (PARTITION BY series ORDER BY bucket
         |    ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)),
         |top AS (
         |  SELECT series, arg_max(v, bucket) AS cur FROM sd GROUP BY series
         |  QUALIFY row_number() OVER (ORDER BY cur DESC, series) <= 1)
         |SELECT split_part(sd.series, '.', 2) AS series,
         |       CAST(sd.bucket AS VARCHAR) AS bucket,
         |       ROUND(sd.v, 6) AS value
         |FROM sd JOIN top ON sd.series = top.series
         |ORDER BY series, bucket""".stripMargin,

    "g13_target" ->
      s"""WITH $U,
         |sd AS (
         |  SELECT bucket,
         |         ROUND(SQRT(GREATEST(
         |           (CAST(SUM(CAST(value * value AS DECIMAL(18,6))) AS DOUBLE)
         |            - CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
         |              * CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
         |              / COUNT(value)) / COUNT(value), 0)) * 1e6) / 1e6 AS v
         |  FROM u GROUP BY bucket),
         |p AS (SELECT ROUND(quantile_cont(v, 0.90) * 1e6) / 1e6 AS pct
         |      FROM sd)
         |SELECT 'stddevSeries(events.*)' AS series,
         |       CAST(sd.bucket AS VARCHAR) AS bucket,
         |       ROUND(p.pct, 6) AS value
         |FROM sd, p ORDER BY series, bucket""".stripMargin,

    "g14_target" ->
      s"""WITH $U,
         |hourly AS (
         |  SELECT bucket,
         |         CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
         |              AS DECIMAL(18,6)) AS DOUBLE) AS v
         |  FROM u GROUP BY bucket)
         |SELECT 'sumSeries(events.*)' AS series,
         |       epoch_us(bucket) // 1000000 // 28800 * 28800 AS bucket_s,
         |       ROUND(MAX(v), 6) AS value
         |FROM hourly GROUP BY 2 ORDER BY series, bucket_s""".stripMargin,

    "g15_find" ->
      """WITH n AS (
        |  SELECT DISTINCT 'events.' || event_type AS series FROM events)
        |SELECT 'events' AS node, false AS is_leaf, true AS is_branch
        |UNION ALL
        |SELECT series AS node, true AS is_leaf, false AS is_branch FROM n
        |WHERE series IN ('events.click', 'events.view', 'events.error')
        |ORDER BY node""".stripMargin,

    "g16_render" ->
      s"""WITH $U,
         |w AS (
         |  SELECT series, bucket, value FROM u
         |  WHERE bucket >= TIMESTAMP '2024-01-08 00:00:00'
         |    AND bucket < TIMESTAMP '2024-01-22 00:00:00'),
         |t1 AS (
         |  SELECT bucket, CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
         |         AS DECIMAL(18,6)) AS DOUBLE) AS v
         |  FROM w WHERE series IN ('events.click', 'events.view')
         |  GROUP BY bucket),
         |t1c AS (
         |  SELECT epoch_us(bucket) // 1000000 // 25200 * 25200 AS b,
         |         ROUND(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
         |               / COUNT(v) * 1e6) / 1e6 AS v
         |  FROM t1 GROUP BY 1),
         |t2 AS (
         |  SELECT bucket, ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6)))
         |         AS DOUBLE) / COUNT(value) * 1e6) / 1e6 AS v
         |  FROM w GROUP BY bucket),
         |t2c AS (
         |  SELECT epoch_us(bucket) // 1000000 // 25200 * 25200 AS b,
         |         ROUND(CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE)
         |               / COUNT(v) * 1e6) / 1e6 AS v
         |  FROM t2 GROUP BY 1)
         |SELECT 'sumSeries(events.{click,view})' AS series,
         |       b AS bucket_s, ROUND(v, 6) AS value FROM t1c
         |UNION ALL
         |SELECT 'avg' AS series, b AS bucket_s, ROUND(v, 6) AS value FROM t2c
         |ORDER BY series, bucket_s""".stripMargin,

    "g17_relrender" ->
      s"""WITH $U,
         |t1 AS (
         |  SELECT bucket, CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
         |         AS DECIMAL(18,6)) AS DOUBLE) AS v
         |  FROM u WHERE series IN ('events.click', 'events.view')
         |  GROUP BY bucket)
         |SELECT 'sumSeries(events.{click,view})' AS series,
         |       epoch_us(bucket) // 1000000 AS bucket_s,
         |       ROUND(v, 6) AS value
         |FROM t1
         |WHERE bucket >= TIMESTAMP '2024-01-25 00:00:00'
         |  AND bucket < TIMESTAMP '2024-02-01 00:00:00'
         |UNION ALL
         |SELECT 'shifted' AS series,
         |       epoch_us(bucket) // 1000000 + 86400 AS bucket_s,
         |       ROUND(v, 6) AS value
         |FROM t1
         |WHERE bucket + INTERVAL 1 DAY >= TIMESTAMP '2024-01-25 00:00:00'
         |  AND bucket + INTERVAL 1 DAY < TIMESTAMP '2024-02-01 00:00:00'
         |ORDER BY series, bucket_s""".stripMargin,

    "g5_target" ->
      s"""WITH $U,
         |st AS (
         |  SELECT series,
         |         ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
         |               / COUNT(value) * 1e6) / 1e6 AS score
         |  FROM u GROUP BY series
         |  QUALIFY row_number() OVER (ORDER BY score DESC, series) <= 2)
         |SELECT split_part(u.series, '.', 2) AS series,
         |       CAST(u.bucket + INTERVAL 1 DAY AS VARCHAR) AS bucket,
         |       ROUND(u.value, 6) AS value
         |FROM u JOIN st ON u.series = st.series
         |ORDER BY series, bucket""".stripMargin,

    // tag selection mirrored from the generating columns: host=h1 is
    // user_id%3=1, the anchored name regex is the event_type IN list
    "g18_seriesbytag" ->
      s"""WITH $TU
         |SELECT series, CAST(bucket AS VARCHAR) AS bucket,
         |       ROUND(value, 6) AS value
         |FROM tu WHERE host = 1 AND event_type IN ('click', 'view')
         |ORDER BY series, bucket""".stripMargin,

    "g19_aliasbytags" ->
      s"""WITH $TU
         |SELECT 'events.' || event_type || '.h' || host AS series,
         |       CAST(bucket AS VARCHAR) AS bucket,
         |       ROUND(value, 6) AS value
         |FROM tu WHERE dc = 0 AND host <> 2
         |ORDER BY series, bucket""".stripMargin,

    // h25's recursive seasonal replay, one series, forecast only
    "g20_hwrender" ->
      """WITH RECURSIVE hourly AS (
        |  SELECT date_trunc('hour', ts) AS h, arg_max(value, event_id) AS v
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |o AS (SELECT h, v, row_number() OVER (ORDER BY h) AS rn FROM hourly),
        |rec AS (
        |  SELECT h, rn, v AS l, CAST(0.0 AS DOUBLE) AS b,
        |         list_transform(range(1, 25), i -> CAST(0.0 AS DOUBLE)) AS s
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.h, o.rn,
        |         0.5 * (o.v - r.s[((o.rn - 1) % 24) + 1])
        |           + 0.5 * (r.l + r.b),
        |         0.25 * ((0.5 * (o.v - r.s[((o.rn - 1) % 24) + 1])
        |                  + 0.5 * (r.l + r.b)) - r.l) + 0.75 * r.b,
        |         list_transform(range(1, 25), i ->
        |           CASE WHEN i = ((o.rn - 1) % 24) + 1
        |             THEN 0.25 * (o.v -
        |               (0.5 * (o.v - r.s[((o.rn - 1) % 24) + 1])
        |                + 0.5 * (r.l + r.b)))
        |               + 0.75 * r.s[((o.rn - 1) % 24) + 1]
        |             ELSE r.s[i] END)
        |  FROM rec r JOIN o ON o.rn = r.rn + 1)
        |SELECT 'events.click' AS series, CAST(h AS VARCHAR) AS bucket,
        |       ROUND((l + b + s[(rn % 24) + 1]) * 1e6) / 1e6 AS value
        |FROM rec ORDER BY series, bucket""".stripMargin,

    // h37's recursion for one series; band edges and the aberration
    // amount derive from the SAME pred/devpre doubles the fold emits
    "g21_hwbands" ->
      """WITH RECURSIVE hourly AS (
        |  SELECT date_trunc('hour', ts) AS h, arg_max(value, event_id) AS v
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |o AS (SELECT h, v, row_number() OVER (ORDER BY h) AS rn FROM hourly),
        |rec AS (
        |  SELECT h, rn, v, v AS l, CAST(0.0 AS DOUBLE) AS b,
        |         list_transform(range(1, 25), i -> CAST(0.0 AS DOUBLE)) AS s,
        |         list_transform(range(1, 25), i -> CAST(0.0 AS DOUBLE)) AS d,
        |         v AS pred, CAST(0.0 AS DOUBLE) AS devpre
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.h, o.rn, o.v,
        |         0.5 * (o.v - r.s[((o.rn - 1) % 24) + 1])
        |           + 0.5 * (r.l + r.b),
        |         0.25 * ((0.5 * (o.v - r.s[((o.rn - 1) % 24) + 1])
        |                  + 0.5 * (r.l + r.b)) - r.l) + 0.75 * r.b,
        |         list_transform(range(1, 25), i ->
        |           CASE WHEN i = ((o.rn - 1) % 24) + 1
        |             THEN 0.25 * (o.v -
        |               (0.5 * (o.v - r.s[((o.rn - 1) % 24) + 1])
        |                + 0.5 * (r.l + r.b)))
        |               + 0.75 * r.s[((o.rn - 1) % 24) + 1]
        |             ELSE r.s[i] END),
        |         list_transform(range(1, 25), i ->
        |           CASE WHEN i = ((o.rn - 1) % 24) + 1
        |             THEN 0.25 * abs(o.v -
        |               (r.l + r.b + r.s[((o.rn - 1) % 24) + 1]))
        |               + 0.75 * r.d[((o.rn - 1) % 24) + 1]
        |             ELSE r.d[i] END),
        |         r.l + r.b + r.s[((o.rn - 1) % 24) + 1],
        |         r.d[((o.rn - 1) % 24) + 1]
        |  FROM rec r JOIN o ON o.rn = r.rn + 1),
        |bands AS (
        |  SELECT h, v, pred + 3.0 * devpre AS upper,
        |         pred - 3.0 * devpre AS lower
        |  FROM rec)
        |SELECT * FROM (
        |  SELECT 'holtWintersConfidenceUpper(events.view)' AS series,
        |         CAST(h AS VARCHAR) AS bucket,
        |         ROUND(upper * 1e6) / 1e6 AS value FROM bands
        |  UNION ALL
        |  SELECT 'holtWintersConfidenceLower(events.view)' AS series,
        |         CAST(h AS VARCHAR) AS bucket,
        |         ROUND(lower * 1e6) / 1e6 AS value FROM bands
        |  UNION ALL
        |  SELECT 'holtWintersAberration(events.view)' AS series,
        |         CAST(h AS VARCHAR) AS bucket,
        |         ROUND((CASE WHEN v > upper THEN v - upper
        |                     WHEN v < lower THEN v - lower
        |                     ELSE 0.0 END) * 1e6) / 1e6 AS value FROM bands)
        |ORDER BY series, bucket""".stripMargin,

    // every tagged series matches name=~events\. — the fold is the
    // per-(host, bucket) exact decimal sum
    "g22_groupbytags" ->
      s"""WITH $TU
         |SELECT 'h' || host AS series, CAST(bucket AS VARCHAR) AS bucket,
         |       ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
         |             AS DECIMAL(18,6)) AS DOUBLE), 6) AS value
         |FROM tu GROUP BY 1, 2 ORDER BY series, bucket""".stripMargin,

    // self-weighted: Σv²/Σv per bucket (node 1 pairs each type with
    // itself), divisions q6'd per the façade contract
    "g23_wavg" ->
      s"""WITH $U
         |SELECT 'weightedAverage(events.*,events.*,1)' AS series,
         |       CAST(bucket AS VARCHAR) AS bucket,
         |       ROUND(CASE WHEN CAST(SUM(CAST(value AS DECIMAL(18,6)))
         |                        AS DOUBLE) <> 0
         |         THEN ROUND(CAST(SUM(CAST(value * value AS DECIMAL(18,6)))
         |                    AS DOUBLE)
         |              / CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
         |              * 1e6) / 1e6
         |         END, 6) AS value
         |FROM u GROUP BY bucket ORDER BY series, bucket""".stripMargin,

    // h13's recursive replay over the per-bucket sum; α=0.25 is exact
    // in binary so the per-step IEEE ops are identical on both engines
    "g24_emarender" ->
      s"""WITH RECURSIVE $U,
         |tot AS (
         |  SELECT bucket, CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
         |         AS DECIMAL(18,6)) AS DOUBLE) AS v
         |  FROM u GROUP BY bucket),
         |o AS (SELECT bucket, v, row_number() OVER (ORDER BY bucket) AS rn
         |      FROM tot),
         |rec AS (
         |  SELECT bucket, rn, v AS ema FROM o WHERE rn = 1
         |  UNION ALL
         |  SELECT o.bucket, o.rn, 0.25 * o.v + 0.75 * r.ema
         |  FROM rec r JOIN o ON o.rn = r.rn + 1)
         |SELECT 'sumSeries(events.*)' AS series, CAST(bucket AS VARCHAR)
         |         AS bucket,
         |       ROUND(ema, 6) AS value
         |FROM rec ORDER BY series, bucket""".stripMargin,

    // both sides' (value, time) anchors come from the same ignore-nulls
    // window rows; the fit expression mirrors the engine's op order
    // (pv + (nv−pv)·(t−pt)/(nt−pt)) so the doubles are identical
    "g25_interp" ->
      s"""WITH $U,
         |c AS (
         |  SELECT bucket, epoch_us(bucket) // 1000000 AS t,
         |         CASE WHEN value <= 80 THEN value END AS v
         |  FROM u WHERE series = 'events.click'),
         |w AS (
         |  SELECT bucket, t, v,
         |    last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
         |      OVER (ORDER BY bucket
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
         |    last_value(v IGNORE NULLS)
         |      OVER (ORDER BY bucket
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
         |    first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
         |      OVER (ORDER BY bucket
         |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt,
         |    first_value(v IGNORE NULLS)
         |      OVER (ORDER BY bucket
         |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
         |  FROM c)
         |SELECT 'events.click' AS series, CAST(bucket AS VARCHAR) AS bucket,
         |  ROUND(CASE WHEN v IS NOT NULL THEN v
         |        WHEN pt IS NOT NULL AND nt IS NOT NULL
         |        THEN ROUND((pv + (nv - pv) * (t - pt) / (nt - pt)) * 1e6)
         |             / 1e6
         |        END, 6) AS value
         |FROM w ORDER BY series, bucket""".stripMargin,

    // exact decimal moment sums → the closed-form slope/intercept
    // doubles are order-free and identical across engines; fit
    // expression mirrors icept + slope·x
    "g26_linreg" ->
      s"""WITH $U,
         |c AS (
         |  SELECT bucket, value,
         |         CAST(epoch_us(bucket) // 1000000
         |           - MIN(epoch_us(bucket) // 1000000) OVER () AS DOUBLE) AS x
         |  FROM u WHERE series = 'events.view'),
         |st AS (
         |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         |    CAST(CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DECIMAL(38,6))
         |         AS DOUBLE) AS sx,
         |    CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,6))
         |         AS DOUBLE) AS sy,
         |    CAST(CAST(SUM(CAST(x * value AS DECIMAL(38,6))) AS DECIMAL(38,6))
         |         AS DOUBLE) AS sxy,
         |    CAST(CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DECIMAL(38,6))
         |         AS DOUBLE) AS sxx
         |  FROM c WHERE value IS NOT NULL),
         |f AS (
         |  SELECT n, sx, sy, sxx, n * sxx - sx * sx AS det,
         |         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
         |  FROM st)
         |SELECT 'events.view' AS series, CAST(c.bucket AS VARCHAR) AS bucket,
         |  ROUND(CASE WHEN f.det <> 0
         |    THEN ROUND(((f.sy - f.slope * f.sx) / f.n + f.slope * c.x) * 1e6)
         |         / 1e6
         |    END, 6) AS value
         |FROM c, f ORDER BY series, bucket""".stripMargin,

    // target 1: ((v − min)·60)/3600, q6'd — every op exact-rounded
    // IEEE on both engines; target 2: transition flags, pure compares
    "g27_scalartail" ->
      s"""WITH $U,
         |c AS (SELECT bucket, value, MIN(value) OVER () AS mn
         |      FROM u WHERE series = 'events.click'),
         |ch AS (SELECT bucket, value, lag(value) OVER (ORDER BY bucket) AS prev
         |       FROM u WHERE series = 'events.view')
         |SELECT * FROM (
         |  SELECT 'events.click' AS series, CAST(bucket AS VARCHAR) AS bucket,
         |         ROUND(ROUND((value - mn) * 60 / 3600 * 1e6) / 1e6, 6)
         |           AS value
         |  FROM c
         |  UNION ALL
         |  SELECT 'events.view' AS series, CAST(bucket AS VARCHAR) AS bucket,
         |         CASE WHEN prev IS NOT NULL AND value IS NOT NULL
         |                   AND value <> prev
         |              THEN 1.0 ELSE 0.0 END AS value
         |  FROM ch)
         |ORDER BY series, bucket""".stripMargin,

    "g28_filterpct" ->
      s"""WITH $U,
         |keep AS (SELECT series FROM u GROUP BY series HAVING MAX(value) > 50),
         |f AS (SELECT u.* FROM u JOIN keep USING (series))
         |SELECT 'percentileOfSeries(filterSeries(events.*,"max",">",50),75)'
         |         AS series,
         |       CAST(bucket AS VARCHAR) AS bucket,
         |       ROUND(ROUND(quantile_cont(value, 0.75) * 1e6) / 1e6, 6)
         |         AS value
         |FROM f GROUP BY bucket ORDER BY series, bucket""".stripMargin,

    // max-fold over one-series groups is the identity, so the oracle
    // is the trailing 6-point range per type — exact max/min arithmetic
    "g30_movingwindow" ->
      s"""WITH $U,
         |i AS (SELECT split_part(series, '.', 2) AS etype, bucket, value
         |      FROM u)
         |SELECT etype AS series, CAST(bucket AS VARCHAR) AS bucket,
         |       ROUND(MAX(value) OVER w - MIN(value) OVER w, 6) AS value
         |FROM i WINDOW w AS (PARTITION BY etype ORDER BY bucket
         |  ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
         |ORDER BY series, bucket""".stripMargin,

    // events.nosuch is empty → the fallback constant line over the
    // universe's distinct buckets; the slice nulls everything outside
    // Jan 06
    "g31_fallback" ->
      s"""WITH $U
         |SELECT * FROM (
         |  SELECT 'constantLine(42)' AS series,
         |         CAST(bucket AS VARCHAR) AS bucket, 42.0 AS value
         |  FROM (SELECT DISTINCT bucket FROM u)
         |  UNION ALL
         |  SELECT series, CAST(bucket AS VARCHAR) AS bucket,
         |         ROUND(CASE WHEN epoch_us(bucket) // 1000000
         |                         BETWEEN 1704499200 AND 1704585599
         |                    THEN value END, 6) AS value
         |  FROM u WHERE series = 'events.click')
         |ORDER BY series, bucket""".stripMargin,

    // t1: daily sums on the 03:00 `from` grid; t2: daily max for click
    // on the alignTo-'days' grid (origin truncated back to midnight)
    "g32_smartsummarize" ->
      s"""WITH $U,
         |w AS (
         |  SELECT series, epoch_us(bucket) // 1000000 AS t, value FROM u
         |  WHERE bucket >= TIMESTAMP '2024-01-08 03:00:00'
         |    AND bucket < TIMESTAMP '2024-01-15 03:00:00')
         |SELECT * FROM (
         |  SELECT series,
         |         1704682800 + (t - 1704682800) // 86400 * 86400 AS bucket_s,
         |         ROUND(CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
         |               AS DECIMAL(18,6)) AS DOUBLE), 6) AS value
         |  FROM w GROUP BY 1, 2
         |  UNION ALL
         |  SELECT 'clickmax' AS series,
         |         1704672000 + (t - 1704672000) // 86400 * 86400 AS bucket_s,
         |         ROUND(MAX(value), 6) AS value
         |  FROM w WHERE series = 'events.click' GROUP BY 1, 2)
         |ORDER BY series, bucket_s""".stripMargin,

    // dc0 series clearing max > 280 name their dc1 mirrors; only
    // names with a live series survive the probe
    "g33_useseriesabove" ->
      s"""WITH $TU,
         |keep AS (
         |  SELECT DISTINCT replace(series, 'dc=dc0', 'dc=dc1') AS series
         |  FROM tu WHERE dc = 0 GROUP BY series HAVING MAX(value) > 280)
         |SELECT tu.series, CAST(tu.bucket AS VARCHAR) AS bucket,
         |       ROUND(tu.value, 6) AS value
         |FROM tu JOIN keep ON tu.series = keep.series
         |ORDER BY tu.series, bucket""".stripMargin,

    // per-prefix asPercent: each host's share of its own type's
    // per-bucket decimal total (g3's oracle with the type partition)
    "g34_applybynode" ->
      """WITH du AS (
        |  SELECT concat('events.', event_type, '.h', user_id % 3) AS series,
        |         event_type, date_trunc('hour', ts) AS bucket,
        |         arg_max(value, event_id) AS value
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT series, CAST(bucket AS VARCHAR) AS bucket,
        |       ROUND(ROUND(value * 100
        |             / CAST(SUM(CAST(value AS DECIMAL(18,6)))
        |                    OVER (PARTITION BY event_type, bucket) AS DOUBLE)
        |             * 1e6) / 1e6, 6) AS value
        |FROM du ORDER BY series, bucket""".stripMargin,

    // window [now−7d, now); slice keeps [now−2d, now] inclusive —
    // values outside null, buckets stay
    "g35_relslice" ->
      s"""WITH $U
         |SELECT 'events.click' AS series,
         |       epoch_us(bucket) // 1000000 AS bucket_s,
         |       ROUND(CASE WHEN epoch_us(bucket) // 1000000
         |                       BETWEEN 1706572800 AND 1706745600
         |                  THEN value END, 6) AS value
         |FROM u WHERE series = 'events.click'
         |  AND bucket >= TIMESTAMP '2024-01-25 00:00:00'
         |  AND bucket < TIMESTAMP '2024-02-01 00:00:00'
         |ORDER BY series, bucket_s""".stripMargin,

    // the groupByNode fold is a no-op re-key here (one series per
    // type), so the oracle is the per-(type, day) running decimal sum
    "g29_groupbyint" ->
      s"""WITH $U,
         |i AS (SELECT split_part(series, '.', 2) AS etype, bucket, value
         |      FROM u)
         |SELECT etype AS series, CAST(bucket AS VARCHAR) AS bucket,
         |       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
         |         PARTITION BY etype, date_trunc('day', bucket)
         |         ORDER BY bucket
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |         AS DOUBLE), 6) AS value
         |FROM i ORDER BY series, bucket""".stripMargin,

    // name-order pairing: (click,signup) and (purchase,view); divide
    // keeps the dividend's buckets, sum folds each pair's union in
    // the decimal contract
    "g36_serieslists" ->
      s"""WITH $U,
         |pr AS (SELECT 'events.click' AS sa, 'events.signup' AS sb
         |       UNION ALL SELECT 'events.purchase', 'events.view'),
         |a AS (SELECT * FROM u
         |      WHERE series IN ('events.click', 'events.purchase')),
         |b AS (SELECT * FROM u
         |      WHERE series IN ('events.signup', 'events.view')),
         |dv AS (
         |  SELECT 'divideSeries(' || pr.sa || ',' || pr.sb || ')' AS series,
         |         CAST(a.bucket AS VARCHAR) AS bucket,
         |         ROUND(ROUND(CASE WHEN b.value <> 0
         |               THEN a.value / b.value END * 1e6) / 1e6, 6) AS value
         |  FROM a JOIN pr ON a.series = pr.sa
         |  LEFT JOIN b ON b.series = pr.sb AND b.bucket = a.bucket),
         |ag AS (
         |  SELECT 'sumSeries(' || pr.sa || ',' || pr.sb || ')' AS series,
         |         CAST(u.bucket AS VARCHAR) AS bucket,
         |         ROUND(CAST(CAST(SUM(CAST(u.value AS DECIMAL(18,6)))
         |               AS DECIMAL(18,6)) AS DOUBLE), 6) AS value
         |  FROM u JOIN pr ON u.series = pr.sa OR u.series = pr.sb
         |  GROUP BY 1, 2)
         |SELECT * FROM (SELECT * FROM dv UNION ALL SELECT * FROM ag)
         |ORDER BY series, bucket""".stripMargin,

    // one row per (type, bucket) where an h0/h1 member exists; the
    // pivot is exact (one series per matcher per prefix)
    "g37_reduce" ->
      """WITH du AS (
        |  SELECT concat('events.', event_type, '.h', user_id % 3) AS series,
        |         event_type, user_id % 3 AS h,
        |         date_trunc('hour', ts) AS bucket,
        |         arg_max(value, event_id) AS value
        |  FROM events GROUP BY 1, 2, 3, 4)
        |SELECT 'events.' || event_type || '.reduce.asPercent' AS series,
        |       CAST(bucket AS VARCHAR) AS bucket,
        |       ROUND(ROUND(CASE WHEN MAX(CASE WHEN h = 1 THEN value END) <> 0
        |             THEN MAX(CASE WHEN h = 0 THEN value END) * 100
        |                  / MAX(CASE WHEN h = 1 THEN value END) END
        |             * 1e6) / 1e6, 6) AS value
        |FROM du WHERE h IN (0, 1)
        |GROUP BY 1, 2 ORDER BY series, bucket""".stripMargin,

    // pow fold in ARGUMENT order (click before signup); graphite
    // evaluates over the None-filled shared grid, so a bucket missing
    // EITHER operand is null (row kept). logit on the (0,1)-scaled
    // series. The time generator is data-independent: ticks step from
    // `from` to `until` on the request range, not the data spine.
    "g38_gen" ->
      s"""WITH $U,
         |c AS (SELECT bucket, value * 0.01 AS v FROM u
         |      WHERE series = 'events.click'),
         |sg AS (SELECT bucket, value * 0.01 AS v FROM u
         |       WHERE series = 'events.signup'),
         |pw AS (
         |  SELECT 'powSeries(scale(events.click,0.01),scale(events.signup,0.01))'
         |           AS series,
         |         CAST(COALESCE(c.bucket, sg.bucket) AS VARCHAR) AS bucket,
         |         ROUND(ROUND(CASE
         |           WHEN c.v IS NOT NULL AND sg.v IS NOT NULL
         |             THEN POW(c.v, sg.v) END
         |           * 1e6) / 1e6, 6) AS value
         |  FROM c FULL OUTER JOIN sg ON c.bucket = sg.bucket),
         |lg AS (
         |  SELECT 'events.click' AS series, CAST(bucket AS VARCHAR) AS bucket,
         |         ROUND(ROUND(CASE WHEN value * 0.001 > 0
         |                          AND value * 0.001 < 1
         |               THEN LN(value * 0.001 / (1 - value * 0.001)) END
         |               * 1e6) / 1e6, 6) AS value
         |  FROM u WHERE series = 'events.click'),
         |tick AS (
         |  SELECT 'tick' AS series,
         |         CAST(make_timestamp(e * 1000000) AS VARCHAR) AS bucket,
         |         CAST(e AS DOUBLE) AS value
         |  FROM range(1704067200, 1706745600, 7200) t(e))
         |SELECT * FROM (SELECT * FROM pw UNION ALL SELECT * FROM lg
         |               UNION ALL SELECT * FROM tick)
         |ORDER BY series, bucket""".stripMargin,

    // xff 0.99 over 24 hourly slots: only complete days keep their sum
    "g39_xff" ->
      s"""WITH $U
         |SELECT 'fullday' AS series,
         |       CAST(CAST(date_trunc('day', bucket) AS TIMESTAMP)
         |            AS VARCHAR) AS bucket,
         |       ROUND(CASE WHEN COUNT(value) >= 0.99 * 24
         |             THEN CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
         |                  AS DECIMAL(18,6)) AS DOUBLE) END, 6) AS value
         |FROM u WHERE series = 'events.click'
         |GROUP BY 2 ORDER BY series, bucket""".stripMargin,

    // aggregate's xFilesFactor arg: a bucket averages only when ≥ 0.9
    // of the universe's distinct series report a value there
    "g40_aggxff" ->
      s"""WITH $U,
         |tot AS (SELECT COUNT(DISTINCT series) AS n FROM u)
         |SELECT 'avg90' AS series, CAST(bucket AS VARCHAR) AS bucket,
         |       ROUND(CASE WHEN COUNT(value) >= 0.9 * (SELECT n FROM tot)
         |             THEN ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6)))
         |                  AS DOUBLE) / COUNT(value) * 1e6) / 1e6
         |             END, 6) AS value
         |FROM u GROUP BY 2 ORDER BY series, bucket""".stripMargin,

    "g41_inventory" -> ("SELECT * FROM (VALUES " +
      GraphiteTarget.functionInventory
        .map { case (f, n) => s"('$f', '$n')" }.mkString(", ") +
      ") AS t(family, fn) ORDER BY family, fn"),

    "g42_annotations" ->
      s"""WITH $U,
         |sine AS (
         |  SELECT 'sine' AS series,
         |         CAST(make_timestamp(e * 1000000) AS VARCHAR) AS bucket,
         |         ROUND(ROUND(SIN(CAST(e AS DOUBLE)) * 100 * 1e6) / 1e6,
         |               6) AS value
         |  FROM range(1704067200, 1706745600, 86400) t(e)),
         |vline AS (
         |  SELECT 'deploy' AS series,
         |         CAST(make_timestamp(e * 1000000) AS VARCHAR) AS bucket,
         |         1.0 AS value
         |  FROM range(1704672000, 1704672002, 1) t(e)),
         |ev AS (
         |  SELECT DISTINCT 'events' AS series,
         |         CAST(bucket AS VARCHAR) AS bucket, 1.0 AS value
         |  FROM u WHERE series IN ('events.click', 'events.signup')
         |    AND value IS NOT NULL),
         |lastv AS (
         |  SELECT value AS lv FROM u
         |  WHERE series = 'events.view' AND value IS NOT NULL
         |  ORDER BY bucket DESC LIMIT 1),
         |aq AS (
         |  SELECT printf('click (views last: %d)',
         |           CAST(TRUNC((SELECT lv FROM lastv)) AS BIGINT))
         |           AS series,
         |         CAST(bucket AS VARCHAR) AS bucket,
         |         ROUND(value, 6) AS value
         |  FROM u WHERE series = 'events.click')
         |SELECT * FROM (SELECT * FROM sine UNION ALL SELECT * FROM vline
         |  UNION ALL SELECT * FROM ev UNION ALL SELECT * FROM aq)
         |ORDER BY series, bucket""".stripMargin
  )
}
