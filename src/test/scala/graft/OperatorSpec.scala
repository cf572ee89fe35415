package graft

import graft.core.Time
import graft.operators._
import org.apache.spark.sql.functions._

class OperatorSpec extends SparkTestBase {

  import spark.implicits._

  test("lastWriteWins keeps the highest-seq value per group") {
    val df = Seq(
      ("a", 0L, 1.0, 1L), ("a", 0L, 2.0, 3L), ("a", 0L, 9.0, 2L),
      ("a", 60L, 5.0, 4L), ("b", 0L, 7.0, 5L)
    ).toDF("series_id", "interval", "value", "seq")
    val got = Dedup.lastWriteWins(df, Seq($"series_id", $"interval"), $"seq",
        Seq("value" -> $"value"))
      .orderBy("series_id", "interval")
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("a", 0L, 2.0), ("a", 60L, 5.0), ("b", 0L, 7.0)))
  }

  test("xff gate: >= boundary passes, below fails, mean over known only") {
    // 24 expected hourly points per day; xff 0.5 -> 12 needed
    def hourly(n: Int) = (0 until n).map(h =>
      ("s", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(h * 3600L)), h.toDouble))
      .toDF("series_id", "interval", "value")
    val pass = Rollup.downsample(hourly(12), "series_id", "interval", "value",
      3600, 86400, 0.5).collect()
    assert(pass.length == 1)
    assert(pass.head.getAs[Double]("value") == (0 until 12).sum / 12.0)
    val fail = Rollup.downsample(hourly(11), "series_id", "interval", "value",
      3600, 86400, 0.5).collect()
    assert(fail.isEmpty)
  }

  test("cascade is mean-of-means, not mean-of-raw") {
    // day 1: hourly values 0..23 (mean 11.5); day 2: single hour value 100
    // with xff 0 the weekly mean-of-means = (11.5 + 100) / 2 = 55.75,
    // while mean-of-raw would be (0+..+23+100)/25 = 15.04
    val rows = ((0 until 24).map(h => ("s", ts(h * 3600L), h.toDouble)) :+
      ("s", ts(86400L + 3600L), 100.0))
      .toDF("series_id", "interval", "value")
    val daily = Rollup.downsample(rows, "series_id", "interval", "value",
      3600, 86400, 0.0)
    val weekly = Rollup.downsample(daily, "series_id", "interval", "value",
      86400, 604800, 0.0).collect()
    assert(weekly.length == 1)
    assert(weekly.head.getAs[Double]("value") == 55.75)
  }

  test("consolidation functions: min/max/sum/last (the reference's own TODO)") {
    val rows = Seq(("s", ts(0L), 3.0), ("s", ts(3600L), 1.0), ("s", ts(7200L), 2.0))
      .toDF("series_id", "interval", "value")
    def roll(cf: String) = Rollup.downsample(rows, "series_id", "interval",
      "value", 3600, 86400, 0.0, cf).head().getAs[Double]("value")
    assert(roll("avg") == 2.0)
    assert(roll("min") == 1.0)
    assert(roll("max") == 3.0)
    assert(roll("sum") == 6.0)
    assert(roll("last") == 2.0) // value of the latest finer slot
    intercept[IllegalArgumentException] {
      Rollup.downsample(rows, "series_id", "interval", "value", 3600, 86400, 0.0, "median")
    }
  }

  test("gap-fill emits a dense window with nulls") {
    val values = Seq(("s", ts(3600L), 1.0)).toDF("series_id", "interval", "value")
    val universe = Seq("s").toDF("series_id")
    val got = GapFill.densify(values, universe, "series_id", "interval",
        Seq("value"), 0L, 4 * 3600L, 3600L)
      .orderBy("interval")
      .select("value").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got == Seq(None, Some(1.0), None, None))
  }

  test("as-of returns latest value at or before t, seq tiebreak") {
    val df = Seq(
      ("a", ts(100L), 5L, 1.0), ("a", ts(200L), 6L, 2.0),
      ("a", ts(200L), 7L, 3.0), ("a", ts(300L), 8L, 4.0),
      ("b", ts(400L), 9L, 9.0)
    ).toDF("series_id", "ts", "seq", "value")
    val got = AsOf.latestAtOrBefore(df, "series_id", "ts", "seq", "value",
        timestamp_seconds(lit(250L)))
      .orderBy("series_id")
      .select("series_id", "value").as[(String, Double)].collect().toSeq
    assert(got == Seq(("a", 3.0))) // ties at ts=200 -> seq 7 wins; b excluded
  }

  test("salted aggregation matches the direct groupBy (skew pattern)") {
    val rnd = new scala.util.Random(3)
    val df = (1 to 5000).map { i =>
      // skew: 80% of rows land on one key
      (if (rnd.nextDouble() < 0.8) "hot" else s"k${rnd.nextInt(5)}",
        rnd.nextInt(100).toDouble)
    }.toDF("k", "v")
    val salted = Skew.saltedStats(df, Seq("k"), "v", buckets = 8)
      .select("k", "sum_value", "n", "min_value", "max_value")
      .as[(String, Double, Long, Double, Double)].collect().toMap0
    val direct = df.groupBy($"k").agg(sum($"v"), count($"v"), min($"v"), max($"v"))
      .as[(String, Double, Long, Double, Double)].collect().toMap0
    assert(salted == direct) // integer-valued doubles: sums exact
  }

  test("SeriesFold EMA == sequential per-series fold, any partitioning") {
    // deterministic pseudo-random series via an LCG; shuffled input
    // order + forced repartition so the group-side sort is load-bearing
    var x = 12345L
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); x }
    val rows = for (s <- Seq("a", "b", "c"); i <- 0 until 200) yield
      (s, i * 3600L, ((next() >>> 11) % 10000) / 100.0)
    val shuffled = scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle(rows)
    val df = shuffled.toDF("series_id", "bucket", "value")
      .withColumn("bucket", timestamp_seconds($"bucket"))
      .repartition(7)
    val got = SeriesFold
      .exponentialMovingAverage(df, "series_id", "bucket", "value", 0.25)
      .select($"series_id", $"bucket".cast("long"), $"ema")
      .as[(String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val want = rows.groupBy(_._1).flatMap { case (s, pts) =>
      var e = 0.0; var first = true
      pts.sortBy(_._2).map { case (_, b, v) =>
        e = if (first) { first = false; v } else 0.25 * v + 0.75 * e
        (s, b) -> e
      }
    }
    assert(got.size == want.size)
    // bit-exact: same IEEE op sequence on both sides
    want.foreach { case (k, v) => assert(got(k) == v, s"at $k") }
  }

  test("SeriesFold Holt == sequential level+trend recurrence, bit-exact") {
    var x = 98765L
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); x }
    val rows = for (s <- Seq("a", "b"); i <- 0 until 150) yield
      (s, i * 3600L, ((next() >>> 11) % 10000) / 100.0)
    val df = scala.util.Random.javaRandomToRandom(new java.util.Random(5))
      .shuffle(rows).toDF("series_id", "bucket", "value")
      .withColumn("bucket", timestamp_seconds($"bucket"))
      .repartition(6)
    val got = SeriesFold
      .holtLinear(df, "series_id", "bucket", "value", alpha = 0.5, beta = 0.25)
      .select($"series_id", $"bucket".cast("long"), $"level", $"trend", $"forecast")
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val want = rows.groupBy(_._1).flatMap { case (s, pts) =>
      var l = 0.0; var b = 0.0; var first = true
      pts.sortBy(_._2).map { case (_, bkt, v) =>
        if (first) { first = false; l = v; b = 0.0 }
        else { val ln = 0.5 * v + 0.5 * (l + b); b = 0.25 * (ln - l) + 0.75 * b; l = ln }
        (s, bkt) -> ((l, b, l + b))
      }
    }
    assert(got.size == want.size)
    want.foreach { case (k, v) => assert(got(k) == v, s"at $k") }
  }

  test("SeriesFold seasonal Holt-Winters == sequential recurrence, bit-exact") {
    var x = 24681L
    def next(): Long = { x = (x * 6364136223846793005L + 1442695040888963407L); x }
    // 150 points per series over a 24-slot season: 6+ full periods so
    // the seasonal indices move well away from their zero cold start
    val rows = for (s <- Seq("a", "b"); i <- 0 until 150) yield
      (s, i * 3600L, ((next() >>> 11) % 10000) / 100.0)
    val df = scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .shuffle(rows).toDF("series_id", "bucket", "value")
      .withColumn("bucket", timestamp_seconds($"bucket"))
      .repartition(6)
    val got = SeriesFold
      .holtWinters(df, "series_id", "bucket", "value",
        alpha = 0.5, beta = 0.25, gamma = 0.25, period = 24)
      .select($"series_id", $"bucket".cast("long"),
        $"level", $"trend", $"season", $"forecast")
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    val want = rows.groupBy(_._1).flatMap { case (s, pts) =>
      var l = 0.0; var b = 0.0; var t = 0
      val sz = Array.fill(24)(0.0)
      pts.sortBy(_._2).map { case (_, bkt, v) =>
        val idx = t % 24
        if (t == 0) { l = v; b = 0.0 }
        else {
          val ln = 0.5 * (v - sz(idx)) + 0.5 * (l + b)
          b = 0.25 * (ln - l) + 0.75 * b
          sz(idx) = 0.25 * (v - ln) + 0.75 * sz(idx)
          l = ln
        }
        t += 1
        (s, bkt) -> ((l, b, sz(idx), l + b + sz(t % 24)))
      }
    }
    assert(got.size == want.size)
    want.foreach { case (k, v) => assert(got(k) == v, s"at $k") }
    // seasonality engaged: some season index is materially non-zero
    assert(got.values.exists(v => math.abs(v._3) > 1.0))
  }

  test("SeriesFold EMA is arrival-order-independent under bucket collisions") {
    // two rows share a bucket: the secondary value sort key must make
    // the fold identical no matter how the duplicates arrive
    val base = Seq(("a", 0L, 5.0), ("a", 3600L, 2.0), ("a", 3600L, 9.0),
      ("a", 7200L, 4.0), ("a", 7200L, 4.0), ("a", 10800L, 1.0))
    def run(rows: Seq[(String, Long, Double)], parts: Int) = SeriesFold
      .exponentialMovingAverage(
        rows.toDF("series_id", "bucket", "value")
          .withColumn("bucket", timestamp_seconds($"bucket"))
          .repartition(parts),
        "series_id", "bucket", "value", 0.25)
      .select($"series_id", $"bucket".cast("long"), $"ema")
      .as[(String, Long, Double)].collect().sortBy(r => (r._1, r._2, r._3))
      .toSeq
    val a = run(base, 1)
    val b = run(base.reverse, 5)
    val c = run(scala.util.Random.javaRandomToRandom(
      new java.util.Random(3)).shuffle(base), 3)
    assert(a == b && a == c)
  }

  private implicit class Tup5Map(rows: Array[(String, Double, Long, Double, Double)]) {
    def toMap0: Map[String, (Double, Long, Double, Double)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  private def ts(epoch: Long) =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(epoch))

  test("h24 nPercentile == sequential k-th-smallest mirror on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val raw = Tables.load(spark, dir, "events")
      .select("event_type", "ts", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toInstant,
        r.getLong(2), r.getDouble(3)))
    val lww = raw.groupBy { case (t, i, _, _) =>
        (t, i.getEpochSecond / 3600 * 3600)
      }
      .map { case ((t, h), rows) => (t, h / 86400 * 86400, rows.maxBy(_._3)._4) }
    val expected = lww.groupBy { case (t, d, _) => (t, d) }
      .map { case ((t, d), rows) =>
        val vs = rows.map(_._3).toSeq.sorted
        val k = (vs.size * 19 + 19) / 20
        val day = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
          .withZone(java.time.ZoneOffset.UTC)
          .format(java.time.Instant.ofEpochSecond(d))
        (t, day, vs.size.toLong, vs(k - 1))
      }.toSet
    val got = SparkEntry.queries("h24_npercentile")(spark, dir)
      .select("event_type", "day", "n", "p95").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == expected, "h24 p95 diverged from the k-th-smallest mirror")
  }

  test("h23 z-band == sequential BigInt mirror on sf0.001 (all rows)") {
    // the anomaly predicate is integer-exact by construction, so a
    // sequential replay (lww by hour, trailing-24 window, BigInt
    // (n*v-S)^2 > 4*(n*S2-S^2)) must agree on EVERY row
    val dir = "/root/testdata/sf0.001"
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    val raw = Tables.load(spark, dir, "events")
      .select("event_type", "ts", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toInstant,
        r.getLong(2), r.getDouble(3)))
    val lww = raw.groupBy { case (t, i, _, _) =>
        (t, i.getEpochSecond / 3600 * 3600)
      }
      .map { case ((t, h), rows) => (t, h, rows.maxBy(_._3)._4) }.toSeq
    val expected = lww.groupBy(_._1).flatMap { case (typ, rows) =>
      val series = rows.sortBy(_._2).toIndexedSeq
      series.zipWithIndex.map { case ((_, h, v), i) =>
        val win = series.slice(math.max(0, i - 23), i + 1)
        val vis = win.map { case (_, _, wv) =>
          BigInt((BigDecimal(wv).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            * 1000000).toBigIntExact.get.toLong)
        }
        val n = BigInt(vis.size); val s = vis.sum
        val s2 = vis.map(x => x * x).sum
        val vi = vis.last
        val lhs = (n * vi - s) * (n * vi - s)
        val flag = vis.size >= 12 && lhs > 4 * (n * s2 - s * s)
        (typ, fmt.format(java.time.Instant.ofEpochSecond(h)),
          vis.size.toLong, flag)
      }
    }.toSet
    val got = SparkEntry.queries("h23_zband")(spark, dir)
      .select("event_type", "bucket", "n", "anomaly").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(got == expected, "h23 z-band diverged from the BigInt mirror")
    // the band must actually separate: some rows flag, most do not
    assert(got.exists(_._4) && got.count(_._4) * 4 < got.size)
  }

  test("h27 linreg == sequential BigInt least-squares mirror on sf0.001") {
    // every sum is an exact integer and each output is two IEEE
    // divisions on identical operands, so a sequential BigInt replay
    // must agree on EVERY row at full declared precision
    val dir = "/root/testdata/sf0.001"
    def r6(x: Double): Double =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP)
        .toDouble / 1e6
    val raw = Tables.load(spark, dir, "events")
      .select("event_type", "ts", "event_id", "value").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toInstant,
        r.getLong(2), r.getDouble(3)))
    val lww = raw.groupBy { case (t, i, _, _) =>
        (t, i.getEpochSecond / 3600 * 3600)
      }
      .map { case ((t, h), rows) => (t, h, rows.maxBy(_._3)._4) }.toSeq
    val expected = lww.groupBy { case (t, h, _) => (t, h / 86400 * 86400) }
      .filter(_._2.size >= 2)
      .map { case ((typ, day), rows) =>
        val pts = rows.map { case (_, h, v) =>
          (BigInt(h % 86400 / 3600),
            BigInt((BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              * 1000000).toBigIntExact.get.toLong))
        }
        val n = BigInt(pts.size)
        val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
        val sxx = pts.map(p => p._1 * p._1).sum
        val sxy = pts.map(p => p._1 * p._2).sum
        val den = n * sxx - sx * sx
        val snum = n * sxy - sx * sy
        val inum = sy * sxx - sx * sxy
        (typ, java.time.LocalDate.ofEpochDay(day / 86400).toString,
          pts.size.toLong,
          r6(snum.toDouble / den.toDouble / 1e6),
          r6(inum.toDouble / den.toDouble / 1e6),
          r6((inum + 23 * snum).toDouble / den.toDouble / 1e6))
      }.toSet
    val got = SparkEntry.queries("h27_linreg")(spark, dir)
      .select("event_type", "day", "n", "slope", "intercept", "predict_eod")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    assert(got == expected, "h27 linreg diverged from the BigInt mirror")
    // the fit must actually move: slopes of both signs somewhere
    assert(got.exists(_._4 > 0) && got.exists(_._4 < 0))
  }
}
