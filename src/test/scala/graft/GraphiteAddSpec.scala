package graft

import graft.queries.HoardQueries
import org.apache.spark.sql.functions._

/** Gates for the round-6 fifth-session Graphite-function additions:
  * threshold series filters (h38), plain derivative/delay/changed (h39)
  * and linear gap interpolation (h40).
  */
class GraphiteAddSpec extends SparkTestBase {

  private val Sf = "/root/testdata/sf0.001"

  // hourly lww mirror: (series, bucketEpochSec) -> value
  private def hourlyMirror(keyCol: String): Map[(String, Long), Double] = {
    Tables.load(spark, Sf, "events")
      .select(col(keyCol).cast("string").as("k"),
        unix_seconds(date_trunc("hour", col("ts"))).as("b"),
        col("event_id"), col("value"))
      .collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .view.mapValues(_.maxBy(_.getLong(2)).getDouble(3)).toMap
  }

  test("h38: flags replay an exact BigDecimal mirror and discriminate") {
    val rows = HoardQueries.defs("h38_seriesfilter")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val h = hourlyMirror("event_type")
    val bySeries = h.groupBy(_._1._1)
    rows.foreach { r =>
      val s = r.getString(0)
      val vs = bySeries(s)
      val sum = vs.values.map(v => BigDecimal(v).setScale(6)).sum
      val n = vs.size
      assert(r.getLong(1) == n.toLong)
      assert(r.getLong(5) == (if (sum > BigDecimal(49 * n)) 1L else 0L),
        s"avg_above($s)")
      assert(r.getLong(6) == (if (vs.values.max > 250.0) 1L else 0L),
        s"max_above($s)")
      val cur = vs.maxBy(_._1._2)._2
      assert(r.getLong(7) == (if (cur > 15.0) 1L else 0L), s"cur_above($s)")
    }
    // the gates must actually discriminate on the fixture: each flag
    // column sees both outcomes across the surviving series
    def col7(i: Int) = rows.map(_.getLong(i)).toSet
    assert((col7(5) ++ col7(6) ++ col7(7)).contains(0L) &&
      (col7(5) ++ col7(6) ++ col7(7)).contains(1L),
      "thresholds must split the series set somewhere")
  }

  test("h39: deriv/delay/changed replay a sequential lag mirror") {
    val rows = HoardQueries.defs("h39_changed")(spark, Sf).collect()
    val h = hourlyMirror("event_type")
    val series = h.toSeq.groupBy(_._1._1)
      .view.mapValues(_.sortBy(_._1._2).map(_._2).toVector).toMap
    val bySeriesRows = rows.groupBy(_.getString(0))
    series.foreach { case (s, vs) =>
      val rs = bySeriesRows(s).sortBy(_.getString(1))
      assert(rs.length == vs.length)
      // head: all three null
      assert(rs.head.isNullAt(3) && rs.head.isNullAt(4) && rs.head.isNullAt(5))
      (1 until vs.length).foreach { i =>
        val d = (BigDecimal(vs(i)).setScale(6) -
          BigDecimal(vs(i - 1)).setScale(6)).toDouble
        assert(rs(i).getDouble(4) == d, s"deriv($s,$i)")
        assert(rs(i).getLong(5) == (if (vs(i) != vs(i - 1)) 1L else 0L))
      }
    }
    // the plain derivative must actually go negative somewhere (the
    // semantic h9's nonNegativeDerivative suppresses)
    assert(rows.exists(r => !r.isNullAt(4) && r.getDouble(4) < 0))
  }

  test("h41: top-3 by lifetime max, aliases follow the regex contract") {
    val rows = HoardQueries.defs("h41_aliassub")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val h = hourlyMirror("event_type")
    val maxBySeries = h.groupBy(_._1._1).view.mapValues(_.values.max).toMap
    val expectTop = maxBySeries.toSeq.sortBy { case (s, m) => (-m, s) }
      .take(3).map(_._1).toSet
    assert(rows.map(_.getString(1)).toSet == expectTop,
      "survivors must be the top-3 series by max")
    rows.foreach { r =>
      assert(r.getString(0) == "alias_" + r.getString(1).take(2))
      assert(r.getDouble(4) ==
        BigDecimal(maxBySeries(r.getString(1))).setScale(6).toDouble)
    }
  }

  test("h42: rescalings replay a BigDecimal mirror; flat series null") {
    val rows = HoardQueries.defs("h42_normalize")(spark, Sf).collect()
    val h = hourlyMirror("event_type")
    val bySeries = h.groupBy(_._1._1)
    rows.foreach { r =>
      val vs = bySeries(r.getString(0)).values
      val (mn, mx) = (vs.min, vs.max)
      val v = h((r.getString(0), java.sql.Timestamp.valueOf(
        r.getString(1)).toInstant.getEpochSecond))
      val off = (BigDecimal(v).setScale(6) - BigDecimal(mn).setScale(6))
        .toDouble
      assert(r.getDouble(3) == off, "offset_to_zero")
      val den = (BigDecimal(mx).setScale(6) - BigDecimal(mn).setScale(6))
        .toDouble
      assert(r.getDouble(4) == math.round(off / den * 1e6) / 1e6, "minmax")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    // flat series: minmax must null, offset must zero
    import spark.implicits._
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L,
        "flat", 5.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 1L,
        "flat", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("h42")
    ev.write.parquet(s"$dir/events.parquet")
    val flat = HoardQueries.defs("h42_normalize")(spark, dir).collect()
    assert(flat.length == 2 &&
      flat.forall(r => r.isNullAt(4) && r.getDouble(3) == 0.0))
  }

  test("h43: across-series percentiles replay an order-statistic mirror") {
    val rows = HoardQueries.defs("h43_pctseries")(spark, Sf).collect()
    val h = hourlyMirror("event_type")
    val byBucket = h.groupBy(_._1._2)
    rows.foreach { r =>
      val t = java.sql.Timestamp.valueOf(r.getString(0))
        .toInstant.getEpochSecond
      val vs = byBucket(t).values.toSeq.sorted
      val n = vs.length
      assert(r.getLong(1) == n.toLong)
      assert(r.getDouble(2) ==
        BigDecimal(vs((n + 1) / 2 - 1)).setScale(6).toDouble, "p50")
      assert(r.getDouble(3) ==
        BigDecimal(vs((n * 19 + 19) / 20 - 1)).setScale(6).toDouble, "p95")
      assert(r.getDouble(2) <= r.getDouble(3))
    }
  }

  test("h44: top-3 by variance replays an exact BigInt mirror") {
    val rows = HoardQueries.defs("h44_mostdeviant")(spark, Sf).collect()
    val h = hourlyMirror("event_type")
    val stats = h.groupBy(_._1._1).map { case (s0, m) =>
      val vi = m.values.map(v =>
        BigInt((BigDecimal(v).setScale(6) * 1000000).toBigInt.toLong))
      val n = vi.size
      val varNum = n * vi.map(x => x * x).sum - vi.sum * vi.sum
      val variance = varNum.toDouble / (n.toLong * n).toDouble / 1e12
      s0 -> (n, math.round(variance * 1e6) / 1e6, variance)
    }
    val expectTop = stats.toSeq.sortBy { case (s0, (_, _, v)) => (-v, s0) }
      .take(3).map(_._1).toSet
    assert(rows.map(_.getString(0)).toSet == expectTop)
    rows.foreach { r =>
      val (n, vr, _) = stats(r.getString(0))
      assert(r.getLong(3) == n.toLong && r.getDouble(4) == vr)
    }
  }

  test("h45: a stale as-of match nulls out; a fresh one attributes") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s0: String) = Timestamp.valueOf(s0)
    val ev = Seq(
      // user 1: click 30 min before purchase -> attributes, gap 30m
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 7.0, "{}"),
      (2L, ts("2024-01-01 10:30:00"), 1L, "purchase", 1.0, "{}"),
      // user 2: click 2 h before purchase -> STALE, nulls out
      (3L, ts("2024-01-01 08:00:00"), 2L, "click", 9.0, "{}"),
      (4L, ts("2024-01-01 10:00:00"), 2L, "purchase", 1.0, "{}"),
      // user 3: no click at all
      (5L, ts("2024-01-01 10:00:00"), 3L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("h45")
    ev.write.parquet(s"$dir/events.parquet")
    val out = HoardQueries.defs("h45_asoftol")(spark, dir).collect()
      .map(r => r.getLong(1) ->
        (if (r.isNullAt(2)) None else Some((r.getDouble(2), r.getLong(3)))))
      .toMap
    assert(out(1L).contains((7.0, 1800000000L)), s"fresh match: $out")
    assert(out(2L).isEmpty, "stale click must not attribute")
    assert(out(3L).isEmpty, "no click, no attribution")
  }

  test("h46: buckets anchor at from (off the epoch grid); mass conserved") {
    val rows = HoardQueries.defs("h46_smartsummarize")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val from = 1704090600L
    rows.foreach { r =>
      val b = r.getLong(1)
      assert((b - from) % 14400 == 0, "bucket off the from-anchored grid")
      assert(b % 14400 != 0, "anchor must be visibly off the epoch grid")
      assert(b >= from)
    }
    // mass conservation: summed points = hourly slots at/after from
    val h = hourlyMirror("event_type")
    val expected = h.count { case ((_, t), _) => t >= from }
    assert(rows.map(_.getLong(2)).sum == expected.toLong)
  }

  test("h40: interior gaps interpolate linearly; edges stay null") {
    val rows = HoardQueries.defs("h40_interpolate")(spark, Sf).collect()
    val h = hourlyMirror("user_id")
    val from = 1704412800L; val until = 1704585600L
    var interiorFills = 0; var edgeNulls = 0
    rows.groupBy(_.get(0).toString).foreach { case (u, rs0) =>
      val rs = rs0.sortBy(_.getString(1))
      val slots = (from until until by 3600L).toVector
      assert(rs.length == slots.length)
      val known = slots.zipWithIndex.filter { case (t, _) =>
        h.contains((u, t))
      }
      slots.zipWithIndex.foreach { case (t, i) =>
        val r = rs(i)
        h.get((u, t)) match {
          case Some(v) =>
            assert(r.getDouble(3) == BigDecimal(v).setScale(6).toDouble)
          case None =>
            val prev = known.filter(_._2 < i).lastOption
            val next = known.find(_._2 > i)
            (prev, next) match {
              case (Some((t0, _)), Some((t1, _))) =>
                val v0 = BigDecimal(h((u, t0))).setScale(6) * 1000000
                val v1 = BigDecimal(h((u, t1))).setScale(6) * 1000000
                val num = (v0 * BigDecimal(t1 - t) + v1 * BigDecimal(t - t0))
                  .toBigInt.toLong
                val exp = Math.round(num.toDouble / (t1 - t0).toDouble) / 1e6
                assert(r.getDouble(3) == exp, s"interp($u,$t)")
                interiorFills += 1
              case _ =>
                assert(r.isNullAt(3), s"edge($u,$t) must stay null")
                edgeNulls += 1
            }
        }
      }
    }
    assert(interiorFills > 0, "fixture must exercise interior gaps")
    assert(edgeNulls > 0, "fixture must exercise unfillable edges")
  }
}
