package graft

import graft.core.Time
import graft.operators.{Dedup, GapFill, Rollup}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property-style tests (SURVEY §5.4.3): randomized seeded cases checked
  * against pure in-memory mirrors. Cases are batched into single Spark
  * jobs (tagged by case id) so 100+ properties cost one job each.
  */
class PropertySpec extends SparkTestBase {

  import spark.implicits._

  test("alignment: idempotent, floor, within-step (1000 random cases)") {
    val rnd = new Random(42)
    val steps = Seq(1L, 60L, 1800L, 3600L, 86400L)
    (1 to 1000).foreach { _ =>
      val t = rnd.between(-5000000000L, 5000000000L)
      val step = steps(rnd.nextInt(steps.size))
      val a = t - java.lang.Math.floorMod(t, step)
      assert(a <= t && t - a < step && a % step == 0)
      assert(a - java.lang.Math.floorMod(a, step) == a) // idempotent
      assert(Time.bumpEpoch(t, step) == a + step)
    }
  }

  test("dedup == last-by-seq mirror (40 random batched cases)") {
    val rnd = new Random(7)
    val rows = for {
      c <- 0 until 40
      _ <- 0 until rnd.between(1, 30)
    } yield (c, s"s${rnd.nextInt(3)}", rnd.nextInt(5).toLong, rnd.nextDouble(), rnd.nextLong())
    val distinctSeq = rows.groupBy(r => (r._1, r._2, r._3, r._5)).size == rows.size
    val data = if (distinctSeq) rows else rows.zipWithIndex.map { case (r, i) => r.copy(_5 = i.toLong) }
    val df = data.toDF("case_id", "series_id", "interval", "value", "seq")
    val got = Dedup.lastWriteWins(df,
        Seq($"case_id", $"series_id", $"interval"), $"seq", Seq("value" -> $"value"))
      .as[(Int, String, Long, Double)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    val want = data.groupBy(r => (r._1, r._2, r._3))
      .view.mapValues(_.maxBy(_._5)._4).toMap
    assert(got == want)
  }

  test("rollup cascade == mean-of-means mirror incl. xff gate (30 cases)") {
    val rnd = new Random(13)
    val rows = for {
      c <- 0 until 30
      _ <- 0 until rnd.between(1, 60)
    } yield (c, "s",
      rnd.between(0L, 3L * 86400) / 3600 * 3600, // random hour in 3 days
      rnd.between(0, 1000).toDouble)
    val data = rows.distinct
    val df = data.map { case (c, s0, iv, v) =>
      (c, s0, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(iv)), v)
    }.toDF("case_id", "series_id", "interval", "value")
    val xff = 0.25
    val got = Rollup.downsample(df, "series_id", "interval", "value",
        3600, 86400, xff)
      // case_id survives grouping only if included: regroup manually
    val got2 = df.groupBy($"case_id", $"series_id",
        Time.align($"interval", 86400).as("interval"))
      .agg(avg($"value").as("value"), count($"value").as("known"))
      .where($"known" / lit(24.0) >= xff)
      .select($"case_id", $"interval".cast("long").as("day"), $"value")
      .as[(Int, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val want = data.groupBy(r => (r._1, r._3 / 86400 * 86400))
      .collect { case ((c, day), rs) if rs.size / 24.0 >= xff =>
        (c, day) -> rs.map(_._4).sum / rs.size
      }.toMap
    assert(got2.keySet == want.keySet)
    got2.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-9) }
    assert(got.columns.toSeq == Seq("series_id", "interval", "value"))
  }

  test("gap-fill density: always (to-from)/step rows per series (20 cases)") {
    val rnd = new Random(99)
    (1 to 20).foreach { _ =>
      val step = Seq(60L, 3600L)(rnd.nextInt(2))
      val from = rnd.between(0L, 1000L) * step
      val slots = rnd.between(1, 50)
      val to = from + slots * step
      val nSeries = rnd.between(1, 4)
      val universe = (0 until nSeries).map(i => s"s$i").toDF("series_id")
      val values = Seq(("s0",
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(from)), 1.0))
        .toDF("series_id", "interval", "value")
      val n = GapFill.densify(values, universe, "series_id", "interval",
        Seq("value"), from, to, step).count()
      assert(n == slots.toLong * nSeries)
    }
  }
}
