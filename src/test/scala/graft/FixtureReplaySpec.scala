package graft

import graft.core.ArchivePolicy
import graft.store.HoardStore
import graft.store.HoardStore.RawPoint

/** End-to-end replay of the reference's own test fixture
  * (test/timeseriesdata.json, 57,600 points) under the pinned clock the
  * reference used, asserting the golden fetch from
  * test/hoard.test.coffee:121-130 — the last-write-wins values per
  * hourly interval.
  */
class FixtureReplaySpec extends SparkTestBase {

  test("full fixture replay reproduces the reference goldens") {
    val raw = java.nio.file.Files.readString(
      java.nio.file.Paths.get("/root/reference/test/timeseriesdata.json"))
    val points = raw.trim.stripPrefix("[[").stripSuffix("]]").split("\\],\\s*\\[")
      .map { pair =>
        val Array(ts, v) = pair.split(",")
        RawPoint("series", ts.trim.toLong, v.trim.toDouble)
      }.toSeq
    assert(points.size == 57600)

    val now = 1312502906L // test/hoard.test.coffee:117
    val store = HoardStore.create(spark, tmpDir("fixture") + "/store",
      ArchivePolicy.referenceTest)
    store.updateMany(points, now)

    // golden fetch (test/hoard.test.coffee:121-130)
    val (ti, vals) = store.fetchValues("series", 1311277105L, 1311295105L, now)
    assert(ti == HoardStore.TimeInfo(1311278400L, 1311296400L, 3600L))
    assert(vals.map(_.get) == Seq(1043.0, 3946.0, 1692.0, 899.0, 2912.0))

    // window-math golden from the large.whisper test (values there come
    // from an unpublished source series; the window contract is ours to keep)
    val (ti2, vals2) = store.fetchValues("series", 1311161605L, 1311179605L, now)
    assert(ti2 == HoardStore.TimeInfo(1311163200L, 1311181200L, 3600L))
    assert(vals2.size == 5)

    // propagation cross-check: daily value for one fully-covered day must
    // equal the mean of that day's hourly last-write-wins values
    import org.apache.spark.sql.functions._
    val day = 1311292800L // 2011-07-22 UTC
    val hourly = store.readLevel(ArchivePolicy.referenceTest.sorted.head)
      .where(col("interval") >= timestamp_seconds(lit(day)) &&
        col("interval") < timestamp_seconds(lit(day + 86400)))
      .agg(avg("value")).head().getDouble(0)
    val daily = store.readLevel(ArchivePolicy.referenceTest.sorted.last)
      .where(col("interval") === timestamp_seconds(lit(day)))
      .head().getAs[Double]("value")
    assert(math.abs(hourly - daily) < 1e-9)
  }
}
