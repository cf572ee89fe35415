package graft

import graft.core.ArchivePolicy
import graft.store.HoardStore
import graft.streaming.StreamIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkTestBase {

  test("streaming micro-batches feed the store upsert + cascade") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val now = 1312502906L
    val store = HoardStore.create(spark, tmpDir("stream") + "/store",
      ArchivePolicy.referenceTest)

    val mem = MemoryStream[(String, Long, Double)]
    val stream = mem.toDF().toDF("series_id", "ts", "value")
    // AvailableNow snapshots availability at start: data must be queued
    // BEFORE the query starts or the single planned batch may miss it
    mem.addData(("cpu", now - 7200, 1.0), ("cpu", now - 7200 + 60, 2.0),
      ("mem", now - 3600, 9.0))
    val q = StreamIngest.start(stream, store, () => now,
      tmpDir("stream-ckpt"))
    q.awaitTermination(120000)

    val (_, cpu) = store.fetchValues("cpu", now - 10800, now, now)
    assert(cpu.flatten == Seq(2.0)) // within-batch last-write-wins held
    val (_, memV) = store.fetchValues("mem", now - 10800, now, now)
    assert(memV.flatten == Seq(9.0))
  }

  test("flatMapGroupsWithState sessionization closes sessions across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val sessions = StreamIngest.sessionize(mem.toDS(), gapSec = 1000)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions_out").start()
    // batch 1: two points 100s apart, then a gap > 1000s -> closes one
    mem.addData(("cpu", 0L, 1.0), ("cpu", 100L, 2.0), ("cpu", 2000L, 5.0))
    q.processAllAvailable()
    // batch 2: another gap -> closes the (2000) session; state crossed batches
    mem.addData(("cpu", 10000L, 7.0))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT start, end, n, sum FROM sessions_out ORDER BY start").collect()
    q.stop()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      == Seq((0L, 100L, 2L, 3.0), (2000L, 2000L, 1L, 5.0)))
  }

  test("sessionize absorbs a late cross-batch point without regressing bounds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    val sessions = StreamIngest.sessionize(mem.toDS(), gapSec = 1000)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("late_sessions").start()
    mem.addData(("cpu", 0L, 1.0), ("cpu", 100L, 2.0))
    q.processAllAvailable()
    // late point (50) merges without dragging `last` back; 1090 is still
    // within gap of the true last (100); 5000 closes the session
    mem.addData(("cpu", 50L, 3.0), ("cpu", 1090L, 4.0), ("cpu", 5000L, 9.0))
    q.processAllAvailable()
    // a straggler gap-separated from the open session's start becomes its
    // own closed single-point island, not a merge
    mem.addData(("cpu", 2500L, 8.0))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT start, end, n, sum FROM late_sessions ORDER BY start").collect()
    q.stop()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      == Seq((0L, 1090L, 4L, 10.0), (2500L, 2500L, 1L, 8.0)))
  }

  test("gap-separated stragglers in different batches coalesce within the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Double)]
    // horizon 10000 >> gap 1000: stragglers stay mergeable in state
    val sessions = StreamIngest.sessionize(mem.toDS(), gapSec = 1000,
      horizonSec = 10000)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("straggler_sessions").start()
    mem.addData(("cpu", 0L, 1.0), ("cpu", 5000L, 2.0))
    q.processAllAvailable()
    // two stragglers from the SAME earlier island, in different batches
    mem.addData(("cpu", 2400L, 3.0))
    q.processAllAvailable()
    mem.addData(("cpu", 2600L, 4.0))
    q.processAllAvailable()
    // advance the clock far enough to close everything before 10000
    mem.addData(("cpu", 20000L, 9.0))
    q.processAllAvailable()
    val rows = spark.sql(
      "SELECT start, end, n, sum FROM straggler_sessions ORDER BY start").collect()
    q.stop()
    // the stragglers merged into ONE session (2400-2600), not two
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      == Seq((0L, 0L, 1L, 1.0), (2400L, 2600L, 2L, 7.0), (5000L, 5000L, 1L, 2.0)))
  }

  test("watermarked hourly streaming aggregate (declarative ingress)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp, Double)]
    val stream = mem.toDF().toDF("series_id", "ts", "value")
    val agg = StreamIngest.hourlyAggregates(stream)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("hourly_agg").start()
    def t(e: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(e))
    mem.addData(("cpu", t(3600), 1.0), ("cpu", t(3660), 3.0), ("cpu", t(7200), 5.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT series_id, bucket, n, mean_value FROM hourly_agg ORDER BY bucket")
      .collect()
    q.stop()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n") == 2 && rows(0).getAs[Double]("mean_value") == 2.0)
    assert(rows(1).getAs[Long]("n") == 1)
  }
}
