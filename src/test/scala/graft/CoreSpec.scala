package graft

import graft.core.{Archive, ArchivePolicy, Time}

class CoreSpec extends SparkTestBase {

  test("archive policy validates like Whisper intends") {
    val p = ArchivePolicy(Seq(Archive(86400, 1095), Archive(3600, 8760)))
    assert(p.sorted.map(_.step) == Seq(3600, 86400)) // sorted finest-first
    assert(p.maxRetention == 94608000L)              // golden from test/hoard.test.coffee:16-32
    intercept[IllegalArgumentException] {
      ArchivePolicy(Seq(Archive(3600, 10), Archive(5000, 100))) // not a multiple
    }
    intercept[IllegalArgumentException] {
      ArchivePolicy(Seq(Archive(3600, 100), Archive(7200, 10))) // shrinking retention
    }
    intercept[IllegalArgumentException] { ArchivePolicy(Nil) }
    intercept[IllegalArgumentException] {
      ArchivePolicy(Seq(Archive(60, 10)), xff = 1.5)
    }
  }

  test("age routing picks finest covering archive (retention >= age)") {
    val p = ArchivePolicy.referenceTest // 1h x 1y + 1d x 3y
    assert(p.forAge(0).contains(Archive(3600, 8760)))
    assert(p.forAge(31536000L).contains(Archive(3600, 8760)))     // == boundary stays fine
    assert(p.forAge(31536001L).contains(Archive(86400, 1095)))    // one past -> daily
    assert(p.forAge(94608000L).contains(Archive(86400, 1095)))
    assert(p.forAge(94608001L).isEmpty)                           // older than everything
  }

  test("fetch window bump math matches the reference golden") {
    // golden: fetch(1311161605, 1311179605) at spp=3600 ->
    // [1311163200, 1311181200, 3600], 5 slots (test/hoard.test.coffee:44-46)
    val from = Time.bumpEpoch(1311161605L, 3600)
    val to = Time.bumpEpoch(1311179605L, 3600)
    assert(from == 1311163200L && to == 1311181200L)
    assert((to - from) / 3600 == 5)
  }

  test("align floors to step (floored modulo, idempotent)") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1).select(
      Time.alignEpoch(lit(1311161605L), 3600).as("a"),
      Time.alignEpoch(lit(-5L), 3600).as("neg"))
    val r = df.head()
    assert(r.getLong(0) == 1311159600L)
    assert(r.getLong(1) == -3600L) // true floor for negatives, like ts.mod patch
    assert(Time.bumpEpoch(Time.bumpEpoch(0L, 60) - 60, 60) == 60L)
  }
}
