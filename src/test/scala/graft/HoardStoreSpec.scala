package graft

import graft.core.{Archive, ArchivePolicy}
import graft.store.HoardStore
import graft.store.HoardStore.RawPoint

/** Store-level contract tests — each maps to a SURVEY §2.2 item or a
  * §2.3 fix-by-intent.
  */
class HoardStoreSpec extends SparkTestBase {

  private val policy = ArchivePolicy.referenceTest // 1h x 1y + 1d x 3y
  private val now = 1312502906L                    // pinned, test/hoard.test.coffee:117

  private def freshStore() =
    HoardStore.create(spark, tmpDir("hoard") + "/store", policy)

  test("create rejects an existing store; info reads the catalog back") {
    val s = freshStore()
    intercept[IllegalStateException] {
      HoardStore.create(spark, s.root, policy)
    }
    val p = HoardStore.info(spark, s.root)
    assert(p.sorted == policy.sorted && p.xff == 0.5 && p.maxRetention == 94608000L)
  }

  test("update + fetch roundtrip with interval alignment") {
    val s = freshStore()
    val t = now - 7200
    s.update("cpu", 42.5, t, now)
    val (ti, vals) = s.fetchValues("cpu", t - 3600, t + 3600, now)
    assert(ti.step == 3600)
    assert(vals.flatten == Seq(42.5))
  }

  test("last write wins within an interval (contract 2.2.2)") {
    val s = freshStore()
    val t = now - 7200
    s.update("cpu", 1.0, t, now)
    s.update("cpu", 2.0, t + 60, now) // same hourly slot, later write
    val (_, vals) = s.fetchValues("cpu", t - 3600, t + 3600, now)
    assert(vals.flatten == Seq(2.0))
  }

  test("single update propagates to lower archives (B2 fixed)") {
    val s = freshStore()
    val dayStart = (now - 200000) / 86400 * 86400
    // 12 hourly points = exactly xff 0.5 of 24 -> daily value written
    (0 until 12).foreach(h => s.updateMany(Seq(RawPoint("cpu", dayStart + h * 3600, h.toDouble)), now))
    val daily = s.readLevel(Archive(86400, 1095))
      .where(org.apache.spark.sql.functions.col("series_id") === "cpu").collect()
    assert(daily.length == 1)
    assert(daily.head.getAs[Double]("value") == (0 until 12).sum / 12.0)
  }

  test("xff gate rejects sparse intervals but keeps stale values (2.2.7)") {
    val s = freshStore()
    val dayStart = (now - 2000000) / 86400 * 86400
    // first: 12 points -> daily mean 5.5 written
    s.updateMany((0 until 12).map(h => RawPoint("cpu", dayStart + h * 3600, h.toDouble)), now)
    val daily1 = s.readLevel(Archive(86400, 1095)).collect()
    assert(daily1.length == 1 && daily1.head.getAs[Double]("value") == 5.5)
    // then a different day with too-few points: no daily row for it,
    // and the old daily value stays
    val day2 = dayStart + 5 * 86400
    s.updateMany(Seq(RawPoint("cpu", day2, 99.0)), now)
    val daily2 = s.readLevel(Archive(86400, 1095)).orderBy("interval").collect()
    assert(daily2.length == 1 && daily2.head.getAs[Double]("value") == 5.5)
  }

  test("write validation: update rejects future and too-old; batch drops silently (2.2.5)") {
    val s = freshStore()
    intercept[IllegalArgumentException] { s.update("cpu", 1.0, now + 10, now) }
    intercept[IllegalArgumentException] { s.update("cpu", 1.0, now - policy.maxRetention, now) }
    // batch: too-old dropped, valid point kept
    s.updateMany(Seq(
      RawPoint("cpu", now - policy.maxRetention - 5, 1.0),
      RawPoint("cpu", now - 3600, 2.0)), now)
    val hourly = s.readLevel(policy.finest).collect()
    val daily = s.readLevel(Archive(86400, 1095)).collect()
    assert(hourly.length + daily.length == 1)
  }

  test("age-based routing: old points go directly to the daily archive (2.2.4)") {
    val s = freshStore()
    val oldTs = now - 40000000 // ~1.3y: beyond hourly retention, within daily
    s.updateMany(Seq(RawPoint("cpu", oldTs, 7.0)), now)
    assert(s.readLevel(policy.finest).isEmpty)
    val daily = s.readLevel(Archive(86400, 1095)).collect()
    assert(daily.length == 1 && daily.head.getAs[Double]("value") == 7.0)
    // fetch with a window reaching that far picks the daily archive
    val (ti, vals) = s.fetchValues("cpu", oldTs - 86400, oldTs + 86400, now)
    assert(ti.step == 86400)
    assert(vals.flatten == Seq(7.0))
  }

  test("fetch clamps from to retention and to to now (2.2.6)") {
    val s = freshStore()
    s.update("cpu", 3.0, now - 1800, now)
    // from far before retention, to far in the future
    val (ti, vals) = s.fetchValues("cpu", now - policy.maxRetention * 2, now + 99999, now)
    assert(ti.step == 86400) // clamped from -> full-retention age -> daily
    assert(ti.fromInterval == graft.core.Time.bumpEpoch(now - policy.maxRetention, 86400))
    assert(ti.toInterval == graft.core.Time.bumpEpoch(now, 86400))
    // from past `now`: to clamps to now, the window collapses, and the
    // reference's zero-pass loop returns an empty values list
    val (_, dfEmpty) = s.fetch("cpu", now + 10, now + 20, now)
    assert(dfEmpty.isEmpty)
  }

  test("fetch on an empty store returns all nulls (reference :450-456)") {
    val s = freshStore()
    val (ti, vals) = s.fetchValues("ghost", now - 7200, now, now)
    assert(vals.size == ((ti.toInterval - ti.fromInterval) / ti.step).toInt)
    assert(vals.flatten.isEmpty)
  }

  test("store honors a non-default consolidation function (cf=max)") {
    val s = HoardStore.create(spark, tmpDir("hoard-cf") + "/store",
      policy.copy(cf = "max"))
    val dayStart = (now - 200000) / 86400 * 86400
    s.updateMany((0 until 12).map(h =>
      HoardStore.RawPoint("cpu", dayStart + h * 3600, h.toDouble)), now)
    val daily = s.readLevel(graft.core.Archive(86400, 1095)).collect()
    assert(daily.length == 1 && daily.head.getAs[Double]("value") == 11.0)
    assert(HoardStore.info(spark, s.root).cf == "max") // cf roundtrips
  }

  test("fetchMulti returns a dense frame per matching series") {
    import org.apache.spark.sql.functions.col
    val s = freshStore()
    val t = now - 7200
    s.updateMany(Seq(
      HoardStore.RawPoint("cpu", t, 1.0),
      HoardStore.RawPoint("mem", t - 3600, 2.0)), now)
    val (ti, df) = s.fetchMulti(col("series_id").isin("cpu", "mem"),
      t - 7200, t + 3600, now)
    val slots = ((ti.toInterval - ti.fromInterval) / ti.step).toInt
    val rows = df.collect()
    assert(rows.length == 2 * slots) // dense for both series
    assert(rows.count(!_.isNullAt(2)) == 2) // one value each
  }

  test("late data within retention is accepted and re-propagated (SURVEY 3.4)") {
    val s = freshStore()
    val dayStart = (now - 2000000) / 86400 * 86400
    // batch 1: hours 2..13 of a day (12 points -> daily mean written)
    s.updateMany((2 until 14).map(h =>
      HoardStore.RawPoint("cpu", dayStart + h * 3600, h.toDouble)), now)
    // batch 2 arrives LATER but carries an EARLIER point (hour 0):
    // accepted, lands in its slot, daily recomputed over 13 points
    s.updateMany(Seq(HoardStore.RawPoint("cpu", dayStart, 100.0)), now)
    val (_, vals) = s.fetchValues("cpu", dayStart - 1, dayStart + 14 * 3600, now)
    assert(vals.head.contains(100.0)) // the late hour-0 slot is filled
    val daily = s.readLevel(graft.core.Archive(86400, 1095)).collect()
    assert(daily.length == 1)
    assert(math.abs(daily.head.getAs[Double]("value") -
      ((2 until 14).sum + 100.0) / 13.0) < 1e-9)
  }

  test("fetch prunes month partitions, not just interval rows") {
    val s = freshStore()
    // two points in different months so the level has 2+ partitions
    s.updateMany(Seq(
      HoardStore.RawPoint("cpu", now - 3600, 1.0),
      HoardStore.RawPoint("cpu", now - 90 * 86400, 2.0)), now)
    val (_, df) = s.fetch("cpu", now - 7200, now, now)
    val plan = df.queryExecution.executedPlan.toString
    // the scan must carry a p_month partition filter (a data-column
    // interval predicate alone would scan every month at scale)
    assert(plan.contains("p_month"), s"no partition filter in plan:\n$plan")
    val (_, vals) = s.fetchValues("cpu", now - 7200, now, now)
    assert(vals.flatten == Seq(1.0)) // pruning did not drop the hit
  }

  test("vacuum drops rows beyond each level's retention") {
    val s = freshStore()
    s.updateMany(Seq(RawPoint("cpu", now - 3600, 1.0)), now)
    // age the store: advance the clock by 2 years so the hourly row expires
    val later = now + 2 * 31536000L
    s.vacuum(later)
    assert(s.readLevel(policy.finest).isEmpty)
    s.vacuum(later) // idempotent on an emptied level (no footers to read)
    assert(s.readLevel(policy.finest).isEmpty)
  }

  test("vacuum drops expired months wholesale and leaves live months byte-identical") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    // 120-day retention: the oldest of three month partitions fully
    // expires; the cutoff lands in a month with no expired rows, so the
    // surviving partitions must not be rewritten at all
    val s = HoardStore.create(spark, tmpDir("hoard-v") + "/store",
      ArchivePolicy(Seq(Archive(3600, 2880)))) // 3600 * 2880 = 120 days
    // ingest with the clock at the OLDEST point so all three are young
    // enough to store (the batch path happily stores ahead-of-clock
    // points in the finest archive); vacuum then runs at `now`
    s.updateMany(Seq(
      RawPoint("cpu", now - 3600, 1.0),             // current month (live)
      RawPoint("cpu", now - 75 * 86400, 2.0),       // ~2.5 months back (live)
      RawPoint("cpu", now - 170 * 86400, 3.0)),      // ~5.6 months back (expired)
      now - 170 * 86400)
    val lvl = Paths.get(s.root, "level=3600")
    def monthDirs = Files.list(lvl).iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("p_month=")).toSeq.sorted
    def filesOf(m: String): Seq[(String, Long)] =
      Files.walk(lvl.resolve(m)).iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => (p.getFileName.toString, Files.getLastModifiedTime(p).toMillis))
        .toSeq.sorted
    val before = monthDirs
    assert(before.size == 3)
    val snap = before.map(m => m -> filesOf(m)).toMap
    s.vacuum(now)
    val after = monthDirs
    assert(after.size == 2, s"expected expired month dropped, got $after")
    assert(!after.contains(before.head))
    // surviving months were not rewritten: same files, same mtimes
    after.foreach(m => assert(filesOf(m) == snap(m), s"month $m was rewritten"))
    val vals = s.readLevel(Archive(3600, 2880)).collect()
    assert(vals.map(_.getAs[Double]("value")).toSet == Set(1.0, 2.0))
  }

  test("fetchMulti derives its universe from the series catalog, not a level scan") {
    import org.apache.spark.sql.functions.{col, lit}
    val s = freshStore()
    val t = now - 7200
    s.updateMany(Seq(
      HoardStore.RawPoint("cpu", t, 1.0),
      HoardStore.RawPoint("mem", t - 3600, 2.0)), now)
    val (_, df) = s.fetchMulti(lit(true), t - 7200, t + 3600, now)
    // executedPlan prints each FileScan's Location path
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("_series"), s"universe does not read the catalog:\n$plan")
    // exactly ONE scan of the level data (the windowed read); the
    // pre-catalog plan scanned the level a second time for the universe
    val levelScans = "level=3600".r.findAllIn(plan).length
    assert(levelScans == 1, s"expected 1 level scan, got $levelScans:\n$plan")
  }

  test("catalog keeps a vacuumed-out series visible to fetchMulti (all-null frame)") {
    import org.apache.spark.sql.functions.lit
    val s = freshStore()
    s.updateMany(Seq(RawPoint("cpu", now - 3600, 1.0)), now)
    val later = now + 2 * 31536000L
    s.vacuum(later) // hourly row expires; catalog entry remains
    val (ti, df) = s.fetchMulti(lit(true), later - 7200, later, later)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.isNullAt(2)),
      "vacuumed series should fetch as an all-null dense frame")
    assert(ti.step == 3600)
  }

  test("second concurrent writer fails loudly on the write lock") {
    val s = freshStore()
    val lock = java.nio.file.Paths.get(s.root, "_lock")
    java.nio.file.Files.createFile(lock) // another writer mid-batch
    val err = intercept[IllegalStateException] {
      s.updateMany(Seq(RawPoint("cpu", now - 3600, 1.0)), now)
    }
    assert(err.getMessage.contains("locked by another writer"))
    java.nio.file.Files.delete(lock)
    s.updateMany(Seq(RawPoint("cpu", now - 3600, 1.0)), now) // recovers
    assert(!java.nio.file.Files.exists(lock), "lock must release after a write")
    val (_, vals) = s.fetchValues("cpu", now - 7200, now, now)
    assert(vals.flatten == Seq(1.0))
  }

  test("RecordMergeSim merge strategy produces identical level contents") {
    import org.apache.spark.sql.functions.col
    val month = HoardStore.create(spark, tmpDir("hoard") + "/m", policy)
    val record = HoardStore.create(spark, tmpDir("hoard") + "/r", policy,
      HoardStore.RecordMergeSim)
    val rnd = new scala.util.Random(47)
    // three batches with overwrites of earlier intervals and enough
    // points to cross the daily level's xff gate
    val batches = (0 until 3).map { b =>
      (0 until 40).map { i =>
        val series = s"s${rnd.nextInt(3)}"
        RawPoint(series, now - 86400 * 2 + rnd.nextInt(48) * 3600, b * 100.0 + i)
      }
    }
    batches.foreach { pts => month.updateMany(pts, now); record.updateMany(pts, now) }
    policy.sorted.foreach { ar =>
      def dump(s: HoardStore) = s.readLevel(ar)
        .orderBy("series_id", "interval")
        .select(col("series_id"), col("interval").cast("long"), col("value"))
        .collect().toSeq
      val (m, r) = (dump(month), dump(record))
      assert(m.nonEmpty, s"level ${ar.step} empty")
      assert(m == r, s"level ${ar.step}: strategies diverge")
    }
  }

  private def listParquet(dir: java.nio.file.Path): Set[String] = {
    val st = java.nio.file.Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSet
    } finally st.close()
  }

  test("DeltaAppend: identical contents to MonthRewrite, append-only commits") {
    import org.apache.spark.sql.functions.col
    val month = HoardStore.create(spark, tmpDir("hoard") + "/m", policy)
    val delta = HoardStore.create(spark, tmpDir("hoard") + "/d", policy,
      HoardStore.DeltaAppend)
    val rnd = new scala.util.Random(53)
    val batches = (0 until 3).map { b =>
      (0 until 40).map { i =>
        val series = s"s${rnd.nextInt(3)}"
        RawPoint(series, now - 86400 * 2 + rnd.nextInt(48) * 3600, b * 100.0 + i)
      }
    }
    val hourlyDir = java.nio.file.Paths.get(
      delta.root, s"level=${policy.sorted.head.step}")
    def allDeltaFiles: Set[String] = {
      val st = java.nio.file.Files.list(hourlyDir)
      val parts = try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala
          .filter(_.getFileName.toString.startsWith("p_month=")).toList
      } finally st.close()
      parts.flatMap(p => listParquet(p).map(f => s"${p.getFileName}/$f")).toSet
    }
    var prevFiles = Set.empty[String]
    batches.foreach { pts =>
      month.updateMany(pts, now); delta.updateMany(pts, now)
      // append-only: every delta file from earlier batches survives
      // (below the compaction threshold nothing is rewritten)
      val nowFiles = allDeltaFiles
      assert(prevFiles.subsetOf(nowFiles),
        "DeltaAppend rewrote existing files below the compaction threshold")
      prevFiles = nowFiles
    }
    policy.sorted.foreach { ar =>
      def dump(s: HoardStore) = s.readLevel(ar)
        .orderBy("series_id", "interval")
        .select(col("series_id"), col("interval").cast("long"), col("value"))
        .collect().toSeq
      val (m, d) = (dump(month), dump(delta))
      assert(m.nonEmpty && m == d, s"level ${ar.step}: strategies diverge")
    }
  }

  test("DeltaAppend: compaction folds months to one file without changing contents") {
    import org.apache.spark.sql.functions.col
    val s = HoardStore.create(spark, tmpDir("hoard") + "/c", policy,
      HoardStore.DeltaAppend)
    (0 until 5).foreach { b =>
      s.updateMany((0 until 10).map(i =>
        RawPoint("cpu", now - 86400 + (b * 10 + i) * 3600 % 86400, b + i * 1.0)),
        now)
    }
    def dump(ar: graft.core.Archive) = s.readLevel(ar)
      .orderBy("series_id", "interval")
      .select(col("series_id"), col("interval").cast("long"), col("value"))
      .collect().toSeq
    val before = policy.sorted.map(dump)
    s.compact(maxFilesPerMonth = 1)
    val after = policy.sorted.map(dump)
    assert(before == after, "compaction changed level contents")
    policy.sorted.foreach { ar =>
      val dir = java.nio.file.Paths.get(s.root, s"level=${ar.step}")
      if (java.nio.file.Files.exists(dir)) {
        val st = java.nio.file.Files.list(dir)
        val parts = try {
          import scala.jdk.CollectionConverters._
          st.iterator().asScala.filter(_.getFileName.toString.startsWith("p_month="))
            .toList
        } finally st.close()
        parts.foreach(p => assert(listParquet(p).size == 1,
          s"${p.getFileName} not folded to one file"))
      }
    }
  }

  test("DeltaAppend: persisted strategy survives a default open()") {
    val root = tmpDir("hoard") + "/p"
    val s = HoardStore.create(spark, root, policy, HoardStore.DeltaAppend)
    val t = now - 7200
    s.updateMany(Seq(RawPoint("cpu", t, 1.0)), now)
    s.updateMany(Seq(RawPoint("cpu", t + 60, 2.0)), now) // same hourly slot
    // open WITHOUT naming the strategy: merge-on-read must still apply,
    // otherwise the two delta rows for the slot both surface
    val reopened = HoardStore.open(spark, root)
    assert(reopened.mergeStrategy == HoardStore.DeltaAppend)
    val (_, vals) = reopened.fetchValues("cpu", t - 3600, t + 3600, now)
    assert(vals.flatten == Seq(2.0))
  }

  test("series catalog stays bounded in file count across many batches") {
    val s = freshStore()
    (0 until 20).foreach { i =>
      s.updateMany(Seq(RawPoint(s"srv$i", now - 3600, i.toDouble)), now)
    }
    val dir = java.nio.file.Paths.get(s.root, "_series")
    val st = java.nio.file.Files.list(dir)
    val files = try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala.map(_.getFileName.toString)
        .count(_.endsWith(".parquet"))
    } finally st.close()
    // 20 batches x 2 levels = 40 appends without compaction; the
    // threshold (16) folds the catalog back to one file each time
    assert(files <= 17, s"catalog grew to $files files")
    val (_, df) = s.fetchMulti(org.apache.spark.sql.functions.lit(true),
      now - 7200, now, now)
    assert(df.select("series_id").distinct().count() == 20,
      "compaction lost catalog entries")
  }

  test("zero-slot window returns an empty frame, not an error (reference :493-509)") {
    val s = freshStore()
    s.update("cpu", 1.0, now - 1800, now)
    // from < to but both inside one hourly step after bumping
    val from = (now / 3600) * 3600 - 3599
    val (ti, df) = s.fetch("cpu", from, from + 10, now)
    assert(ti.fromInterval == ti.toInterval)
    assert(df.isEmpty)
    val (ti2, df2) = s.fetchMulti(org.apache.spark.sql.functions.lit(true),
      from, from + 10, now)
    assert(ti2.fromInterval == ti2.toInterval && df2.isEmpty)
  }

  test("seriesGlob selects graphite-style targets over an imported tree shape") {
    val s = freshStore()
    val names = Seq("web01.cpu.user", "web02.cpu.user", "web01.cpu.system",
      "db01.cpu.user", "web01.load", "webXX.cpu.user")
    names.foreach(n => s.update(n, 1.0, now - 1800, now))
    def matches(pattern: String): Set[String] = {
      val (_, df) = s.fetchMulti(s.seriesGlob(pattern), now - 3600, now, now)
      df.select("series_id").distinct().collect().map(_.getString(0)).toSet
    }
    // * stays within one dotted segment
    assert(matches("web*.cpu.user") ==
      Set("web01.cpu.user", "web02.cpu.user", "webXX.cpu.user"))
    assert(matches("*.cpu.*") == Set("web01.cpu.user", "web02.cpu.user",
      "web01.cpu.system", "db01.cpu.user", "webXX.cpu.user"))
    // ? is one non-dot char; classes and alternation pass through
    assert(matches("web0?.cpu.user") ==
      Set("web01.cpu.user", "web02.cpu.user"))
    assert(matches("web[0-9][0-9].cpu.user") ==
      Set("web01.cpu.user", "web02.cpu.user"))
    assert(matches("web{01,02}.cpu.{user,system}") ==
      Set("web01.cpu.user", "web02.cpu.user", "web01.cpu.system"))
    // no cross-segment bleed: *.user must not match web01.load
    assert(!matches("*.user").contains("web01.load"))
    assert(matches("web01.*") == Set("web01.load"))
  }

  test("fill: destination wins conflicts, gaps copy, levels independent") {
    val dst = freshStore()
    val src = freshStore()
    val t = now - 7200
    // conflicting slot: both stores hold t, different values
    dst.update("cpu", 10.0, t, now)
    src.update("cpu", 99.0, t, now)
    // gap: only src holds t-3600
    src.update("cpu", 7.5, t - 3600, now)
    // src-only series
    src.update("mem", 3.25, t, now)
    dst.fill(src)
    val (_, vals) = dst.fetchValues("cpu", t - 7200, t + 3600, now)
    assert(vals == Seq(Some(7.5), Some(10.0), None),
      s"dst must keep 10.0 and gain 7.5; got $vals")
    val (_, mem) = dst.fetchValues("mem", t - 3600, t + 3600, now)
    assert(mem.flatten == Seq(3.25), "src-only series must appear")
    // idempotence: a second fill changes nothing
    dst.fill(src)
    assert(dst.fetchValues("cpu", t - 7200, t + 3600, now)._2 ==
      Seq(Some(7.5), Some(10.0), None))
  }

  test("fill: coarse levels carry src provenance, no repropagation") {
    // a daily slot present ONLY in src's coarse archive (too old for
    // the hourly level) must copy verbatim — fill never recomputes a
    // coarse slot from filled finer data
    val dst = freshStore()
    val src = freshStore()
    val tOld = now - 94608000L + 86400L * 3 // inside 3y daily, outside 1y hourly
    val slot = tOld - java.lang.Math.floorMod(tOld, 86400L)
    src.updateMany(Seq(RawPoint("cpu", tOld, 55.0)), now)
    dst.fill(src)
    val daily = dst.policy.sorted.last
    import org.apache.spark.sql.functions.col
    val got = dst.readLevel(daily)
      .where(col("series_id") === "cpu" &&
        col("interval").cast("long") === slot)
      .select("value").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(55.0), s"deep slot must copy verbatim; got $got")
  }

  test("fsck flags a poisoned coarse slot; repair restores it exactly") {
    import org.apache.spark.sql.functions.col
    val s = freshStore()
    val dayStart = (now - 2000000) / 86400 * 86400
    // 12 hourly points -> one xff-passing daily slot (value 5.5)
    s.updateMany((0 until 12).map(h =>
      RawPoint("cpu", dayStart + h * 3600, h.toDouble)), now)
    val healthy = s.fsck().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(healthy.toSeq == Seq((86400L, 1L, 0L)), s"healthy: ${healthy.toSeq}")
    // poison the daily slot through the public merge path (a later seq
    // wins lww — exactly what a buggy writer would do)
    val daily = s.policy.sorted.last
    import spark.implicits._
    s.importArchive(daily,
      Seq(("cpu", dayStart, 999.0)).toDF("series_id", "ts", "value"))
    val sick = s.fsck().collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(sick.toSeq == Seq((1L, 1L)), "fsck must flag the poisoned slot")
    // repair re-derives from the hourly level and must win lww
    s.fsckRepair()
    val fixed = s.fsck().collect().map(_.getLong(2)).sum
    assert(fixed == 0L, "repair must clear every mismatch")
    val v = s.readLevel(daily)
      .where(col("series_id") === "cpu").collect()
    assert(v.length == 1 && v.head.getAs[Double]("value") == 5.5)
    // idempotence: repairing a healthy store changes nothing
    s.fsckRepair()
    assert(s.fsck().collect().map(_.getLong(2)).sum == 0L)
  }

  test("fill rejects mismatched archive layouts") {
    val dst = freshStore()
    val other = HoardStore.create(spark, tmpDir("hoard-p") + "/store",
      ArchivePolicy(Seq(Archive(3600, 8760))))
    intercept[IllegalArgumentException] { dst.fill(other) }
  }
}
