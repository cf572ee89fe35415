package graft

import graft.queries.{PipelineQueries, RelationalQueries}
import org.apache.spark.sql.functions._

/** Gates for the round-6 fourth-session relational/sampling additions:
  * funnel conversion (q37), exact-power-sum statistical moments (q38),
  * and largest-remainder stratified sampling (p51).
  */
class AnalyticsAddSpec extends SparkTestBase {

  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"

  // --- q37 funnel -------------------------------------------------------

  test("q37: first-click/first-purchase matches a sequential mirror") {
    val rows = RelationalQueries.defs("q37_funnel")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.load(spark, Sf, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .as[(Long, String, Long)].collect()
    val clicks = ev.filter(_._2 == "click").groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val purchases = ev.filter(_._2 == "purchase").groupBy(_._1)
      .view.mapValues(_.map(_._3)).toMap
    assert(rows.length == clicks.size, "one row per clicking user")
    rows.foreach { r =>
      val u = r.getLong(0)
      val fc = clicks(u)
      assert(r.getLong(1) == fc)
      val fp = purchases.getOrElse(u, Array.empty[Long]).filter(_ > fc)
        .sorted.headOption
      fp match {
        case Some(p) =>
          assert(r.getLong(2) == p && r.getLong(3) == 1L &&
            r.getLong(4) == p - fc)
        case None =>
          assert(r.isNullAt(2) && r.getLong(3) == 0L && r.isNullAt(4))
      }
    }
    // the dense month-long fixture converts every clicking user; the
    // no-purchase branch is proven by the mirror's None arm above
    assert(rows.exists(_.getLong(3) == 1L))
  }

  test("q37: non-converting and pre-click-purchase users null out") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // user 1 converts; user 2 never purchases; user 3's only purchase
    // PRECEDES its first click (strictly-after must exclude it)
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "purchase", 1.0, "{}"),
      (3L, ts("2024-01-01 10:00:00"), 2L, "click", 1.0, "{}"),
      (4L, ts("2024-01-01 09:00:00"), 3L, "purchase", 1.0, "{}"),
      (5L, ts("2024-01-01 10:00:00"), 3L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("q37")
    ev.write.parquet(s"$dir/events.parquet")
    val out = RelationalQueries.defs("q37_funnel")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 1L, 2L -> 0L, 3L -> 0L))
  }

  // --- q38 moments ------------------------------------------------------

  test("q38: moments equal a BigInt power-sum mirror; symmetric data 0-skew") {
    val rows = RelationalQueries.defs("q38_moments")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val vals = Tables.load(spark, Sf, "events")
      .select(col("event_type"), col("value")).as[(String, Double)].collect()
    rows.foreach { r =>
      val tpe = r.getString(0)
      val cents = vals.filter(_._1 == tpe)
        .map(v => BigDecimal(v._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toBigIntExact.get)
      val n = cents.length
      assert(r.getLong(1) == n.toLong)
      val s1 = cents.sum; val s2 = cents.map(x => x * x).sum
      val s3 = cents.map(x => x * x * x).sum
      val s4 = cents.map(x => x * x * x * x).sum
      val nd = n.toDouble
      val mean = s1.toDouble / nd
      val m2 = s2.toDouble / nd - mean * mean
      val m3 = s3.toDouble / nd - 3.0 * mean * (s2.toDouble / nd) +
        2.0 * mean * mean * mean
      val m4 = s4.toDouble / nd - 4.0 * mean * (s3.toDouble / nd) +
        6.0 * mean * mean * (s2.toDouble / nd) -
        3.0 * mean * mean * mean * mean
      assert(math.abs(r.getDouble(2) - mean / 100.0) < 1e-6, s"mean $tpe")
      assert(math.abs(r.getDouble(3) - m2 / 10000.0) < 1e-5, s"var $tpe")
      assert(math.abs(r.getDouble(4) - m3 / (m2 * math.sqrt(m2))) < 1e-6,
        s"skew $tpe")
      assert(math.abs(r.getDouble(5) - (m4 / (m2 * m2) - 3.0)) < 1e-6,
        s"kurt $tpe")
    }
  }

  test("q38 shape: exact power sums survive the BIGINT-overflow value") {
    // a single 560.21 puts x^4 at 9.85e18 > Long.MaxValue: the decimal
    // path must carry it where a long would wrap negative
    val x = BigInt(56021)
    assert((x * x * x * x) > BigInt(Long.MaxValue))
    val df = Seq(("a", 560.21), ("a", 560.21), ("a", 0.01))
      .toDF("event_type", "value")
      .withColumn("c", (col("value").cast("decimal(18,2)") * 100).cast("long"))
      .withColumn("x2", col("c") * col("c"))
      .groupBy("event_type")
      .agg(sum(col("x2").cast("decimal(38,0)") * col("x2")).as("s4"))
    val s4 = BigDecimal(df.collect().head.getDecimal(1))
    assert(s4.toBigInt == x * x * x * x * 2 + 1)
  }

  // --- s13 streaming funnel --------------------------------------------

  test("s13: cross-batch conversion found, pre-click purchase discarded") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // user 1: click in batch b0 (day 5), purchase in batch b1 (day 15)
    //   — the conversion spans a micro-batch boundary
    // user 2: purchase day 2 (b0), click day 12 (b1) — the purchase
    //   precedes the click and sits in an EARLIER batch; the fold must
    //   never resurrect it
    val ev = Seq(
      (1L, ts("2024-01-05 10:00:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2024-01-15 10:00:00"), 1L, "purchase", 1.0, "{}"),
      (3L, ts("2024-01-02 10:00:00"), 2L, "purchase", 1.0, "{}"),
      (4L, ts("2024-01-12 10:00:00"), 2L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("s13")
    ev.write.parquet(s"$dir/events.parquet")
    val out = graft.queries.HoardQueries.defs("s13_streamfunnel")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 1L, 2L -> 0L))
  }

  test("s13 equals q37 exactly on sf0.001 (batch/stream parity)") {
    val stream = graft.queries.HoardQueries.defs("s13_streamfunnel")(spark, Sf)
      .collect().map(_.toSeq).toSeq
    val batch = RelationalQueries.defs("q37_funnel")(spark, Sf)
      .collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }

  // --- s14 streaming Holt-Winters --------------------------------------

  test("s14 equals h37 exactly on sf0.001 (carried-state fold parity)") {
    val stream = graft.queries.HoardQueries.defs("s14_streamhw")(spark, Sf)
      .collect().map(_.toSeq).toSeq
    val batch = graft.queries.HoardQueries.defs("h37_hwbands")(spark, Sf)
      .collect().map(_.toSeq).toSeq
    assert(stream.nonEmpty && stream == batch)
  }

  // --- q39 range frames -------------------------------------------------

  test("q39: trailing 1h frame matches a sequential per-series mirror") {
    val rows = RelationalQueries.defs("q39_rangeframe")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val ev = Tables.load(spark, Sf, "events")
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")),
        col("value"))
      .as[(Long, String, Long, Double)].collect()
    val bySeries = ev.groupBy(_._2)
    val expect = ev.map { case (id, tpe, t, _) =>
      val peers = bySeries(tpe).filter(e => e._3 >= t - 3600000000L && e._3 <= t)
      id -> (peers.length.toLong,
        peers.map(e => BigDecimal(e._4).setScale(6)).sum.toDouble)
    }.toMap
    rows.foreach { r =>
      val (n, s) = expect(r.getLong(0))
      assert(r.getLong(2) == n, s"n at ${r.getLong(0)}")
      assert(math.abs(r.getDouble(3) - s) < 1e-6, s"sum at ${r.getLong(0)}")
    }
  }

  // --- q40 correlation --------------------------------------------------

  test("q40: exact-sum Pearson agrees with Spark's built-in corr") {
    val rows = RelationalQueries.defs("q40_corr")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val ref = Tables.load(spark, Sf, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_pop(col("l_quantity"), col("l_extendedprice")).as("cv"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    rows.foreach { r =>
      val (c, cv) = ref(r.getString(0))
      assert(math.abs(r.getDouble(2) - c) < 1e-6, s"corr ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - cv) < 1e-3, s"covar ${r.getString(0)}")
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
    }
  }

  // --- p53 KS drift ------------------------------------------------------

  test("p53: KS distance matches a sequential ECDF mirror + known case") {
    val rows = PipelineQueries.defs("p53_ksdrift")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val d = Tables.load(spark, Sf, "documents")
      .select(col("source"), size(split(col("text"), " ")).cast("long"))
      .as[(String, Long)].collect()
    val n = d.length.toLong
    val lens = d.map(_._2).distinct.sorted
    rows.foreach { r =>
      val src = r.getString(0)
      val mine = d.filter(_._1 == src).map(_._2)
      val ns = mine.length.toLong
      assert(r.getLong(1) == ns)
      val ksNum = lens.map { l =>
        math.abs(mine.count(_ <= l) * n - d.count(_._2 <= l) * ns)
      }.max
      assert(r.getLong(2) == ksNum, s"ks_num for $src")
      assert(math.abs(r.getDouble(3) - ksNum.toDouble / (ns * n)) < 1e-6)
    }
    // known-value case: disjoint length distributions, 5 vs 15 docs
    val docs = ((1 to 5).map(i => (i.toLong, ("w " * 10).trim, "a")) ++
      (6 to 20).map(i => (i.toLong, ("w " * 20).trim, "b")))
      .toDF("doc_id", "text", "source")
    val dir = tmpDir("p53")
    docs.write.parquet(s"$dir/documents.parquet")
    val out = PipelineQueries.defs("p53_ksdrift")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(math.abs(out("a") - 0.75) < 1e-9 &&
      math.abs(out("b") - 0.25) < 1e-9, s"got $out")
  }

  // --- hs12 resize ------------------------------------------------------

  test("resize carries deep coarse-level history the finest can't see") {
    import graft.core.{Archive, ArchivePolicy}
    import graft.store.HoardStore
    val now = 1706745600L // 2024-02-01 00:00:00 UTC
    val oldPolicy = ArchivePolicy(
      Seq(Archive(3600, 48), Archive(86400, 30)), cf = "avg_exact")
    val newPolicy = ArchivePolicy(
      Seq(Archive(3600, 48), Archive(172800, 15)), cf = "avg_exact")
    val root = tmpDir("resize-deep") + "/store"
    val st = HoardStore.create(spark, root, oldPolicy)
    // recent: 48 hourly points (ages 0-2d) at value 10; deep: one point
    // per day at ages 5..10 days with value 100+k — age routing sends
    // the deep points straight to the DAILY archive (forAge), exactly
    // how independently-propagated history accumulates in a live store
    val recent = (1 until 48).map { i =>
      ("s", now - i * 3600L, 10.0, i.toLong)
    }
    val deep = (5 to 10).map { k =>
      ("s", now - k * 86400L, 100.0 + k, 100L + k)
    }
    st.updateManyDf((recent ++ deep)
      .toDF("series_id", "ts", "value", "seq"), now)
    val rs = st.resize(tmpDir("resize-out") + "/store2", newPolicy, now)
    val twoDay = rs.readLevel(newPolicy.sorted.last)
      .collect()
      .map(r => r.getAs[java.sql.Timestamp]("interval").getTime / 1000 ->
        r.getAs[Double]("value")).toMap
    // deep daily points fall in 2-day buckets; each bucket's value is
    // the exact mean of its daily members (xff 0.5: 1 of 2 slots passes)
    val expectDeep = deep.groupBy { case (_, ts, _, _) => ts - ts % 172800 }
      .view.mapValues(vs => vs.map(_._3).sum / vs.size).toMap
    expectDeep.foreach { case (b, v) =>
      assert(twoDay.contains(b), s"deep 2-day bucket $b lost in resize")
      assert(math.abs(twoDay(b) - v) < 1e-9, s"bucket $b: ${twoDay(b)} != $v")
    }
    // the recent range came from the hourly cascade, not the deep path
    val recentBuckets = recent.map { case (_, ts, _, _) => ts - ts % 172800 }
      .distinct.filter(b => twoDay.contains(b) && !expectDeep.contains(b))
    assert(recentBuckets.nonEmpty, "no cascade bucket from the hourly data")
    recentBuckets.foreach(b => assert(math.abs(twoDay(b) - 10.0) < 1e-9))
  }

  // --- p52 semantic decontamination ------------------------------------

  test("p52: a planted eval copy flags; an orthogonal vector doesn't") {
    // eval ids are multiples of 20. vec 21 = exact copy of eval 20
    // (cos 1.0 -> contaminated); vec 22 orthogonal to both eval
    // vectors (cos 0 -> clean)
    val rows = Seq(
      (20L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (40L, Array(0.0f, 1.0f, 0.0f, 0.0f), 0),
      (21L, Array(2.0f, 0.0f, 0.0f, 0.0f), 1),
      (22L, Array(0.0f, 0.0f, 3.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val dir = tmpDir("p52")
    rows.write.parquet(s"$dir/embeddings.parquet")
    val out = PipelineQueries.defs("p52_semdecontam")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(out(21L) == ((20L, 1.0, 1L)), s"got ${out(21L)}")
    assert(out(22L)._3 == 0L && out(22L)._2 == 0.0)
    assert(!out.contains(20L) && !out.contains(40L),
      "eval vectors must not appear on the train side")
  }

  // --- h37 Holt-Winters bands ------------------------------------------

  test("h37: spike flags aberrant; steady series never does") {
    // 3 days of hourly points at a constant 10.0, with one 1000.0
    // spike mid-way: the band tracks the constant exactly (dev -> 0),
    // so ONLY the spike crosses it
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val rows = (0 until 72).map { i =>
      val v = if (i == 50) 1000.0 else 10.0
      ("s", java.sql.Timestamp.from(base.plusSeconds(i * 3600L)), v)
    }.toDF("event_type", "bucket", "value")
    val out = graft.operators.SeriesFold
      .holtWintersBands(rows, "event_type", "bucket", "value",
        alpha = 0.5, beta = 0.25, gamma = 0.25, period = 24, delta = 3.0)
      .orderBy("bucket").collect()
    assert(out.length == 72)
    val flagged = out.zipWithIndex.filter(_._1.getLong(7) == 1L).map(_._2)
    assert(flagged.contains(50), "the spike must be flagged")
    assert(!flagged.contains(0) && flagged.forall(i => i >= 50),
      s"nothing before the spike may flag: $flagged")
    // band self-consistency on every row (y at index 2 since the fold
    // emits the observed value for holtWintersAberration)
    out.foreach { r =>
      val (p, d, u, lo) = (r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getDouble(6))
      assert(math.abs(u - (p + 3.0 * d)) < 1e-9)
      assert(math.abs(lo - (p - 3.0 * d)) < 1e-9)
      assert(d >= 0.0)
    }
  }

  // --- p51 stratified sampling -----------------------------------------

  test("p51: allocation sums to exactly 100 and is proportional ±1") {
    val out = PipelineQueries.defs("p51_stratified")(spark, Sf).collect()
    assert(out.length == 100, s"got ${out.length}")
    val counts = Tables.load(spark, Sf, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    val total = counts.values.sum
    val allocBySrc = out.groupBy(_.getString(1)).view.mapValues(_.length)
    allocBySrc.foreach { case (src, a) =>
      val ideal = 100.0 * counts(src) / total
      assert(math.abs(a - ideal) < 1.0 + 1e-9,
        s"$src alloc $a vs ideal $ideal") // Hamilton stays within 1 seat
    }
    // selection is the md5-rank prefix: ranks are 1..alloc per source
    out.groupBy(_.getString(1)).foreach { case (_, rows) =>
      val rks = rows.map(_.getLong(2)).sorted
      assert(rks.sameElements(1L to rks.length))
    }
  }

  test("p51: apportionment mirror on a skewed synthetic corpus") {
    // 3 sources sized 7/2/1 over budget 100: quotas 70/20/10 exact
    val docs = ((1 to 70).map(i => (i.toLong, "big")) ++
      (71 to 90).map(i => (i.toLong, "mid")) ++
      (91 to 100).map(i => (i.toLong, "small")))
      .map { case (id, src) => (id, s"text $id", src) }
      .toDF("doc_id", "text", "source")
    val tmp = tmpDir("p51") + "/documents.parquet"
    docs.write.parquet(tmp)
    val out = PipelineQueries.defs("p51_stratified")(
      spark, tmp.stripSuffix("/documents.parquet"))
    val bySrc = out.collect().groupBy(_.getString(1)).view.mapValues(_.length)
    assert(bySrc("big") == 70 && bySrc("mid") == 20 && bySrc("small") == 10)
  }
}
