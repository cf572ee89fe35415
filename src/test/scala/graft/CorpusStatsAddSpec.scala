package graft

import graft.queries.{PipelineQueries, RelationalQueries}
import org.apache.spark.sql.functions._

/** Gates for the round-6 fifth-session corpus-statistics additions:
  * pairwise source Jensen–Shannon divergence (p54), the Zipf
  * rank–frequency fit (p55) and the deterministic mode aggregate (q41).
  */
class CorpusStatsAddSpec extends SparkTestBase {

  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"

  test("p54: identical sources diverge 0; disjoint sources hit ln 2") {
    // sources a and b share every token with equal frequencies; c is
    // vocabulary-disjoint from both — JSD(a,b) = 0 and
    // JSD(a,c) = JSD(b,c) = ln 2 exactly (the micro-log of ratio 2
    // on every term, matched and unmatched alike)
    val docs = Seq(
      (1L, "x y z x", "a"), (2L, "x y z x", "b"),
      (3L, "p q r p", "c"))
      .toDF("doc_id", "text", "source")
    val dir = tmpDir("p54")
    docs.write.parquet(s"$dir/documents.parquet")
    val out = PipelineQueries.defs("p54_jsd")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(out(("a", "b")) == 0.0, s"identical sources: $out")
    val ln2 = math.round(math.log(2.0) * 1e6) / 1e6
    assert(out(("a", "c")) == ln2 && out(("b", "c")) == ln2, s"$out")
  }

  test("p54: sf0.001 values replay a sequential BigInt mirror") {
    val rows = PipelineQueries.defs("p54_jsd")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val cnt = Tables.load(spark, Sf, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect()
    val bySrc = cnt.groupBy(_._1)
      .view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val muLn2 = math.round(math.log(2.0) * 1e6)
    rows.foreach { r =>
      val (sa, sb) = (r.getString(0), r.getString(1))
      val (ca, cb) = (bySrc(sa), bySrc(sb))
      val (na, nb) = (ca.values.sum, cb.values.sum)
      assert(r.getLong(2) == na && r.getLong(3) == nb)
      val shared = ca.keySet.intersect(cb.keySet)
      assert(r.getLong(4) == shared.size.toLong)
      def kl(x: Map[String, Long], y: Map[String, Long],
             nx: Long, ny: Long): Long = {
        val matched = shared.toSeq.map { t =>
          val xny = x(t) * ny; val ynx = y(t) * nx
          x(t) * math.round(
            math.log((2.0 * xny) / (xny + ynx).toDouble) * 1e6)
        }.sum
        val mx = shared.toSeq.map(x).sum
        matched + (nx - mx) * muLn2
      }
      val exp = math.round(
        (kl(ca, cb, na, nb).toDouble / na +
          kl(cb, ca, nb, na).toDouble / nb) / 2) / 1e6
      assert(r.getDouble(5) == exp, s"jsd($sa,$sb)")
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 0.693148)
    }
    // drift must be visible: not all pairs identical
    assert(rows.map(_.getDouble(5)).distinct.length > 1)
  }

  test("p55: an exact synthetic power law fits slope -1") {
    // token t_k appears round(1024 / k) times, k = 1..20: frequencies
    // lie on freq = C / rank, so the log-log regression over the full
    // top-20 must recover slope ≈ -1 (micro-log quantization and the
    // integer rounding of counts keep it within a few percent)
    val text = (1 to 20).flatMap(k =>
      Seq.fill(math.round(1024.0 / k).toInt)(f"t$k%02d")).mkString(" ")
    val docs = Seq((1L, text, "a")).toDF("doc_id", "text", "source")
    val dir = tmpDir("p55")
    docs.write.parquet(s"$dir/documents.parquet")
    val r = PipelineQueries.defs("p55_zipf")(spark, dir).collect().head
    assert(r.getLong(0) == 20L)
    assert(math.abs(r.getDouble(1) + 1.0) < 0.02,
      s"slope ${r.getDouble(1)}")
    // intercept ≈ ln 1024
    assert(math.abs(r.getDouble(2) - math.log(1024.0)) < 0.05)
  }

  test("p55: sf0.001 sums replay a BigInt regression mirror") {
    val r = PipelineQueries.defs("p55_zipf")(spark, Sf).collect().head
    val top = Tables.load(spark, Sf, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token")).limit(200)
      .as[(String, Long)].collect()
    val n = top.length
    assert(r.getLong(0) == n.toLong)
    val xs = (1 to n).map(k => math.round(math.log(k.toDouble) * 1e6))
    val ys = top.map(t => math.round(math.log(t._2.toDouble) * 1e6))
    val (sx, sy) = (xs.map(BigInt(_)).sum, ys.map(BigInt(_)).sum)
    val sxx = xs.map(x => BigInt(x) * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * y }.sum
    val den = n * sxx - sx * sx
    val slope = math.round(
      (n * sxy - sx * sy).toDouble / den.toDouble * 1e6) / 1e6
    val icpt = math.round(
      (sy * sxx - sx * sxy).toDouble / den.toDouble / 1e6 * 1e6) / 1e6
    assert(r.getDouble(1) == slope && r.getDouble(2) == icpt)
    assert(slope < 0, "natural text must slope downward")
  }

  test("s16 equals p54 exactly on sf0.001 (maintained counts parity)") {
    val batch = PipelineQueries.defs("p54_jsd")(spark, Sf).collect()
      .map(_.toSeq).toSeq
    val stream = PipelineQueries.defs("s16_streamjsd")(spark, Sf).collect()
      .map(_.toSeq).toSeq
    assert(batch.nonEmpty && stream == batch,
      "streamed JSD must reproduce the batch answer row for row")
  }

  test("p58: spectrum mass equals 2|E| and covers every document") {
    val rows = PipelineQueries.defs("p58_dupgraph")(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val nDocs = Tables.load(spark, Sf, "documents").count()
    assert(rows.map(_._2).sum == nDocs, "every doc lands in one bin")
    val pairs = PipelineQueries.nearDupPairs(spark, Sf).count()
    assert(rows.map { case (d, n) => d * n }.sum == 2 * pairs,
      "total degree must be twice the edge count")
    assert(rows.exists(_._1 == 0L) && rows.exists(_._1 > 0L),
      "fixture must show both isolated and paired docs")
  }

  test("p59: top-3 keywords replay a sequential tf-idf mirror") {
    val rows = PipelineQueries.defs("p59_tfidf")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val toks = Tables.load(spark, Sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .as[(Long, String)].collect()
    val n = toks.map(_._1).distinct.length
    val df = toks.distinct.groupBy(_._2).view.mapValues(_.length).toMap
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (d, rs) =>
      val tf = toks.filter(_._1 == d).groupBy(_._2)
        .view.mapValues(_.length).toMap
      val scored = tf.toSeq.map { case (t, f) =>
        (t, f.toLong * math.round(math.log(n.toDouble / df(t)) * 1e6))
      }
      val expect = scored.sortBy { case (t, sc) => (-sc, t) }.take(3)
      val got = rs.sortBy(_.getLong(1))
        .map(r => (r.getString(2), r.getLong(5)))
      assert(got.toSeq == expect, s"doc $d keywords")
    }
    // rank keys strictly ordered within each doc (modulo the token
    // tie-break), and rare terms must actually outrank common ones
    // somewhere: some top-1 keyword has tf 1
    assert(rows.exists(r => r.getLong(1) == 1L && r.getLong(3) == 1L))
  }

  test("p60: recall audit is internally consistent; full recall at tiny SF") {
    val r = PipelineQueries.defs("p60_lshrecall")(spark, Sf).collect().head
    val (ne, nc, nh) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nh <= ne && nh <= nc, "hits must embed in both sets")
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    assert(r.getDouble(3) ==
      (if (ne == 0) 1.0 else math.round(nh.toDouble / ne * 1e6) / 1e6))
    // the sf0.001 fixture is where banding holds — the sf0.1 miss
    // (recall 0.984) is the standing reason p10 rides the exact path
    assert(r.getDouble(3) == 1.0, "banding must be complete at sf0.001")
  }

  test("p61: centroid cosines replay a sequential BigDecimal mirror") {
    val rows = PipelineQueries.defs("p61_labelcentroids")(spark, Sf)
      .collect()
    val vecs = Tables.load(spark, Sf, "embeddings")
      .select(col("label").cast("long"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val byLabel = vecs.groupBy(_._1)
    assert(rows.length == byLabel.size * (byLabel.size - 1) / 2)
    def centroid(l: Long): Array[Double] = {
      val vs = byLabel(l).map(_._2)
      (0 until 64).map { d =>
        (vs.map(v => BigDecimal(v(d)).setScale(18,
          BigDecimal.RoundingMode.HALF_UP)).sum / vs.length).toDouble
      }.toArray
    }
    rows.foreach { r =>
      val (ca, cb) = (centroid(r.getLong(0)), centroid(r.getLong(1)))
      def dsum(xs: Seq[Double]) = xs.map(x => BigDecimal(x).setScale(20,
        BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      val dot = dsum(ca.zip(cb).map { case (x, y) => x * y })
      val na = dsum(ca.map(x => x * x)); val nb = dsum(cb.map(x => x * x))
      val exp = math.round(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6
      assert(r.getDouble(4) == exp,
        s"cos(${r.getLong(0)},${r.getLong(1)})")
      assert(r.getLong(2) == byLabel(r.getLong(0)).length.toLong)
    }
  }

  test("p57: vector stats replay a sequential hashing-trick mirror") {
    val rows = PipelineQueries.defs("p57_hashembed")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val toks = Tables.load(spark, Sf, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .as[(Long, String)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def vid(t: String): Long = {
      val h = md.digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(h, 16)
    }
    val byDoc = toks.groupBy(_._1)
    rows.foreach { r =>
      val ts = byDoc(r.getLong(0)).map(_._2)
      val vecs = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      ts.foreach { t =>
        val v = vid(t)
        vecs(v % 64) += (if ((v / 64) % 2 == 0) 1L else -1L)
      }
      val vs = vecs.values.toSeq
      assert(r.getLong(1) == ts.length.toLong, "n_tokens")
      assert(r.getLong(2) == vs.count(_ != 0).toLong, "nnz")
      assert(r.getLong(3) == vs.map(math.abs).sum, "l1")
      assert(r.getLong(4) == vs.map(v => v * v).sum, "l2sq")
      assert(r.getLong(5) ==
        vecs.map { case (b, v) => (b + 1) * v }.sum, "checksum")
      // parity invariant: each sign cancellation removes exactly 2
      // tokens, so l1 and n_tokens share parity
      assert((r.getLong(3) - r.getLong(1)) % 2 == 0)
      assert(r.getLong(2) <= 64)
    }
  }

  test("m7: the audit equals m1's decode rows aggregated sequentially") {
    val meta = PipelineQueries.defs("m1_multimodal")(spark, Sf).collect()
      .groupBy(_.getString(1))
    val rows = PipelineQueries.defs("m7_mediaaudit")(spark, Sf).collect()
    assert(rows.map(_.getString(0)).toSet == meta.keySet)
    rows.foreach { r =>
      val g = meta(r.getString(0))
      assert(r.getLong(1) == g.length.toLong)
      assert(r.getLong(2) == g.map(_.getLong(2)).sum)
      assert(r.getDouble(3) ==
        math.round(g.map(_.getLong(3)).sum.toDouble / g.length * 1e6) / 1e6)
      assert(r.getLong(5) == g.map(_.getLong(5)).sum)
      assert(r.getLong(6) == g.map(_.getLong(6)).distinct.length.toLong)
    }
  }

  test("p62: negatives never share the query's label and are maximal") {
    val rows = PipelineQueries.defs("p62_hardnegatives")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) != r.getLong(4),
      "a same-label vector leaked into the negatives"))
    // rank-1 negative must dominate every other different-label sim
    val e = Tables.load(spark, Sf, "embeddings")
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      math.round(d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum)) * 1e6) / 1e6
    }
    rows.filter(_.getLong(1) == 1L).foreach { r =>
      val (qid, ql) = (r.getLong(0), r.getLong(2))
      val q = e.find(_._1 == qid).get._3
      val best = e.filter(v => v._1 != qid && v._2 != ql)
        .map(v => (cos(q, v._3), -v._1)).max
      assert(r.getDouble(5) == best._1, s"rank-1 sim for query $qid")
    }
  }

  test("p63: shadow mass equals chunks minus distinct hashes; clone doc") {
    val rows = PipelineQueries.defs("p63_chunkdedup")(spark, Sf).collect()
    val totalChunks = rows.map(_.getLong(1)).sum
    val totalShadowed = rows.map(_.getLong(3)).sum
    // every non-keeper occurrence is shadowed exactly once
    val distinctHashes = PipelineQueries.defs("p46_chunking")(spark, Sf)
      .select("chunk_md5").distinct().count()
    assert(totalShadowed == totalChunks - distinctHashes)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "shadowed implies duplicated")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    // a verbatim clone shadows completely: doc 2 copies doc 1
    val text = (1 to 80).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text, "a"), (2L, text, "a"),
      (3L, (1 to 40).map(i => s"z$i").mkString(" "), "b"))
      .toDF("doc_id", "text", "source")
    val dir = tmpDir("p63")
    docs.write.parquet(s"$dir/documents.parquet")
    val out = PipelineQueries.defs("p63_chunkdedup")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(1L) == 0.0 && out(2L) == 1.0 && out(3L) == 0.0, s"$out")
  }

  test("q42: stage order is strict — out-of-order events don't count") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, ts("2024-01-01 09:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-01 11:00:00"), 1L, "purchase", 1.0, "{}"),
      // user 2: click BEFORE first view -> stage stalls at 1
      (4L, ts("2024-01-01 08:00:00"), 2L, "click", 1.0, "{}"),
      (5L, ts("2024-01-01 09:00:00"), 2L, "view", 1.0, "{}"),
      // user 3: view+click ordered, purchase before click -> stage 2
      (6L, ts("2024-01-01 09:00:00"), 3L, "view", 1.0, "{}"),
      (7L, ts("2024-01-01 09:30:00"), 3L, "purchase", 1.0, "{}"),
      (8L, ts("2024-01-01 10:00:00"), 3L, "click", 1.0, "{}"),
      // user 4: never viewed -> absent from the funnel entirely
      (9L, ts("2024-01-01 10:00:00"), 4L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("q42")
    ev.write.parquet(s"$dir/events.parquet")
    val out = RelationalQueries.defs("q42_funnel3")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 3L -> 2L), s"got $out")
  }

  test("p64: funnel counts are monotone and agree with p12's total") {
    val rows = PipelineQueries.defs("p64_funnelreport")(spark, Sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t, q, l, f) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(t >= q && q >= l && l >= f, s"non-monotone funnel: $r")
      assert(r.getDouble(5) ==
        math.round(f.toDouble / t * 1e6) / 1e6)
    }
    // p12 applies the same three gates grouped by language — the final
    // survivor totals must agree exactly
    val p12Total = PipelineQueries.defs("p12_curation")(spark, Sf)
      .collect().map(_.getLong(1)).sum
    assert(rows.map(_.getLong(4)).sum == p12Total,
      "p64's survivors must be p12's population")
    // the funnel must actually discriminate somewhere on the fixture
    assert(rows.exists(r => r.getLong(4) < r.getLong(1)))
  }

  test("q43: bins partition the orders; extremes stay inside their bin") {
    val rows = RelationalQueries.defs("q43_histogram")(spark, Sf).collect()
    val nOrders = Tables.load(spark, Sf, "orders").count()
    assert(rows.map(_.getLong(2)).sum == nOrders)
    rows.foreach { r =>
      val lo = r.getLong(0) * 2000000L
      assert(r.getLong(3) >= lo && r.getLong(4) < lo + 2000000L,
        s"bin ${r.getLong(0)} extremes escape the bin")
      assert(r.getLong(1) == r.getLong(0) * 20000L)
    }
    assert(rows.length > 1, "fixture must span multiple bins")
  }

  test("s17 equals q43 exactly (maintained numeric profile parity)") {
    val batch = RelationalQueries.defs("q43_histogram")(spark, Sf)
      .collect().map(_.toSeq).toSeq
    val stream = RelationalQueries.defs("s17_streamhistogram")(spark, Sf)
      .collect().map(_.toSeq).toSeq
    assert(batch.nonEmpty && stream == batch,
      "streamed histogram must reproduce the batch profile row for row")
  }

  test("q45: the null key matches itself exactly once") {
    val rows = RelationalQueries.defs("q45_nullsafejoin")(spark, Sf)
      .collect()
    val nullRows = rows.filter(_.getLong(1) == 1L)
    assert(nullRows.length == 1, "exactly one null-key row")
    // the fixture's 'view' group has values on both sides of 50, so
    // the null-safe match must carry BOTH counts — a plain equi-join
    // would have dropped the row entirely
    assert(!nullRows.head.isNullAt(2) && !nullRows.head.isNullAt(3))
    assert(rows.filter(_.getLong(1) == 0L)
      .forall(r => !r.isNullAt(0)), "non-null keys carry their value")
  }

  test("q41: ties break to the smallest value, never arbitrarily") {
    val li = Seq(
      // flag A: 5.0 x2, 3.0 x2 (tie) -> mode must be 3.0
      ("A", 5.0), ("A", 5.0), ("A", 3.0), ("A", 3.0), ("A", 9.0),
      // flag B: unique mode 7.0
      ("B", 7.0), ("B", 7.0), ("B", 1.0))
      .toDF("l_returnflag", "l_quantity")
      .withColumn("l_orderkey", lit(1L))
    val dir = tmpDir("q41")
    li.write.parquet(s"$dir/lineitem.parquet")
    val out = RelationalQueries.defs("q41_mode")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(out("A") == (3.0, 2L), s"tie must break low: $out")
    assert(out("B") == (7.0, 2L))
  }
}
