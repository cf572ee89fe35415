package graft

import graft.queries.{HoardQueries, PipelineQueries}
import org.apache.spark.sql.functions._

/** Gates for the corpus n-gram statistics family added in the round-6
  * fourth session: interpolated Kneser-Ney bigram LM (p48), n-gram
  * novelty scoring (p49), PMI collocation mining (p50), and the
  * Graphite divideSeries/diffSeries alignment (h36).
  */
class NgramStatsSpec extends SparkTestBase {

  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"

  // --- p48 Kneser-Ney ---------------------------------------------------

  test("p48: KN components match a sequential mirror and sum to one") {
    val rows = PipelineQueries.defs("p48_kneserney")(spark, Sf).collect()
    assert(rows.nonEmpty)
    // sequential mirror from the raw fixture text
    val texts = spark.read.parquet(s"$Sf/documents.parquet")
      .select("text").as[String].collect()
    val bigrams = texts.flatMap(t => t.split(" ").sliding(2)
      .filter(_.length == 2).map(a => (a(0), a(1))))
    val c12 = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nf = c12.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nb = c12.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val t = c12.size.toLong
    rows.foreach { r =>
      val (w1, w2) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == c12((w1, w2)), s"c12($w1,$w2)")
      assert(r.getLong(3) == c1(w1), s"c1($w1)")
      assert(r.getLong(4) == nf(w1), s"nf($w1)")
      assert(r.getLong(5) == nb(w2), s"nb($w2)")
      val pkn = (c12((w1, w2)) - 0.75) / c1(w1) +
        0.75 * nf(w1) / c1(w1) * nb(w2) / t
      assert(math.abs(r.getDouble(6) - pkn) < 1e-6, s"pkn($w1,$w2)")
    }
    // the interpolated-KN normalization identity: for any context w1,
    // sum over the FULL vocab of P_KN(w2|w1) = 1 exactly —
    // sum(max(c12-D,0))/c1 = (c1 - D*nf)/c1 and sum(Pcont) = 1
    val w1s = rows.map(_.getString(0)).distinct.take(5)
    w1s.foreach { w1 =>
      val seen = c12.collect { case ((a, b), c) if a == w1 => (b, c) }
      val discounted = seen.map(_._2 - 0.75).sum / c1(w1)
      val lambda = 0.75 * nf(w1) / c1(w1)
      // full-vocab continuation mass is 1 by construction
      val total = discounted + lambda * 1.0
      assert(math.abs(total - 1.0) < 1e-9, s"KN mass for $w1")
    }
  }

  // --- p49 novelty ------------------------------------------------------

  test("p49: identical doc scores 0, first doc 1, half-overlap between") {
    val a = (1 to 20).map("w" + _).mkString(" ")
    val half = ((11 to 20).map("w" + _) ++ (30 to 39).map("x" + _)).mkString(" ")
    val docs = Seq((1L, a), (2L, a), (3L, half)).toDF("doc_id", "text")
    val sh = graft.pipeline.TextOps
      .shinglesOfText(docs, "doc_id", "text", 3)
      .withColumn("vid", graft.pipeline.TextOps.hashId(col("shingle")))
      .select("doc_id", "vid").distinct()
    val first = sh.groupBy(col("vid")).agg(min(col("doc_id")).as("first_doc"))
    val out = sh.join(first, "vid").groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("novel"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (18L, 18L)) // 20 tokens -> 18 shingles, all novel
    assert(out(2L)._2 == 0L)      // exact copy introduces nothing
    // doc 3: tokens w11..w20 x30..x39; shingles fully inside w11..w20
    // (8 of them) were introduced by doc 1; the straddling + x-only
    // ones (10) are new
    assert(out(3L) == (18L, 10L))
  }

  test("p49 on sf0.001: novelty fractions are consistent and bounded") {
    val rows = PipelineQueries.defs("p49_novelty")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, novel, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(novel >= 0 && novel <= n)
      assert(math.abs(frac - novel.toDouble / n) < 1e-6)
    }
    // the smallest doc_id owning any shingle introduces all of them
    val firstDoc = rows.minBy(_.getLong(0))
    assert(firstDoc.getLong(1) == firstDoc.getLong(2))
    // total novel across docs == number of distinct shingles in corpus
    val totalNovel = rows.map(_.getLong(2)).sum
    val distinctShingles = graft.pipeline.TextOps
      .shinglesOfText(spark.read.parquet(s"$Sf/documents.parquet"),
        "doc_id", "text", 3)
      .withColumn("vid", graft.pipeline.TextOps.hashId(col("shingle")))
      .select("vid").distinct().count()
    assert(totalNovel == distinctShingles)
  }

  // --- p50 PMI ----------------------------------------------------------

  test("p50: counts, exact-integer rank key and pmi match a mirror") {
    val rows = PipelineQueries.defs("p50_pmi")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val texts = spark.read.parquet(s"$Sf/documents.parquet")
      .select("text").as[String].collect()
    val toks = texts.flatMap(_.split(" "))
    val uni = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bigrams = texts.flatMap(t => t.split(" ").sliding(2)
      .filter(_.length == 2).map(a => (a(0), a(1))))
    val c12 = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = bigrams.length.toLong
    rows.foreach { r =>
      val (w1, w2) = (r.getString(0), r.getString(1))
      val (kc12, kc1, kc2) = (c12((w1, w2)), uni(w1), uni(w2))
      assert(r.getLong(2) == kc12 && kc12 >= 5)
      assert(r.getLong(3) == kc1 && r.getLong(4) == kc2)
      assert(r.getLong(5) == kc12 * n * 1000000L / (kc1 * kc2))
      val pmi = math.log(kc12.toDouble * n / (kc1.toDouble * kc2))
      assert(math.abs(r.getDouble(6) - pmi) < 1e-6)
    }
    // ordering is by the exact integer key, descending
    val keys = rows.map(_.getLong(5)).toSeq
    assert(keys == keys.sorted.reverse)
  }

  // --- h36 divideSeries -------------------------------------------------

  test("h36: ratio/diff self-consistent, nulls exactly on missing/0") {
    val rows = HoardQueries.defs("h36_seriesdiv")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val err = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      val clk = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      val ratio = if (r.isNullAt(3)) None else Some(r.getDouble(3))
      val diff = if (r.isNullAt(4)) None else Some(r.getDouble(4))
      (err, clk) match {
        case (Some(e), Some(c)) if c != 0.0 =>
          assert(ratio.isDefined &&
            math.abs(ratio.get - e / c) < 2e-6, s"ratio at ${r.getString(0)}")
          assert(diff.isDefined && math.abs(diff.get - (e - c)) < 1e-9)
        case (Some(_), Some(_)) => // divisor 0
          assert(ratio.isEmpty && diff.isDefined)
        case _ =>
          assert(ratio.isEmpty && diff.isEmpty,
            s"one-sided slot must null both at ${r.getString(0)}")
      }
    }
    // the full-outer alignment really fires: at least one one-sided slot
    assert(rows.exists(r => r.isNullAt(1) ^ r.isNullAt(2)),
      "fixture has no one-sided hourly slot — weaken of the gate")
  }
}
