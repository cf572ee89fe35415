package graft

import graft.pipeline.{Dsir, LanguageModel, TextAnalysis}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Gates for the data-selection operators: CCNet-style LM perplexity
  * scoring (mirrored token-by-token in sequential Scala with the exact
  * rounding contract), DSIR importance weights (mirrored the same
  * way), and the Gopher rule filter (each rule flipped in isolation on
  * crafted documents).
  */
class SelectionSpec extends SparkTestBase {

  import spark.implicits._

  private def microLn(p: Double): Long =
    java.math.BigDecimal.valueOf(math.log(p) * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  // --- LM perplexity ---------------------------------------------------

  /** Sequential mirror of LanguageModel.train + perplexityScore. */
  private def mirrorScores(ref: Seq[(Long, String)], all: Seq[(Long, String)])
      : Map[Long, (Long, Long)] = {
    val refToks = ref.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val uni = refToks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bi = refToks.flatMap { case (_, ts) => ts.sliding(2).filter(_.size == 2).map(s => (s(0), s(1))) }
      .toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = uni.values.sum
    val v = uni.size.toLong + 1
    all.map { case (id, text) =>
      val ts = text.split(" ", -1).toSeq
      val llp = ts.zipWithIndex.map { case (w, i) =>
        val prev = if (i == 0) None else Some(ts(i - 1))
        val p = prev.filter(uni.contains) match {
          case Some(pv) =>
            (bi.getOrElse((pv, w), 0L) + 1).toDouble / (uni(pv) + v).toDouble
          case None =>
            (uni.getOrElse(w, 0L) + 1).toDouble / (t + v).toDouble
        }
        microLn(p)
      }.sum
      id -> (ts.size.toLong, llp)
    }.toMap
  }

  test("LM perplexity score == sequential mirror on a random corpus") {
    val rnd = new Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "xi")
    val docs = (0L until 40L).map { id =>
      val n = 1 + rnd.nextInt(12)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val ref = docs.filter(_._1 % 3 == 0)
    val df = docs.toDF("doc_id", "text")
    val lm = LanguageModel.train(df.where(col("doc_id") % 3 === 0), "doc_id", "text")
    val got = LanguageModel.perplexityScore(df, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == mirrorScores(ref, docs))
  }

  test("LM scores every token exactly once (n_tok == word count)") {
    // edge docs: single token, repeated token, unseen-vocabulary doc
    val docs = Seq((0L, "a"), (1L, "a a a a"), (2L, "zz yy xx"),
      (3L, "a b a b a")).toDF("doc_id", "text")
    val lm = LanguageModel.train(docs.where(col("doc_id") < 2), "doc_id", "text")
    val got = LanguageModel.perplexityScore(docs, "doc_id", "text", lm)
      .select("doc_id", "n_tok").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1L, 1L -> 4L, 2L -> 3L, 3L -> 5L))
  }

  test("reference-like docs outscore out-of-vocabulary docs") {
    val ref = (0L until 10L).map(i => (i, "the quick brown fox jumps"))
    val probe = Seq((100L, "the quick brown fox jumps"),
      (101L, "zzz qqq www uuu vvv"))
    val df = (ref ++ probe).toDF("doc_id", "text")
    val lm = LanguageModel.train(df.where(col("doc_id") < 100), "doc_id", "text")
    val got = LanguageModel.perplexityScore(df, "doc_id", "text", lm)
      .where(col("doc_id") >= 100)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(100L) > got(101L))
  }

  test("tertile buckets are ordered and near-balanced") {
    val rnd = new Random(11)
    val scores = (0L until 90L).map(i => (i, rnd.nextInt(1000) / 1000.0))
      .toDF("doc_id", "avg_llp")
    val b = LanguageModel.buckets(scores).collect()
      .map(r => (r.getDouble(1), r.getString(2)))
    val byB = b.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(byB.keySet == Set("head", "middle", "tail"))
    assert(byB("head").min >= byB("middle").max)
    assert(byB("middle").min >= byB("tail").max)
    // tertiles: each bucket within a few docs of n/3 (ties can shift)
    byB.values.foreach(v => assert(math.abs(v.size - 30) <= 3))
  }

  // --- DSIR ------------------------------------------------------------

  test("DSIR weight table always has exactly B rows") {
    val d = Seq((0L, "a b"), (1L, "c d")).toDF("doc_id", "text")
    val fb = Dsir.featureBuckets(d, "doc_id", "text", 64)
    val w = Dsir.bucketWeights(fb, fb, 64)
    assert(w.count() == 64)
    // identical target/raw distributions => every weight exactly 0
    assert(w.where(col("llw_micro") =!= 0).count() == 0)
  }

  test("DSIR separates target-exclusive from raw-exclusive docs") {
    val target = (0L until 20L).map(i => (i, "good clean prose text here"))
    val raw = (20L until 40L).map(i => (i, "spam junk noise filler words"))
    val d = (target ++ raw).toDF("doc_id", "text")
    val B = 256
    val w = Dsir.bucketWeights(
      Dsir.featureBuckets(d.where(col("doc_id") < 20), "doc_id", "text", B),
      Dsir.featureBuckets(d.where(col("doc_id") >= 20), "doc_id", "text", B), B)
    val sc = Dsir.score(Dsir.featureBuckets(d, "doc_id", "text", B), "doc_id", w)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert((0L until 20L).forall(sc(_) > 0))
    assert((20L until 40L).forall(sc(_) < 0))
  }

  test("DSIR score == sequential mirror on a random corpus") {
    val rnd = new Random(13)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val docs = (0L until 30L).map { id =>
      val n = 2 + rnd.nextInt(8)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val B = 32
    def hashId(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    def feats(text: String): Seq[Long] = {
      val ts = text.split(" ", -1).toSeq
      val bi = ts.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      (ts ++ bi).map(f => hashId(f) % B)
    }
    val isT = (id: Long) => id % 2 == 0
    val ct = docs.filter(d => isT(d._1)).flatMap(d => feats(d._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cr = docs.filterNot(d => isT(d._1)).flatMap(d => feats(d._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (tt, tr) = (ct.values.sum, cr.values.sum)
    def llw(b: Long): Long = microLn(
      ((ct.getOrElse(b, 0L) + 1).toDouble * (tr + B)) /
        ((cr.getOrElse(b, 0L) + 1).toDouble * (tt + B)))
    val expected = docs.map { case (id, text) =>
      id -> feats(text).map(llw).sum
    }.toMap
    val d = docs.toDF("doc_id", "text")
    val w = Dsir.bucketWeights(
      Dsir.featureBuckets(d.where(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text", B),
      Dsir.featureBuckets(d.where(pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text", B), B)
    val got = Dsir.score(Dsir.featureBuckets(d, "doc_id", "text", B), "doc_id", w)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  // --- Bloom prefilter -------------------------------------------------

  test("bloom prefilter never drops a true member (no false negatives)") {
    val rnd = new Random(17)
    val probeVids = Seq.fill(400)(rnd.nextInt(1000).toLong).distinct
    val corpusVids = Seq.fill(400)(rnd.nextInt(1000).toLong).distinct
    val bloom = graft.pipeline.BloomPrefilter.buildBloom(
      probeVids.toDF("vid"), "vid", 1000L, 10000L)
    val kept = graft.pipeline.BloomPrefilter
      .prefilter(corpusVids.toDF("vid"), "vid", bloom)
      .collect().map(_.getLong(0)).toSet
    val trueMembers = corpusVids.toSet.intersect(probeVids.toSet)
    assert(trueMembers.subsetOf(kept),
      s"lost true members: ${trueMembers -- kept}")
  }

  test("bloom-prefiltered span membership == plain exact join") {
    val rnd = new Random(19)
    def side(ids: Range) = ids.flatMap(id =>
      Seq.fill(12)((id.toLong, rnd.nextInt(150).toLong))).distinct
    val probeRows = side(0 until 25)
    val corpusRows = side(100 until 125)
    val got = graft.pipeline.BloomPrefilter
      .spanMembership(probeRows.toDF("doc_id", "vid"),
        corpusRows.toDF("doc_id", "vid"), "doc_id", "vid", 500L, 5000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val corpusSet = corpusRows.map(_._2).toSet
    val expected = probeRows.groupBy(_._1).map { case (id, rows) =>
      val vids = rows.map(_._2).distinct
      id -> (vids.size.toLong, vids.count(corpusSet).toLong)
    }
    assert(got == expected)
  }

  test("empty probe side yields a bloom that keeps nothing") {
    val empty = Seq.empty[Long].toDF("vid")
    val bloom = graft.pipeline.BloomPrefilter.buildBloom(empty, "vid", 10L, 100L)
    val kept = graft.pipeline.BloomPrefilter
      .prefilter(Seq(1L, 2L).toDF("vid"), "vid", bloom)
    assert(kept.count() == 0)
  }

  // --- Gopher rules ----------------------------------------------------

  private def gopher(rows: Seq[(Long, String)]) =
    TextAnalysis.gopherRules(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("each Gopher rule flips in isolation") {
    val goodWords = Seq.fill(29)("word the") :+ "word end" // 60 words, 2+ stopwords
    val good = goodWords.mkString(" ")
    val shortDoc = "word the word the word" // 5 words
    val longWords = (Seq.fill(58)("word") ++ Seq.fill(2)("the") )
      .map(w => if (w == "word") "extraordinarily" else w).mkString(" ")
    val symbols = (Seq.fill(50)("wo#rd") ++ Seq.fill(10)("the")).mkString(" ")
    val numeric = (Seq.fill(55)("1234") ++ Seq.fill(5)("the")).mkString(" ")
    val noStop = Seq.fill(60)("word").mkString(" ")
    val rows = gopher(Seq((0L, good), (1L, shortDoc), (2L, longWords),
      (3L, symbols), (4L, numeric), (5L, noStop)))

    def flags(id: Long) = (0 to 4).map(i => rows(id).getBoolean(6 + i))
    assert(rows(0L).getBoolean(11), "good doc keeps") // keep
    assert(flags(1L) == Seq(false, true, true, true, true))
    assert(flags(2L) == Seq(true, false, true, true, true))
    assert(flags(3L)(2) == false, "symbol ratio fails") // 50 '#' / 60 words
    assert(flags(4L) == Seq(true, true, true, false, true))
    assert(flags(5L) == Seq(true, true, true, true, false))
    assert((1L to 5L).forall(!rows(_).getBoolean(11)))
  }

  test("Gopher metrics are exact on a known document") {
    val r = gopher(Seq((0L, "the cat... sat #here with a hat")))(0L)
    assert(r.getLong(1) == 7L) // n_words
    // text len 31, 6 spaces -> 25 chars / 7 words
    assert(r.getDouble(2) == math.rint(25.0 / 7 * 1e6) / 1e6)
    // one '#' + one '...' over 7 words
    assert(r.getDouble(3) == math.rint(2.0 / 7 * 1e6) / 1e6)
    assert(r.getLong(5) == 2L) // the, with ("a" is not in Gopher's list)
  }
}
