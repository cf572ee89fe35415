package graft

import graft.pipeline.Subword
import org.apache.spark.sql.functions._

/** Semantics gates for the greedy longest-match subword encoder —
  * properties the p32 oracle can't isolate: longest-match-first wins
  * over any shorter segmentation, unknown chars consume exactly one
  * position, and the segmentation is partitioning-independent.
  */
class SubwordSpec extends SparkTestBase {

  private val vocab = Seq("a", "b", "l", "e", "t", "ta", "table", "me",
    "r", "ge", "ue", "y", "ab", "abc")

  private def enc(ws: Seq[String], parts: Int = 1): Map[String, (String, Long, Long)] = {
    import spark.implicits._
    Subword.encode(ws.toDF("word").repartition(parts), vocab)
      .as[(String, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("longest match wins at every position") {
    val out = enc(Seq("table", "tab", "abcd"))
    assert(out("table") == (("table", 1L, 0L)))  // not "ta b l e"
    assert(out("tab") == (("ta b", 2L, 0L)))     // "ta" beats "t"
    assert(out("abcd") == (("abc ?", 2L, 1L)))   // "abc" beats "ab"; d unknown
  }

  test("unknown characters consume one position each and are counted") {
    val out = enc(Seq("query", "merge", "zzz"))
    assert(out("query") == (("? ue r y", 4L, 1L))) // 'q' has no vocab entry
    assert(out("merge") == (("me r ge", 3L, 0L)))
    assert(out("zzz") == (("? ? ?", 3L, 3L)))
  }

  test("matches a sequential greedy mirror on random words and vocab") {
    // deterministic LCG so the case set is stable across runs
    var x = 424242L
    def next(n: Int): Int = {
      x = x * 6364136223846793005L + 1442695040888963407L
      (((x >>> 33) % n).toInt + n) % n
    }
    val alpha = "abcde"
    def randWord(len: Int): String =
      (1 to len).map(_ => alpha(next(4))).mkString // only a-d: 'e' never appears
    val pieces = Seq("a", "b", "c") ++ // 'd' unknown at single length
      (1 to 20).map(_ => randWord(1 + next(3) + 1)).distinct
    val words = (1 to 100).map(_ => randWord(1 + next(9))).distinct
    def mirror(w: String): (String, Long, Long) = {
      val sb = new StringBuilder; var pos = 0; var n = 0L; var unk = 0L
      while (pos < w.length) {
        val cands = pieces.filter(p => w.startsWith(p, pos))
        val p = if (cands.isEmpty) null else cands.maxBy(_.length)
        if (p == null) { unk += 1; n += 1; sb.append('?'); pos += 1 }
        else { n += 1; sb.append(p); pos += p.length }
        if (pos < w.length) sb.append(' ')
      }
      (sb.toString, n, unk)
    }
    import spark.implicits._
    val got = Subword.encode(words.toDF("word").repartition(5), pieces)
      .as[(String, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.size == words.size)
    words.foreach(w => assert(got(w) == mirror(w), s"word $w"))
  }

  test("segmentation is partitioning-independent") {
    val words = Seq("table", "tab", "merge", "query", "a", "abcabc")
    assert(enc(words, 1) == enc(words, 7))
  }

  test("t11 fertility matches a sequential per-source mirror on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("t11_fertility")(spark, dir).collect()

    // mirror: encode every occurrence sequentially with the engine's
    // own (already mirror-tested) per-word encoding, then aggregate
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, dir, "documents")
    val occ = docs.select(col("source"), explode(split(col("text"), " "))
      .as("token")).collect().map(r => (r.getString(0), r.getString(1)))
    import spark.implicits._
    val encMap = graft.pipeline.Subword
      .encode(occ.map(_._2).distinct.toSeq.toDF("word"),
        graft.queries.PipelineQueries.SubwordVocab)
      .as[(String, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    val expected = occ.groupBy(_._1).map { case (src, os) =>
      val n = os.length.toLong
      val pieces = os.map(o => encMap(o._2)._1).sum
      val unk = os.map(o => encMap(o._2)._2).sum
      val chars = os.map(_._2.length.toLong).sum
      def r6(x: Double) = math.round(x * 1e6) / 1e6
      src -> (n, pieces, unk,
        r6(pieces.toDouble / n), r6(unk.toDouble / pieces),
        r6(chars.toDouble / pieces))
    }
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, p, u, ppw, ur, cpp) = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_words") == n)
      assert(r.getAs[Long]("n_pieces") == p)
      assert(r.getAs[Long]("n_unk") == u)
      assert(r.getAs[Double]("pieces_per_word") == ppw)
      assert(r.getAs[Double]("unk_rate") == ur)
      assert(r.getAs[Double]("chars_per_piece") == cpp)
    }
    // the pinned vocab really exercises the unknown path somewhere
    assert(got.map(_.getAs[Long]("n_unk")).sum > 0)
  }
}
