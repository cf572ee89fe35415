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
}
