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

  test("segmentation is partitioning-independent") {
    val words = Seq("table", "tab", "merge", "query", "a", "abcabc")
    assert(enc(words, 1) == enc(words, 7))
  }
}
