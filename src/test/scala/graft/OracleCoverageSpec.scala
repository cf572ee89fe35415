package graft

import org.scalatest.funsuite.AnyFunSuite

/** r12 verdict #7: guard chunked_oracle's SUPPORTED set. The scale
  * steps (sf >= 1) auto-route heavy oracles to the chunked DuckDB
  * replay; a pair-family query declared WITHOUT chunk support would
  * silently fall back to the monolithic oracle and re-open the
  * disk-exhaustion class the r11/r12 campaigns closed. This spec makes
  * that gap loud at declaration time:
  *
  *  - the pair family is DERIVED from the oracle SQL itself (a pair
  *    output — id_a/id_b or id_in/id_ex columns — is the signature of
  *    a candidate-join replay), never from a hand-maintained list;
  *  - each derived member must appear in chunked_oracle.SUPPORTED or
  *    in the documented light-weight allowlist below, whose entries
  *    say WHY their monolithic replay stays bounded (each was proven
  *    through the CORRECTNESS_sf1/sf10 monolithic passes or reads a
  *    table absent at the big steps);
  *  - SUPPORTED and the allowlist must stay consistent with the
  *    declared surface (no stale names on either side).
  *
  * A NEW pair query therefore fails here until its author either adds
  * a chunked replay or records the boundedness argument.
  */
class OracleCoverageSpec extends AnyFunSuite {

  private def supported: Set[String] = {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/chunked_oracle.py")), "UTF-8")
    val m = "(?s)SUPPORTED\\s*=\\s*\\[(.*?)\\]".r.findFirstMatchIn(src)
      .getOrElse(fail("chunked_oracle.py has no SUPPORTED list"))
    "\"([a-z0-9_]+)\"".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSet
  }

  /** Pair-marker oracles whose MONOLITHIC replay is bounded by
    * construction — the reason is the contract; a reason that stops
    * holding means the entry moves to chunked_oracle instead.
    */
  private val lightPairOracles: Map[String, String] = Map(
    "p3_lshpairs" -> ("banded minhash equi-join - candidate volume " +
      "bounded by band collisions (the oracle mirrors the banding, " +
      "never all-pairs), proven monolithic at the sf1 step"),
    "p5_simhash" -> ("Manku block-combination equi-join at d<=3 - " +
      "64-bit block keys, bounded collisions, proven monolithic at " +
      "the sf1 step"),
    "p6_embpairs" -> ("embeddings-only (20k vectors at sf1, table " +
      "absent beyond) and all-pairs by DECLARED contract - the " +
      "exactness baseline, permanent weak-at-scale watch entry"),
    "m6_phashpairs" -> ("multimodal aHash pairs over the bounded " +
      "image fixture - the table is absent at the scale steps"))

  test("every pair-family oracle is chunk-supported or documented light") {
    val pairMarked = SparkEntry.oracleSql.filter { case (_, sql) =>
      (sql.contains("id_a") && sql.contains("id_b")) ||
        (sql.contains("id_in") && sql.contains("id_ex"))
    }.keySet
    assert(pairMarked.nonEmpty, "pair-marker derivation found nothing - " +
      "the signature regex no longer matches the oracle surface")
    val sup = supported
    val unaccounted = (pairMarked -- sup -- lightPairOracles.keySet).toSeq.sorted
    assert(unaccounted.isEmpty,
      s"pair-family oracles with NO chunked replay and NO documented " +
        s"boundedness rationale: ${unaccounted.mkString(", ")} - add " +
        "them to chunked_oracle.SUPPORTED (with a chunk_sql) or to " +
        "lightPairOracles with the reason their monolithic replay " +
        "stays bounded")
  }

  test("SUPPORTED and the light allowlist stay consistent with the surface") {
    val declared = SparkEntry.oracleSql.keySet
    val staleSup = (supported -- declared).toSeq.sorted
    assert(staleSup.isEmpty,
      s"chunked_oracle.SUPPORTED names undeclared queries: " +
        staleSup.mkString(", "))
    val staleLight = (lightPairOracles.keySet -- declared).toSeq.sorted
    assert(staleLight.isEmpty,
      s"lightPairOracles names undeclared queries: " +
        staleLight.mkString(", "))
    val both = (lightPairOracles.keySet & supported).toSeq.sorted
    assert(both.isEmpty,
      s"queries both chunk-SUPPORTED and allowlisted light (stale " +
        s"rationale): ${both.mkString(", ")}")
  }
}
