package graft.tools

import graft.{Graft, Tables}
import graft.pipeline.{Components, Embeddings, MinHashLsh, SimHash, TextAnalysis, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev tool: dedup-path scaling curve. Unions the sf0.1 documents
  * k = 1..max times; each copy's text runs through a different vowel
  * permutation (`translate`) so copies are content-DISJOINT — the
  * near-dup structure per copy stays identical while cross-copy
  * similarity collapses, so output size grows linearly and the wall
  * time curve isolates the JOIN/SHUFFLE scaling of the bucketed plans
  * (MinHash-LSH candidates, pigeonhole SimHash pairs, exact dedup).
  * Near-linear growth = the bucketed claims hold beyond the fixture.
  * Usage: runMain graft.tools.PipelineStress [maxCopies]
  */
object PipelineStress {
  def main(args: Array[String]): Unit = {
    val max = args.headOption.map(_.toInt).getOrElse(4)
    val spark = Graft.session(cores = 32, appName = "graft-pstress")
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    val perms = Seq("aeiou", "eioua", "iouae", "ouaei", "uaeio", "aeuio")
    // beyond perms.size copies the permutations would cycle, copies k and
    // k-6 would be byte-identical, and the content-disjoint premise of
    // the scaling readout would silently break — fail loudly instead
    require(max <= perms.size,
      s"maxCopies must be <= ${perms.size} (vowel permutations would cycle)")

    def corpus(k: Int): DataFrame =
      (0 until k).map { i =>
        base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          translate(col("text"), "aeiou", perms(i % perms.size)).as("text"))
      }.reduce(_ unionByName _).localCheckpoint(true)

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%6.1f s  (rows=$n)")
    }

    (1 to max).foreach { k =>
      val docs = corpus(k)
      val nDocs = docs.count()
      println(s"--- copies=$k docs=$nDocs ---")
      timed("p1 exact dedup") {
        docs.select(md5(col("text").cast("binary")).as("h"))
          .groupBy("h").count().where(col("count") > 1).count()
      }
      val toks = TextOps.tokens(docs, "doc_id", "text")
      val shingleIds = TextOps.shinglesOfText(docs, "doc_id", "text", 3)
        .select(col("doc_id"), TextOps.hashId(col("shingle")).as("vid"))
      timed("p3 LSH candidates") {
        MinHashLsh.candidates(
          MinHashLsh.bands(
            MinHashLsh.signatures(shingleIds, "doc_id", 16), "doc_id", r = 4),
          "doc_id").count()
      }
      timed("p5 simhash bucketed") {
        val tokenIds = toks.withColumn("vid", TextOps.hashId(col("token")))
        SimHash.nearPairsBucketed(
          SimHash.fingerprints(tokenIds, "doc_id"), "doc_id", maxDist = 3).count()
      }
      timed("p14 exact topk e2e") {
        // the REAL p14 path end to end: bootstrap τ re-derived from the
        // scaled corpus (it RISES with more near-dup pairs, shrinking
        // the band), measured generator choice, bounded verify
        val tf = toks.groupBy(col("doc_id"),
            TextOps.hashId(col("token")).as("vid"))
          .agg(count(lit(1)).cast("long").as("tf"))
        graft.pipeline.SparseCosine.exactTopK(tf, "doc_id", 50).count()
      }
      timed("p18 components") {
        // CC over the candidate graph of the scaled corpus: star rounds
        // are shuffle-bounded; content-disjoint copies keep components
        // per-copy, so labels grow linearly with k
        val pairs = MinHashLsh.candidates(
          MinHashLsh.bands(
            MinHashLsh.signatures(shingleIds, "doc_id", 16), "doc_id", r = 4),
          "doc_id").select(col("id_a").as("a"), col("id_b").as("b"))
        Components.componentsOver(docs, "doc_id", pairs).count()
      }
      timed("p20 span dedup") {
        // hash-keyed span occurrence counting — vowel-permuted copies
        // share no span text, so posting lists stay short at any k
        TextAnalysis.duplicateSpans(docs, "doc_id", "text").count()
      }
      timed("p48 bigram KN counts") {
        // the corpus bigram groupBy behind p48/p50: vowel-permuted
        // copies share almost no bigrams, so type counts — and the
        // map-side-combined shuffle — grow linearly with k
        val bg = docs.select(explode(expr(
          """zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),
            |         slice(split(text, ' '), 2, size(split(text, ' ')) - 1),
            |         (a, b) -> struct(a AS w1, b AS w2))""".stripMargin))
          .as("b")).select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        bg.groupBy("w1", "w2").count().count()
      }
      timed("p49 novelty") {
        // min-doc-per-shingle + per-doc conditional count: two linear
        // aggregations, one equi-join
        val sh = shingleIds.distinct()
        val first = sh.groupBy(col("vid")).agg(min(col("doc_id")).as("fd"))
        sh.join(first, "vid").groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L))
              .as("novel"))
          .count()
      }
      timed("p15 decontam shared") {
        // broadcast eval fingerprints vs the k×-scaled training side
        val grams = TextOps.shinglesOfText(docs, "doc_id", "text", 7)
          .select(col("doc_id"), TextOps.hashId(col("shingle")).as("vid"))
          .distinct()
        val evalIds = docs.where(pmod(col("doc_id"), lit(10000000L)) < 25)
          .select("doc_id")
        val evalVids = grams.join(evalIds, "doc_id").select("vid").distinct()
        grams.join(evalIds, Seq("doc_id"), "left_anti")
          .join(broadcast(evalVids), "vid").count()
      }
      // incremental dedup with the EXISTING side scaled k× and the
      // incoming batch FIXED (copy 0's odd docs): the per-update cost
      // must track the incoming batch + collided buckets, not the
      // corpus — the index is pre-built (checkpointed) OUTSIDE the
      // timer, as a production pipeline persists it between updates
      val exIndex = {
        val exIds = TextOps.shinglesOfText(
            docs.where(pmod(col("doc_id"), lit(2)) === 0),
            "doc_id", "text", 3)
          .select(col("doc_id"), xxhash64(col("shingle")).as("vid"))
          .distinct()
        graft.pipeline.IncrementalDedup.buildIndex(exIds, "doc_id")
          .checkpointed
      }
      timed("p23 incr (ex=kx)") {
        val inIds = TextOps.shinglesOfText(
            docs.where(col("doc_id") < 10000000L &&
              pmod(col("doc_id"), lit(2)) === 1), "doc_id", "text", 3)
          .select(col("doc_id"), xxhash64(col("shingle")).as("vid"))
          .distinct()
        graft.pipeline.IncrementalDedup.crossMatches(inIds, exIndex,
          "doc_id").count()
      }
      timed("p32 subword encode") {
        // dictionary-encode scaling: the corpus grows k× but the
        // distinct-word frame grows only with the (vowel-permuted)
        // vocabulary — encode cost tracks DISTINCT words, the
        // occurrence join is one broadcast, so wall time stays flat
        // while token rows grow linearly
        val words = toks.select(col("token").as("word")).distinct()
        val enc = graft.pipeline.Subword.encode(words,
          "abcdefghijklmnoprstuvwxyz".map(_.toString) ++
            Seq("th", "ta", "me", "ge", "sc", "an", "ba", "va", "ue"))
        toks.join(broadcast(enc), col("token") === col("word"))
          .groupBy("doc_id").agg(sum(col("n_pieces")).as("np")).count()
      }
      timed("p21 semdedup K~N") {
        // the SemDeDup contract under scaling: K grows with the corpus
        // (40 cells per copy — each copy keeps its own centroid set via
        // dimension ROTATION, which decorrelates cross-copy cosines),
        // so per-cell pair work stays bounded and removals grow ~k×
        val base = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
        val vecs = (0 until k).map { i =>
          base.select((col("vec_id") * lit(k.toLong) + lit(i.toLong)).as("vec_id"),
            // rotate dims by i: copy i's vector is expr-shuffled so
            // cross-copy similarity collapses to noise below τ
            concat(slice(col("embedding"), i * 7 + 1, 64 - i * 7),
              slice(col("embedding"), 1, i * 7)).as("embedding"))
        }.reduce(_ unionByName _).localCheckpoint(true)
        // new_id = orig·k + copy, so floor(id/k) < 40 picks each
        // copy's first 40 originals → K = 40·k total cells
        val cents = Embeddings.withUnitVector(vecs, "embedding", "uv")
          .where(floor(col("vec_id") / k) < 40)
          .select(col("vec_id").as("c_id"), col("uv").as("cv"))
        Embeddings.semDedup(vecs, cents, tau = 0.35).count()
      }
    }
    spark.stop()
  }
}
