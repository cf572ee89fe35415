package graft

import graft.queries.{HoardQueries, PipelineQueries, RelationalQueries}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Gates for the round-6 third-session additions: asymmetric n-gram
  * containment (p45), RAG chunk export (p46), epoch upsampling (p47),
  * Graphite timeStack/weightedAverage (h34/h35), deterministic listagg
  * (q36), and the incremental min-k sketch fold behind s12.
  */
class AdditionsSpec extends SparkTestBase {

  import spark.implicits._

  private val Sf = "/root/testdata/sf0.001"

  // --- p45 containment -------------------------------------------------

  test("p45: containment finds the excerpt Jaccard misses, values exact") {
    val long = (1 to 60).map("w" + _).mkString(" ")
    val excerpt = (10 to 21).map("w" + _).mkString(" ") // 12 tokens inside
    val docs = Seq((1L, long), (2L, excerpt), (3L, "x y z q r s t u v"))
      .toDF("doc_id", "text")
    // sequential mirror over raw 3-shingle string sets
    def sh(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    val sA = sh(excerpt); val sB = sh(long)
    val cont = sA.intersect(sB).size.toDouble / sA.size
    assert(cont == 1.0)
    val jac = sA.intersect(sB).size.toDouble / sA.union(sB).size
    assert(jac < 0.7, "the excerpt must NOT be a Jaccard near-dup")
    val out = spark.createDataFrame(docs.rdd, docs.schema) // defensive copy
    val pairs = containmentOn(out).collect()
    // 2→1 contained (C=1); 1→2 is not (C = 10/58 of the long doc)
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((2L, 1L)))
    assert(pairs.head.getDouble(2) == 1.0)
  }

  /** p45's exact pipeline on an arbitrary docs frame. */
  private def containmentOn(docs: org.apache.spark.sql.DataFrame) = {
    val sh = graft.pipeline.TextOps
      .shinglesOfText(docs, "doc_id", "text", 3)
      .withColumn("vid", graft.pipeline.TextOps.hashId(col("shingle")))
      .select("doc_id", "vid").distinct()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_a"))
      .withColumnRenamed("doc_id", "id_a")
    sh.select(col("doc_id").as("id_a"), col("vid"))
      .join(sh.select(col("doc_id").as("id_b"), col("vid")), "vid")
      .where(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("i"))
      .join(sizes, "id_a")
      .where(col("i") * 10 >= col("n_a") * 8)
      .select(col("id_a"), col("id_b"),
        (round(col("i").cast("double") / col("n_a") * lit(1e6)) /
          lit(1e6)).as("containment"))
  }

  test("p45 on sf0.001: every reported pair verifies against shingle sets") {
    val docs = Tables.load(spark, Sf, "documents")
    val pairs = PipelineQueries.defs("p45_containment")(spark, Sf).collect()
    assert(pairs.nonEmpty, "fixture near-dups must surface as containment")
    val texts = docs.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    def sh(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    pairs.foreach { r =>
      val (a, b) = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      val sA = sh(texts(a)); val sB = sh(texts(b))
      val c = sA.intersect(sB).size.toDouble / sA.size
      assert(c >= 0.8, s"pair ($a,$b) below threshold: $c")
      val rounded = math.round(c * 1e6) / 1e6
      assert(rounded == r.getAs[Double]("containment"))
    }
  }

  // --- p46 chunking ----------------------------------------------------

  test("p46: chunks tile each doc at stride 24 / width 32 with clamped tail") {
    val r = PipelineQueries.defs("p46_chunking")(spark, Sf).collect()
    val docs = Tables.load(spark, Sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .as[(Long, Int)].collect().toMap
    val byDoc = r.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == docs.keySet, "every doc chunks")
    byDoc.foreach { case (id, rows) =>
      val n = docs(id).toLong
      val expected = if (n <= 32) 1L else 1L + (n - 32 + 23) / 24
      assert(rows.length == expected, s"doc $id chunk count")
      val sorted = rows.sortBy(_.getAs[Long]("chunk_idx"))
      sorted.zipWithIndex.foreach { case (row, i) =>
        assert(row.getAs[Long]("chunk_idx") == i.toLong)
        assert(row.getAs[Long]("tok_start") == i * 24L + 1)
        assert(row.getAs[Long]("tok_end") == math.min(i * 24L + 32, n))
      }
      // full coverage: last chunk reaches the last token
      assert(sorted.last.getAs[Long]("tok_end") == n)
    }
  }

  // --- p47 upsampling --------------------------------------------------

  test("p47: per-source epoch counts follow min(4, ceil(max/supply))") {
    val d = Tables.load(spark, Sf, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
    val supply = d.groupBy("source").agg(sum("n_tok").as("supply"))
      .as[(String, Long)].collect().toMap
    val mx = supply.values.max
    val out = PipelineQueries.defs("p47_upsample")(spark, Sf).collect()
    val perSource = out.groupBy(_.getAs[String]("source"))
    perSource.foreach { case (src, rows) =>
      val epochs = math.min(4L, (mx + supply(src) - 1) / supply(src))
      val perDoc = rows.groupBy(_.getAs[Long]("doc_id"))
      perDoc.foreach { case (_, copies) =>
        assert(copies.map(_.getAs[Long]("epoch")).sorted.toSeq ==
          (1L to epochs), s"source $src epoch set")
      }
    }
  }

  // --- h34 / h35 -------------------------------------------------------

  test("h34: the 0w slice is the base series; kw rows equal bucket-k weeks") {
    val stack = HoardQueries.defs("h34_timestack")(spark, Sf).collect()
    // rebuild the hourly lww per event_type directly
    val hourly = Tables.load(spark, Sf, "events")
      .groupBy(col("event_type"),
        graft.core.Time.align(col("ts"), 3600).as("bucket"))
      .agg(max_by(col("value"), col("event_id")).as("v"))
      .select(col("event_type"), col("bucket").cast("string").as("bucket"),
        round(col("v"), 6).as("v"))
      .as[(String, String, Double)].collect()
      .map { case (t, b, v) => (t, b) -> v }.toMap
    assert(stack.nonEmpty)
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
    stack.foreach { r =>
      val t = r.getAs[String]("event_type")
      val b = r.getAs[String]("bucket")
      val k = r.getAs[String]("shift").stripSuffix("w").toInt
      val src = java.time.LocalDateTime.parse(b, fmt).minusDays(7L * k)
        .format(fmt)
      assert(hourly((t, src)) == r.getAs[Double]("value"),
        s"($t,$b,$k) != value at $src")
    }
    // every hourly-by-type slot appears as its own 0w row
    val zeroRows = stack.count(_.getAs[String]("shift") == "0w")
    assert(zeroRows == hourly.size)
  }

  test("h35: weighted average equals the sequential recompute per bucket") {
    val out = HoardQueries.defs("h35_weightedavg")(spark, Sf).collect()
    val ev = Tables.load(spark, Sf, "events")
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .as[(String, java.sql.Timestamp, Long, Double)].collect()
    val perSeries = ev.groupBy { case (t, ts, _, _) =>
      (t, ts.getTime / 3600000L)
    }.map { case (k, rows) =>
      val lww = rows.maxBy(_._3)._4
      k -> (BigDecimal(lww).setScale(6), rows.length.toLong)
    }
    val perBucket = perSeries.groupBy(_._1._2).map { case (b, m) =>
      val vw = m.values.map { case (v, w) => v * w }.sum
      val wt = m.values.map(_._2).sum
      b -> (m.size.toLong, wt,
        math.round((vw / wt).toDouble * 1e6) / 1e6)
    }
    assert(out.length == perBucket.size)
    out.foreach { r =>
      val b = java.time.LocalDateTime.parse(r.getAs[String]("bucket"),
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
        .toEpochSecond(java.time.ZoneOffset.UTC) / 3600
      val (n, wt, wavg) = perBucket(b)
      assert(r.getAs[Long]("n_series") == n)
      assert(r.getAs[Long]("w_total") == wt)
      assert(math.abs(r.getAs[Double]("wavg") - wavg) < 1e-9)
    }
  }

  // --- q36 -------------------------------------------------------------

  test("q36: listagg output is sorted and matches the distinct sets") {
    val out = RelationalQueries.defs("q36_listagg")(spark, Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nations = r.getAs[String]("nations").split(",").toSeq
      assert(nations == nations.sorted, "nations csv sorted")
      assert(nations.distinct == nations, "no duplicate nations")
      assert(r.getAs[Long]("n_nations") == nations.length.toLong)
      val segs = r.getAs[String]("segments").split(",").toSeq
      assert(segs == segs.sorted && segs.distinct == segs)
    }
  }

  // --- s12: min-k fold associativity -----------------------------------

  test("incremental min-k survivor fold == one-pass sketch on random batches") {
    val rnd = new Random(11)
    val k = 16
    // 5 groups x 400 hashes with duplicates across batches
    val all = (1 to 5).flatMap { g =>
      val hs = Seq.fill(400)(rnd.nextLong().abs)
      hs.map(h => (s"g$g", h))
    }
    val batches = rnd.shuffle(all ++ all.take(300)) // re-deliveries too
      .grouped(137).toSeq
    var surv = Map.empty[String, Set[Long]]
    batches.foreach { b =>
      b.groupBy(_._1).foreach { case (g, rows) =>
        val merged = surv.getOrElse(g, Set.empty) ++ rows.map(_._2)
        surv += g -> merged.toSeq.sorted.take(k).toSet
      }
    }
    val onePass = all.groupBy(_._1).map { case (g, rows) =>
      g -> rows.map(_._2).distinct.sorted.take(k).toSet
    }
    assert(surv == onePass)
  }
}
