package graft.tools

import graft.Tables
import graft.pipeline.TextOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Candidate-volume diagnostic for the ppjoin prefix filter (the shared
  * nearDupPairs stage): computes, WITHOUT running the pair join, the
  * exact number of candidate pairs the prefix equi-join will generate —
  * Σ over shingles of C(prefix_df, 2) — plus the underlying df
  * distribution. This is the number that explains the stage's cost at a
  * new scale factor: the join shuffles exactly this many rows before
  * the distinct/verify.
  *
  * Usage: runMain graft.tools.PairsStats <sfDir> [tau]
  */
object PairsStats {

  /** Closed-form candidate/probe volumes for the pair generators —
    * counts only, never runs a pair join, so it's safe at any SF. The
    * r9 verdict asked for these as a standing bench sidecar: p45/p4's
    * "saturated-vocabulary fixture" attribution stays falsifiable as
    * data grows only if each sweep records the volume that explains
    * its wall time.
    *
    * Keys: ppjoin_candidate_pairs (Σ C(prefix_df, 2) — the prefix
    * generator's join output), symmetric_probe_occ (≥k-of-m window ×
    * full posting list, before id_a<id_b halving — the shipped
    * thresholdPairs counting generator), containment_window_occ (the
    * shipped p45 generator).
    */
  def closedFormVolumes(spark: org.apache.spark.sql.SparkSession,
      dir: String, tau: Double = 0.7,
      tauC: Double = 0.8): Map[String, Long] = {
    val bg = TextOps.shinglesOfText(Tables.load(spark, dir, "documents"),
        "doc_id", "text", 3)
      .select(col("doc_id"), xxhash64(col("shingle")).as("vid"))
      .distinct()
    val sizes = bg.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val dfreq = bg.groupBy("vid").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("vid"))
    val ranked = bg.join(dfreq, "vid")
      .withColumn("r", row_number().over(w))
      .join(sizes, "doc_id")
      .localCheckpoint(true)
    def l0(v: Any): Long = Option(v).map(_.toString.toDouble.toLong).getOrElse(0L)
    val prefPdf = ranked
      .where(col("r") <= col("n") - ceil(lit(tau) * col("n") - lit(1e-9)) + 1)
      .groupBy("vid").agg(count(lit(1)).as("pdf"))
    val cand = l0(prefPdf
      .agg(sum(col("pdf") * (col("pdf") - 1) / 2)).head().get(0))
    val symOcc = l0(ranked
      .where(col("r") <= least(col("n"),
        col("n") - ceil(lit(tau) * col("n") - lit(1e-9)) + lit(3)))
      .groupBy("vid").agg(count(lit(1)).as("pdf"))
      .join(dfreq, "vid")
      .agg(sum(col("pdf") * (col("df") - 1))).head().get(0))
    val contOcc = l0(ranked
      .where(col("r") <= least(col("n"),
        col("n") - ceil(lit(tauC) * col("n") - lit(1e-9)) + lit(3)))
      .groupBy("vid").agg(count(lit(1)).as("pdf"))
      .join(dfreq, "vid")
      .agg(sum(col("pdf") * (col("df") - 1))).head().get(0))
    ranked.unpersist()
    Map("ppjoin_candidate_pairs" -> cand,
      "symmetric_probe_occ" -> symOcc,
      "containment_window_occ" -> contOcc)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val tau = if (args.length > 1) args(1).toDouble else 0.7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = graft.Graft.session(cores = cpus.toInt,
      appName = "graft-pairs-stats")
    spark.sparkContext.setLogLevel("WARN")

    val bg = TextOps.shinglesOfText(Tables.load(spark, dir, "documents"),
        "doc_id", "text", 3)
      .select(col("doc_id"), xxhash64(col("shingle")).as("vid"))
      .distinct()
    val sizes = bg.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val dfreq = bg.groupBy("vid").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("vid"))
    val prefix = bg.join(dfreq, "vid")
      .withColumn("r", row_number().over(w))
      .join(sizes, "doc_id")
      .where(col("r") <= col("n") - ceil(lit(tau) * col("n") - lit(1e-9)) + 1)

    val pdf = prefix.groupBy("vid").agg(count(lit(1)).as("pdf"))
      .localCheckpoint(true)
    val stats = pdf.agg(
      count(lit(1)).as("prefix_shingles"),
      sum(col("pdf")).as("prefix_rows"),
      sum(col("pdf") * (col("pdf") - 1) / 2).as("candidate_pairs"),
      max(col("pdf")).as("max_pdf")).head()
    val docs = sizes.agg(count(lit(1)), sum(col("n")),
      avg(col("n"))).head()
    println(s"docs=${docs.get(0)} shingle_rows=${docs.get(1)} " +
      s"avg_set=${docs.get(2)}")
    println(s"prefix_shingles=${stats.get(0)} prefix_rows=${stats.get(1)} " +
      s"candidate_pairs=${stats.get(2)} max_prefix_df=${stats.get(3)}")
    // the SHIPPED symmetric generator (Jaccard.thresholdPairs, ≥k-of-m):
    // window A (m = min(n, ℓ+2) rarest) probes FULL posting lists —
    // in-stage occurrence volume is Σ_vid win_pdf·(df−1)/2 (the
    // id_a<id_b predicate halves it in expectation), NOT Σ C(pdf,2)
    val winS = bg.join(dfreq, "vid")
      .withColumn("r", row_number().over(w))
      .join(sizes, "doc_id")
      .where(col("r") <= least(col("n"),
        col("n") - ceil(lit(tau) * col("n") - lit(1e-9)) + lit(3)))
    val volS = winS.groupBy("vid").agg(count(lit(1)).as("pdf"))
      .join(dfreq, "vid")
      .agg(sum(col("pdf") * (col("df") - 1))).head().get(0)
    println(s"symmetric tau=$tau probe_occurrences=$volS (k-of-m window x full, before id_a<id_b halving)")
    // the heaviest posting lists: where the pairs come from
    pdf.orderBy(col("pdf").desc).limit(10).collect()
      .foreach(r => println(s"hot vid=${r.get(0)} prefix_df=${r.get(1)}"))

    // counts-only mode: the surviving-occurrence counts below RUN the
    // probe joins (the expensive part) — at a big SF pass countsOnly
    // to get just the closed-form volumes, which never join
    val countsOnly = sys.env.get("PAIRS_STATS_COUNTS_ONLY").contains("1")

    // occurrences surviving the in-stage positional + size-ratio
    // filters (what actually reaches the distinct's shuffle post-fix),
    // and the distinct pair count the verify join then scores
    val alpha = ceil(lit(tau / (1.0 + tau)) *
      (col("na") + col("nb")) - lit(1e-9))
    if (!countsOnly) {
      val surv = prefix.select(col("doc_id").as("id_a"), col("vid"),
          col("r").as("ra"), col("n").as("na"))
        .join(prefix.select(col("doc_id").as("id_b"), col("vid"),
          col("r").as("rb"), col("n").as("nb")), "vid")
        .where(col("id_a") < col("id_b"))
        .where(least(col("na"), col("nb")).cast("double") >=
          lit(tau) * greatest(col("na"), col("nb")))
        .where(lit(1) + least(col("na") - col("ra"), col("nb") - col("rb"))
          >= alpha)
        .select("id_a", "id_b").localCheckpoint(true)
      println(s"surviving_occurrences=${surv.count()} " +
        s"distinct_pairs=${surv.distinct().count()}")
    }

    // ---- containment path (p45: C(a→b) ≥ tauC, asymmetric) ----
    // prefix length is the same n − ⌈τ·n⌉ + 1 formula, but the probe
    // joins A-prefix occurrences against FULL posting lists (no
    // right-hand prefix exists for containment), so the pre-filter
    // volume is Σ_vid prefix_df·(df−1) — computed here without the
    // join — and the positional/size filters prune in-stage.
    val tauC = if (args.length > 2) args(2).toDouble else 0.8
    // the ≥k-of-m group-probe generator (minShared = 3) probes A's
    // m = min(n, ℓ+2) rarest tokens; print both the legacy ℓ-prefix
    // volume and the m-window volume the shipped generator pays
    val prefC = bg.join(dfreq, "vid")
      .withColumn("r", row_number().over(w))
      .join(sizes, "doc_id")
      .where(col("r") <= col("n") - ceil(lit(tauC) * col("n") - lit(1e-9)) + 1)
    val pdfC = prefC.groupBy("vid").agg(count(lit(1)).as("pdf"))
    val volC = pdfC.join(dfreq, "vid")
      .agg(sum(col("pdf") * (col("df") - 1))).head().get(0)
    println(s"containment tau=$tauC probe_occurrences=$volC (l-prefix)")
    val winC = bg.join(dfreq, "vid")
      .withColumn("r", row_number().over(w))
      .join(sizes, "doc_id")
      .where(col("r") <= least(col("n"),
        col("n") - ceil(lit(tauC) * col("n") - lit(1e-9)) + lit(3)))
    val pdfW = winC.groupBy("vid").agg(count(lit(1)).as("pdf"))
    val volW = pdfW.join(dfreq, "vid")
      .agg(sum(col("pdf") * (col("df") - 1))).head().get(0)
    println(s"containment tau=$tauC probe_occurrences=$volW (k-of-m window)")
    if (!countsOnly) {
      val ranked = bg.join(dfreq, "vid")
        .withColumn("r", row_number().over(w))
        .join(sizes, "doc_id")
      val minI = ceil(lit(tauC) * col("na") - lit(1e-9))
      val survC = prefC.select(col("doc_id").as("id_a"), col("vid"),
          col("r").as("ra"), col("n").as("na"))
        .join(ranked.select(col("doc_id").as("id_b"), col("vid"),
          col("r").as("rb"), col("n").as("nb")), "vid")
        .where(col("id_a") =!= col("id_b"))
        .where(col("nb").cast("double") >= lit(tauC) * col("na") - lit(1e-9))
        .where(lit(1) + least(col("na") - col("ra"), col("nb") - col("rb"))
          >= minI)
        .select("id_a", "id_b").localCheckpoint(true)
      println(s"containment surviving_occurrences=${survC.count()} " +
        s"distinct_pairs=${survC.distinct().count()}")
    }
    spark.stop()
  }
}
