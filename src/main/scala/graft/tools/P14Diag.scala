package graft.tools

import graft.{Graft, Tables}
import graft.pipeline.{MinHashLsh, TextOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-off diagnosis of the p14 sparse-cosine plan at a given SF:
  * where does the time go, what τ does the LSH bootstrap produce, and
  * how big is each intermediate.
  */
object P14Diag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.session(cores = 32, appName = "p14-diag")
    spark.sparkContext.setLogLevel("ERROR")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[diag] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    val tf = TextOps.tokens(docs, "doc_id", "text")
      .groupBy(col("doc_id"), TextOps.hashId(col("token")).as("vid"))
      .agg(count(lit(1)).as("tf"))
    val t = timed("checkpoint tf")(
      tf.select(col("doc_id"), col("vid"), col("tf").cast("long").as("tf"))
        .localCheckpoint(true))
    println(s"[diag] tf rows: ${t.count()}  docs: ${t.select("doc_id").distinct().count()}  vids: ${t.select("vid").distinct().count()}")

    val n2 = t.groupBy("doc_id").agg(sum(col("tf") * col("tf")).as("n2"))

    import graft.pipeline.{SimHash, SparseCosine}
    val shPairs = timed("simhash pairs")(SimHash.nearPairsBucketed(
      SimHash.fingerprintsWeighted(t, "doc_id", "tf"), "doc_id", maxDist = 3)
      .select("id_a", "id_b").localCheckpoint(true))
    println(s"[diag] simhash pairs: ${shPairs.count()}")
    val projPairs = timed("projection candidates")(
      SparseCosine.projectionCandidates(t, n2, "doc_id", neighbors = 8)
        .localCheckpoint(true))
    println(s"[diag] projection pairs: ${projPairs.count()}")
    val cands = shPairs.union(projPairs).distinct().localCheckpoint(true)
    println(s"[diag] union candidate pairs: ${cands.count()}")

    val verified = timed("verify candidates")(cands
      .join(t.select(col("doc_id").as("id_a"), col("vid"), col("tf").as("tfa")), "id_a")
      .join(t.select(col("doc_id").as("id_b"), col("vid"), col("tf").as("tfb")), Seq("id_b", "vid"))
      .groupBy("id_a", "id_b").agg(sum(col("tfa") * col("tfb")).as("i"))
      .join(n2.select(col("doc_id").as("id_a"), col("n2").as("na")), "id_a")
      .join(n2.select(col("doc_id").as("id_b"), col("n2").as("nb")), "id_b")
      .withColumn("c", col("i").cast("double") / sqrt(col("na").cast("double") * col("nb")))
      .select(round(col("c"), 6).as("c"))
      .orderBy(col("c").desc).limit(50).collect())
    println(s"[diag] verified: n=${verified.length} best=${verified.headOption.map(_.getDouble(0))} kth=${verified.lastOption.map(_.getDouble(0))}")
    val tau = math.max(0.0, (if (verified.length < 50) 0.0 else verified.last.getDouble(0)) - 1e-6)
    println(s"[diag] tau = $tau")

    // how much does the SimHash source actually buy? τ from the
    // projection-adjacency candidates alone:
    val projOnly = projPairs
      .join(t.select(col("doc_id").as("id_a"), col("vid"), col("tf").as("tfa")), "id_a")
      .join(t.select(col("doc_id").as("id_b"), col("vid"), col("tf").as("tfb")), Seq("id_b", "vid"))
      .groupBy("id_a", "id_b").agg(sum(col("tfa") * col("tfb")).as("i"))
      .join(n2.select(col("doc_id").as("id_a"), col("n2").as("na")), "id_a")
      .join(n2.select(col("doc_id").as("id_b"), col("n2").as("nb")), "id_b")
      .withColumn("c", col("i").cast("double") / sqrt(col("na").cast("double") * col("nb")))
      .select(round(col("c"), 6).as("c"))
      .orderBy(col("c").desc).limit(50).collect()
    println(s"[diag] proj-only: n=${projOnly.length} kth=${projOnly.lastOption.map(_.getDouble(0))}")

    // prefix stats at this tau
    if (tau > 0) {
      val dfreq = t.groupBy("vid").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("vid"))
      val pre = timed("prefix build")(t.join(dfreq, "vid")
        .join(n2, "doc_id")
        .withColumn("cum", coalesce(sum(col("tf") * col("tf"))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .where((col("n2") - col("cum")).cast("double") >=
          lit(tau * tau - 1e-9) * col("n2"))
        .localCheckpoint(true))
      println(s"[diag] prefix rows: ${pre.count()} (of ${t.count()} tf rows)")
      val byVid = pre.groupBy("vid").agg(count(lit(1)).as("n"))
        .agg(sum((col("n") * (col("n") - 1) / 2).cast("long")).as("pairs_upper"),
          max(col("n")).as("max_postings")).collect()(0)
      println(s"[diag] candidate pair upper bound: ${byVid.getLong(0)}  max posting: ${byVid.getLong(1)}")
      val pairs = timed("pair join+distinct")(
        pre.select(col("doc_id").as("id_a"), col("vid"))
          .join(pre.select(col("doc_id").as("id_b"), col("vid")), "vid")
          .where(col("id_a") < col("id_b"))
          .select("id_a", "id_b").distinct().localCheckpoint(true))
      println(s"[diag] distinct surviving pairs: ${pairs.count()}")
      val fin = timed("final verify")(pairs
        .join(t.select(col("doc_id").as("id_a"), col("vid"), col("tf").as("tfa")), "id_a")
        .join(t.select(col("doc_id").as("id_b"), col("vid"), col("tf").as("tfb")), Seq("id_b", "vid"))
        .groupBy("id_a", "id_b").agg(sum(col("tfa") * col("tfb")).as("i"))
        .join(n2.select(col("doc_id").as("id_a"), col("n2").as("na")), "id_a")
        .join(n2.select(col("doc_id").as("id_b"), col("n2").as("nb")), "id_b")
        .withColumn("c", col("i").cast("double") / sqrt(col("na").cast("double") * col("nb")))
        .select(round(col("c"), 6).as("cosine"))
        .orderBy(col("cosine").desc).limit(50).collect())
      println(s"[diag] final top: ${fin.take(3).map(_.getDouble(0)).mkString(",")}")
    }
    spark.stop()
  }
}
