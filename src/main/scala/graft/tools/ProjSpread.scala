package graft.tools

import graft.{Graft, Tables}
import graft.pipeline.TextOps
import org.apache.spark.sql.functions._

/** Measures 1-D signed-projection spread of unit TF vectors — sizes the
  * band-join selectivity for the p14 dense regime.
  */
object ProjSpread {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Graft.session(cores = 32, appName = "proj-spread")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    val t = TextOps.tokens(docs, "doc_id", "text")
      .groupBy(col("doc_id"), TextOps.hashId(col("token")).as("vid"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val n2 = t.groupBy("doc_id").agg(sum(col("tf") * col("tf")).as("n2"))
    for (seed <- 1 to 4) {
      val signed = t.withColumn("s",
        when(expr(s"xxhash64(vid, $seed) & 1") === 0, lit(1L)).otherwise(lit(-1L)))
      val proj = signed.groupBy("doc_id").agg(sum(col("tf") * col("s")).as("sp"))
        .join(n2, "doc_id")
        .select((col("sp").cast("double") / sqrt(col("n2"))).as("proj"))
      val st = proj.agg(min("proj"), max("proj"), stddev("proj"),
        expr("percentile(proj, array(0.1, 0.5, 0.9))")).collect()(0)
      println(f"[spread] seed=$seed min=${st.getDouble(0)}%.3f max=${st.getDouble(1)}%.3f sd=${st.getDouble(2)}%.3f pct=${st.getSeq[Double](3).map(v => f"$v%.3f").mkString(",")}")
      // band occupancy at width 0.331 (tau=0.998231)
      val occ = proj.select(floor(col("proj") / 0.331).as("b"))
        .groupBy("b").count().agg(max("count"), count(lit(1))).collect()(0)
      println(s"[spread] seed=$seed maxBucket=${occ.getLong(0)} buckets=${occ.getLong(1)}")
    }
    spark.stop()
  }
}
