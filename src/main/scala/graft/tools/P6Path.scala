package graft.tools
import graft.pipeline.Embeddings
object P6Path {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.session(cores = 8, appName = "p6path")
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val df = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val (res, st) = Embeddings.thresholdCosineTopKWithStats(df, k = 50, kCent = 32, iters = 2, maxQualFrac = 0.6)
      val n = res.count()
      println(s"[p6path] $sf pruned=${st.pruned} qualFrac=${st.qualFrac} rows=$n")
    }
    spark.stop()
  }
}
