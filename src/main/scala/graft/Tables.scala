package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst keeps predicate pushdown
  * and column pruning; the only normalization is `events.ts`, which arrives
  * as TIMESTAMP(NANOS) (readable only as LongType nanos) and is converted
  * to a microsecond TimestampType using exact integer division.
  */
object Tables {

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    Graft.configure(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    name match {
      case "events" =>
        // `ts div 1000` is integral floor division — a double division here
        // would lose precision (ns epochs ~1.7e18 exceed double's 2^53).
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
}
