package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All loads are plain parquet scans so Catalyst keeps predicate pushdown
  * and column pruning; the only normalization is `events.ts`, which has
  * shipped in two physical forms across testdata generations —
  * TIMESTAMP(NANOS) (readable only as LongType nanos) and plain
  * timestamp[us] (read as TIMESTAMP_NTZ) — and is normalized to a
  * microsecond TimestampType either way so every downstream query and
  * oracle sees one type.
  */
object Tables {

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalize an events frame's `ts` to session-TZ TimestampType.
    * LongType means nanos: `ts div 1000` is integral floor division — a
    * double division would lose precision (ns epochs ~1.7e18 exceed
    * double's 2^53). Timestamp/NTZ forms are a plain cast (numerically a
    * no-op under the pinned UTC session timezone).
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    Graft.configure(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    name match {
      case "events" => normalizeEventTs(df)
      case _ => df
    }
  }
}
