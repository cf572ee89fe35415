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

  /** Streaming file-source over a testdata table. The driver data ships
    * a table as ONE FILE at `dir/name.parquet`, where the file stream
    * source needs `load(dir)` plus a pathGlobFilter on the basename;
    * a Spark-written table (e.g. ScaleGen's sf1) is a DIRECTORY at the
    * same path, where the glob would match no leaf file and the stream
    * silently reads nothing — there the directory itself is the source
    * path. Schema is pinned from the batch read (file streams cannot
    * infer), and `events.ts` gets the same normalization as [[load]].
    */
  def loadStream(spark: SparkSession, dir: String, name: String): DataFrame = {
    Graft.configure(spark)
    val path = s"$dir/$name.parquet"
    val schema = spark.read.parquet(path).schema
    // Directory check via the Hadoop FS API so it matches whatever
    // filesystem the path actually lives on (local, HDFS, S3A…) — a
    // java.io.File check is always false off the local FS and would
    // silently re-trigger the empty-glob failure this branch prevents.
    val hPath = new org.apache.hadoop.fs.Path(path)
    val isDir = hPath.getFileSystem(spark.sessionState.newHadoopConf())
      .getFileStatus(hPath).isDirectory
    val base =
      if (isDir)
        spark.readStream.schema(schema).parquet(path)
      else
        spark.readStream.schema(schema)
          .option("pathGlobFilter", s"$name.parquet").parquet(dir)
    name match {
      case "events" => normalizeEventTs(base)
      case _ => base
    }
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
