package graft

import org.apache.spark.sql.SparkSession

/** Session factory + idempotent config for driver-provided sessions.
  *
  * Scale stance: these configs are local-mode defaults; on a real cluster the
  * same code runs unchanged — AQE handles skew/coalescing, shuffle partitions
  * are sized by the deploy, and all operators below are expressed as
  * declarative plans so Catalyst can re-plan at any scale.
  */
object Graft {

  def session(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        sys.props("java.io.tmpdir") + "/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    configure(spark)
  }

  /** Idempotent dynamic settings, safe to apply to a session we did not
    * build (the test driver constructs its own). Only dynamic confs here.
    */
  def configure(spark: SparkSession): SparkSession = {
    // The `events` table is written with parquet TIMESTAMP(NANOS), which
    // Spark only reads as LongType behind this flag; Tables.load converts
    // back to a microsecond TimestampType column.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // month-partition pruning derived from interval predicates on raw
    // level scans (graft.plans.MonthPrune) — idempotent add
    if (!spark.experimental.extraOptimizations.contains(graft.plans.MonthPrune))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.MonthPrune
    spark
  }
}
