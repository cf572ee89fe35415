package graft.store

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Reverse migration: export one series from a [[HoardStore]] back to a
  * whisper/hoard binary file (`src/hoard.coffee:30-69` layout) that any
  * whisper/graphite/hoard reader — including [[HoardImport]] — can
  * consume.
  *
  * Driver-side by design: ONE series' export is bounded by the
  * policy's total ring capacity (the target file IS a fixed-size
  * ring), the same cap rationale as `fetchValues`. Bulk export of many
  * series is a driver loop over this (each file independent); the rows
  * feeding it come off distributed level reads with series + month
  * pruning.
  */
object HoardExport {

  /** Write `series` at clock `now` (explicit, never wall time) to
    * `path`. Each level's rows inside its retention land in the
    * matching archive ring; values are the level's merged
    * (last-write-wins) state, i.e. what `fetch` would serve.
    */
  def toWhisper(st: HoardStore, series: String, path: String,
                now: Long): Unit = {
    val p = st.policy
    val levels = p.sorted.map { ar =>
      val rows = st.readLevel(ar)
        .where(col("series_id") === series)
        .where(col("interval").cast("long") > lit(now - ar.retention))
        .select(col("interval").cast("long"), col("value"))
        .collect() // bounded: at most ar.points live slots
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      require(rows.size <= ar.points,
        s"level ${ar.step} holds ${rows.size} live intervals > ring " +
          s"capacity ${ar.points} — vacuum before export")
      (ar, rows)
    }
    val bytes = WhisperFormat.write(now, p.xff.toFloat, levels)
    val target = Paths.get(path)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    Files.write(target, bytes)
  }
}
