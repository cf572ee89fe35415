package graft.store

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** Reverse migration: export series from a [[HoardStore]] back to
  * whisper/hoard binary files (`src/hoard.coffee:30-69` layout) that
  * any whisper/graphite/hoard reader — including [[HoardImport]] —
  * can consume.
  *
  * [[toWhisper]] is the single-series path, driver-side by design: ONE
  * series' export is bounded by the policy's total ring capacity (the
  * target file IS a fixed-size ring), the same cap rationale as
  * `fetchValues`. [[toWhisperTree]] is the bulk reverse migration — a
  * whole store back to a graphite tree in ONE distributed pass: each
  * level read is month-pruned to its retention window, the union is
  * shuffled once on series_id, and each group (bounded by ring
  * capacity) encodes and writes its file inside an executor task, so
  * an N-series store exports with N-way parallelism instead of a
  * driver loop.
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
        // same window as toWhisperTree's readLevelRange call:
        // (now - retention, now + step) — without the upper clamp a
        // future-dated point would make the two paths' bytes diverge
        // despite the byte-identical contract
        .where(col("interval").cast("long") > lit(now - ar.retention) &&
          col("interval").cast("long") < lit(now + ar.step))
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

  /** Bulk reverse migration: every series of `st` at clock `now` to a
    * graphite tree under `dir` — dotted series names map to
    * subdirectories (`web.srv1.cpu` → `dir/web/srv1/cpu.whisper`,
    * graphite's own layout), dotless names land flat. Rings hold each
    * level's merged last-write-wins state inside its retention, byte-
    * identical to what [[toWhisper]] writes for the same series.
    *
    * Scale shape: one month-pruned scan per level, ONE shuffle (by
    * series_id), one task group per series writing through the Hadoop
    * FS API — no driver materialization, no per-series driver loop.
    * Returns the number of files written.
    */
  def toWhisperTree(st: HoardStore, dir: String, now: Long): Long = {
    val spark = st.spark
    import spark.implicits._
    val p = st.policy
    val xff = p.xff.toFloat
    val archives = p.sorted.map(ar => (ar.step, ar.points))
    val union = p.sorted.map { ar =>
      // month-pruned to the ring span (now - retention, now]; strict >
      // like toWhisper (readLevelRange's >= bound is shifted by 1 s)
      st.readLevelRange(ar, now - ar.retention + 1, now + ar.step)
        .select(col("series_id"),
          lit(ar.step).cast("long").as("step"),
          col("interval").cast("long").as("ts"),
          col("value").cast("double").as("value"))
    }.reduce(_.unionByName(_))
    val ser = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    union.as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (series: String, rows: Iterator[(String, Long, Long, Double)]) =>
        val byStep = rows.toSeq.groupBy(_._2)
        val levels = archives.map { case (step, points) =>
          val pts = byStep.getOrElse(step, Seq.empty).map(r => (r._3, r._4))
          require(pts.size <= points,
            s"series $series level $step holds ${pts.size} live intervals" +
              s" > ring capacity $points — vacuum before export")
          (graft.core.Archive(step, points), pts)
        }
        val bytes = WhisperFormat.write(now, xff, levels)
        val rel = series.split('.').mkString("/") + ".whisper"
        val path = new HPath(dir, rel)
        val fs = path.getFileSystem(ser.value)
        // Task-retry / speculation safety: write to an attempt-unique
        // temp path, then rename into place — two concurrent attempts
        // each produce a complete file and the rename decides, instead
        // of racing interleaved writes on the final path.
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val tmp = new HPath(dir, rel + s".tmp-$attempt")
        val out = fs.create(tmp, true)
        try out.write(bytes) finally out.close()
        fs.delete(path, false)
        if (!fs.rename(tmp, path)) {
          fs.delete(tmp, false)
          require(fs.exists(path),
            s"export rename lost for $series: neither $tmp nor $path")
        }
        series
      }
      .count()
  }
}
