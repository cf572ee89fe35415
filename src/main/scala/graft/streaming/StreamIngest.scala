package graft.streaming

import graft.store.HoardStore
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming ingress feeding the batch write path — SURVEY
  * §3.4: streaming is only the ingress; rollups stay batch-recomputable
  * because points may arrive arbitrarily late *within retention*
  * (Whisper's raison d'être), which rules out watermark-closed
  * aggregation. Each micro-batch runs the store's deterministic
  * upsert + cascade; a watermark (if configured upstream) bounds only
  * dedup state, never rollup finality.
  */
object StreamIngest {

  /** Attach a streaming frame of (series_id STRING, ts LONG epoch-sec,
    * value DOUBLE) to a store. `now` is resolved per batch by the
    * caller-supplied clock so tests stay deterministic.
    */
  def start(stream: DataFrame, store: HoardStore, clock: () => Long,
            checkpoint: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) store.updateManyDf(batch, clock())
      }
      .start()

  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class Session(series_id: String, start: Long, end: Long,
                           n: Long, sum: Double)

  /** Custom streaming state via flatMapGroupsWithState: gap-based
    * sessionization per series. A session closes when a point arrives
    * more than `gapSec` after the previous one; closed sessions are
    * emitted, the open session rides in GroupState across micro-batches.
    * (No timeout dependency — deterministic under replay.)
    */
  def sessionize(events: Dataset[(String, Long, Double)], gapSec: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[(String, Long, Double)],
         state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(_._2)
          var open = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { case (_, ts, v) =>
            open match {
              case Some(s) if ts >= s.start - gapSec && ts - s.last <= gapSec =>
                // in-gap point (possibly a cross-batch late arrival just
                // before the open session) — extend bounds, never regress
                open = Some(SessionState(math.min(s.start, ts),
                  math.max(s.last, ts), s.n + 1, s.sum + v))
              case Some(s) if ts < s.start - gapSec =>
                // late point from a gap-separated EARLIER island: emit it
                // as its own closed session, leave the open one alone
                // (known limitation: several such stragglers arriving in
                // different batches each close separately)
                closed += Session(key, ts, ts, 1, v)
              case Some(s) =>
                closed += Session(key, s.start, s.last, s.n, s.sum)
                open = Some(SessionState(ts, ts, 1, v))
              case None =>
                open = Some(SessionState(ts, ts, 1, v))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }

  /** Streaming aggregation example over the events shape: watermarked
    * tumbling hourly counts/means per series — the declarative
    * streaming analogue of the finest archive.
    */
  def hourlyAggregates(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "1 hour")
      .groupBy(col("series_id"), window(col("ts"), "1 hour"))
      // decimal-exact sum -> one double division: the mean is identical
      // regardless of partial-aggregation order (oracle parity)
      .agg(count(lit(1)).as("n"),
        (sum(col("value").cast("decimal(18,6)")).cast("double") /
          count(col("value"))).as("mean_value"),
        max(col("value")).as("max_value"))
      .select(col("series_id"), col("window.start").as("bucket"),
        col("n"), col("mean_value"), col("max_value"))
}
