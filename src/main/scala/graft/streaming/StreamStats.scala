package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Per-stream progress capture for the benchmark: wall time on a
  * Structured Streaming query is ~80% session/source startup at test
  * scale, so regressions in the actual processing path are invisible
  * without a throughput number. Each streaming query records its
  * progress summary here after processAllAvailable(); Bench emits it
  * alongside wall time.
  *
  * rows_per_sec is computed over triggerExecution time — the
  * micro-batch processing clock, which excludes query startup. When
  * the source delivers more than one batch the first is dropped too
  * (listing + codegen land there); with a single batch the full batch
  * time is used, and `batches` makes that visible.
  */
object StreamStats {

  final case class Stat(batches: Int, inputRows: Long, rowsPerSec: Double)

  private val stats = new java.util.concurrent.ConcurrentHashMap[String, Stat]()

  def record(name: String, q: StreamingQuery): Unit = {
    val ps = q.recentProgress.toSeq
    // processAllAvailable appends an empty flush batch; only batches
    // that moved rows measure throughput
    val work = ps.filter(_.numInputRows > 0)
    val tail = if (work.length > 1) work.tail else work
    val rows = tail.map(_.numInputRows).sum
    val ms = tail.flatMap(p =>
      Option(p.durationMs.get("triggerExecution")).map(_.toLong)).sum
    val rps = if (ms > 0) rows * 1000.0 / ms else -1.0
    stats.put(name, Stat(ps.length, ps.map(_.numInputRows).sum, rps))
  }

  def get(name: String): Option[Stat] = Option(stats.get(name))
}
