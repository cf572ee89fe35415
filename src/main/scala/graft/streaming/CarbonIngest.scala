package graft.streaming

import graft.store.HoardStore
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Carbon plaintext line-protocol ingress — the write-side half of the
  * graphite ecosystem contract (the render `target` façade is the read
  * side; reference/README.md:11-16 positions hoard as a whisper/graphite
  * store). Carbon's wire format is one datapoint per line:
  *
  *   {{{<metric.path> <value> <timestamp>\n}}}
  *
  * whitespace-separated, integer epoch-second timestamps. A production
  * relay tails these lines off TCP; here the same parse runs as a
  * Structured Streaming transformation over any text stream (file
  * replay in tests, socket/kafka in a deploy) feeding the store's real
  * write path via [[StreamIngest.start]].
  *
  * Scale shape: the parse is pure codegen'd column expressions (split +
  * try_cast — no UDF, no driver round-trip), so it rides inside the
  * micro-batch's whole-stage-codegen span and fans out with input
  * partitions; malformed lines are dropped by filter, never by
  * exception, so one bad producer can't poison a batch.
  */
object CarbonIngest {

  // the three wire fields, as expressions over the raw `value` line.
  // try_cast (never ANSI cast) keeps the malformed path exception-free.
  private def fields: Column = split(trim(col("value")), "\\s+")
  private def seriesF: Column = try_element_at(fields, lit(1))
  private def valueF: Column =
    expr("try_cast(try_element_at(split(trim(value), '\\\\s+'), 2) AS DOUBLE)")
  private def tsF: Column =
    expr("try_cast(try_element_at(split(trim(value), '\\\\s+'), 3) AS BIGINT)")

  /** A line is a datapoint iff: exactly 3 whitespace-separated fields, a
    * non-empty metric path, a finite double value, and a non-negative
    * integer timestamp (whisper's uint32-second semantics). NaN/Inf,
    * fractional or negative timestamps, and short/long lines all fail.
    * Never null: every nullable conjunct sits behind an isNotNull guard.
    */
  private def wellFormed: Column =
    size(fields) === 3 && seriesF =!= "" &&
      tsF.isNotNull && tsF >= 0 &&
      valueF.isNotNull && !isnan(valueF) &&
      valueF =!= Double.PositiveInfinity &&
      valueF =!= Double.NegativeInfinity

  /** Parse a frame of carbon plaintext lines (one STRING column named
    * `value` — the schema of `readStream.text`) into the store's ingest
    * shape (series_id STRING, ts LONG epoch-sec, value DOUBLE).
    * Malformed lines are dropped; [[rejected]] is the dead-letter view.
    */
  def parse(lines: DataFrame): DataFrame =
    lines.where(wellFormed)
      .select(seriesF.as("series_id"), tsF.as("ts"), valueF.as("value"))

  /** Dead-letter complement of [[parse]]: the raw lines parse drops, so
    * an operator can route them to a quarantine sink instead of losing
    * them. Blank lines are excluded — they are framing, not data.
    */
  def rejected(lines: DataFrame): DataFrame =
    lines.where(trim(col("value")) =!= "" && !wellFormed)

  /** Attach a carbon plaintext text stream to a store: parse each
    * micro-batch with [[parse]] and drive the deterministic upsert +
    * cascade through [[StreamIngest.start]]'s foreachBatch path.
    */
  def start(lines: DataFrame, store: HoardStore, clock: () => Long,
            checkpoint: String): StreamingQuery =
    StreamIngest.start(parse(lines), store, clock, checkpoint)
}
