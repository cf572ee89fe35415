package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Interval alignment — the reference floors every timestamp to its
  * archive's step: `interval = ts - (ts mod secondsPerPoint)` with a
  * floored modulo (reference `src/hoard.coffee:10-11,203,300,440-441`).
  * `pmod` is Spark's floored modulo, so `u - pmod(u, step)` is a true
  * floor for negative epochs too.
  */
object Time {

  /** Floor an epoch-seconds LongType column to a step. */
  def alignEpoch(u: Column, step: Long): Column = u - pmod(u, lit(step))

  /** Floor a TimestampType column to a step, yielding a timestamp.
    * Casting timestamp→long truncates to whole epoch seconds first,
    * matching the reference's uint32-seconds precision.
    */
  def align(ts: Column, step: Long): Column =
    timestamp_seconds(alignEpoch(ts.cast("long"), step))

  /** The reference's fetch window bump: `floor(t/step)*step + step`
    * (`src/hoard.coffee:440-441`) — both bounds move one step past the
    * floor, so the returned window is (from..to] in aligned space.
    */
  def bumpEpoch(u: Long, step: Long): Long =
    (u - java.lang.Math.floorMod(u, step)) + step
}
