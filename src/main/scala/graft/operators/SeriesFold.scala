package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ordered per-series folds — the recurrence-shaped Graphite series
  * functions (exponentialMovingAverage here) whose state at row t
  * depends on the VALUE computed at row t-1, not just on row t-1's
  * inputs. No window frame can express that (a frame aggregates source
  * rows, it cannot read its own prior output), and the closed form
  * (powers of 1-α) is cross-engine-fragile because `pow` is not
  * correctly-rounded identically across libms. So this is the one
  * series family computed as a typed per-group fold:
  * groupByKey(series) → sort the group by bucket → left fold emitting
  * every intermediate state.
  *
  * Scale contract: the group materialized per key is ONE series'
  * points within retention — bounded by the archive's `points` (the
  * Whisper ring-size invariant, reference `src/hoard.coffee:416`), not
  * by corpus size. Work distributes across series exactly like every
  * other per-series window in the engine; only the fold inside a key
  * is sequential, as the recurrence itself demands.
  *
  * Determinism: the fold performs the same IEEE-754 ops in the same
  * order on any partitioning (`α·x + (1-α)·e`, two multiplies + one
  * add per step), so results are bit-identical to a sequential mirror
  * — and to a DuckDB recursive CTE stepping the same recurrence.
  */
object SeriesFold {

  /** Graphite's exponentialMovingAverage: ema_0 = x_0,
    * ema_t = α·x_t + (1-α)·ema_{t-1}, emitted for every slot.
    * Input columns: series (string), bucket (timestamp), value
    * (double); output (series, bucket, ema) with bucket as epoch
    * seconds preserved through the fold.
    */
  /** Holt double-exponential (linear-trend) smoothing — the
    * level+trend recurrence behind Graphite's holtWinters* family,
    * without the seasonal term:
    *   l_1 = x_1, b_1 = 0;
    *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    * Emits (series, bucket, level, trend, forecast = l_t + b_t — the
    * one-step-ahead prediction for the NEXT slot). Same typed
    * per-series fold contract as the EMA above: group bounded by
    * retention, IEEE op order fixed, bit-identical to a recursive-CTE
    * mirror when α/β are binary-exact constants.
    */
  def holtLinear(df: DataFrame, seriesCol: String, bucketCol: String,
                 valueCol: String, alpha: Double, beta: Double): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val a1 = 1.0 - alpha
    val b1 = 1.0 - beta
    df.select(col(seriesCol).cast("string"),
        col(bucketCol).cast("long"), col(valueCol).cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val rows = it.map(r => (r._2, r._3)).toArray
        java.util.Arrays.sort(rows,
          Ordering.by((p: (Long, Double)) => (p._1, p._2)))
        var l = 0.0; var b = 0.0; var first = true
        rows.iterator.map { case (bkt, v) =>
          if (first) { first = false; l = v; b = 0.0 }
          else {
            val lNew = alpha * v + a1 * (l + b)
            b = beta * (lNew - l) + b1 * b
            l = lNew
          }
          (key, bkt, l, b, l + b)
        }
      }
      .toDF(seriesCol, bucketCol, "level", "trend", "forecast")
      .withColumn(bucketCol, timestamp_seconds(col(bucketCol)))
  }

  /** Additive seasonal Holt-Winters (triple exponential smoothing) —
    * the full recurrence behind Graphite's holtWintersForecast
    * (Graphite docs credit Brutlag 2000; the method is Winters 1960):
    *   t = 0:  l = x_0, b = 0, s_i = 0
    *   t ≥ 1, i = t mod m:
    *     l_t = α·(x_t − s_i) + (1−α)·(l_{t−1} + b_{t−1})
    *     b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *     s_i = γ·(x_t − l_t) + (1−γ)·s_i
    * Emits (series, bucket, level, trend, season = s_i after the
    * update, forecast = l_t + b_t + s_{(t+1) mod m} — the one-step-
    * ahead prediction including the NEXT slot's seasonal index).
    * Cold-start seasonal indices are zero, so the fold needs no
    * dedicated init season — indices converge within a few periods,
    * identically on both engines. Same typed per-series fold contract
    * as the EMA/Holt above: group bounded by retention, IEEE op order
    * fixed, bit-identical to a DuckDB recursive CTE carrying the
    * season vector as a LIST when α/β/γ are binary-exact constants.
    */
  def holtWinters(df: DataFrame, seriesCol: String, bucketCol: String,
                  valueCol: String, alpha: Double, beta: Double,
                  gamma: Double, period: Int): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val a1 = 1.0 - alpha
    val b1 = 1.0 - beta
    val g1 = 1.0 - gamma
    df.select(col(seriesCol).cast("string"),
        col(bucketCol).cast("long"), col(valueCol).cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val rows = it.map(r => (r._2, r._3)).toArray
        java.util.Arrays.sort(rows,
          Ordering.by((p: (Long, Double)) => (p._1, p._2)))
        var l = 0.0; var b = 0.0
        val s = Array.fill(period)(0.0)
        var t = 0
        rows.iterator.map { case (bkt, v) =>
          val idx = t % period
          if (t == 0) { l = v; b = 0.0 }
          else {
            val lNew = alpha * (v - s(idx)) + a1 * (l + b)
            b = beta * (lNew - l) + b1 * b
            s(idx) = gamma * (v - lNew) + g1 * s(idx)
            l = lNew
          }
          t += 1
          (key, bkt, l, b, s(idx), l + b + s(t % period))
        }
      }
      .toDF(seriesCol, bucketCol, "level", "trend", "season", "forecast")
      .withColumn(bucketCol, timestamp_seconds(col(bucketCol)))
  }

  /** Holt-Winters CONFIDENCE BANDS (Brutlag 2000 — the method behind
    * Graphite's holtWintersConfidenceBands/holtWintersAberration): on
    * top of the h25 recurrence, a per-seasonal-slot deviation
    *   d_i = γ·|y_t − ŷ_t| + (1−γ)·d_i
    * where ŷ_t = l_{t−1} + b_{t−1} + s_i is the one-step prediction
    * BEFORE the slot's update, and the band is ŷ ± δ·d_i using the
    * PRE-update deviation (the previous season's estimate — Brutlag's
    * d_{t−m}). Emits (pred, dev, upper, lower, aberrant) with the
    * exact IEEE op order a DuckDB recursive CTE carrying both 24-slot
    * LISTs replays bit-identically (all constants dyadic).
    */
  def holtWintersBands(df: DataFrame, seriesCol: String, bucketCol: String,
                       valueCol: String, alpha: Double, beta: Double,
                       gamma: Double, period: Int,
                       delta: Double): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val a1 = 1.0 - alpha
    val b1 = 1.0 - beta
    val g1 = 1.0 - gamma
    df.select(col(seriesCol).cast("string"),
        col(bucketCol).cast("long"), col(valueCol).cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val rows = it.map(r => (r._2, r._3)).toArray
        java.util.Arrays.sort(rows,
          Ordering.by((p: (Long, Double)) => (p._1, p._2)))
        var l = 0.0; var b = 0.0
        val s = Array.fill(period)(0.0)
        val d = Array.fill(period)(0.0)
        var t = 0
        rows.iterator.map { case (bkt, v) =>
          val idx = t % period
          var pred = v; var dpre = 0.0
          if (t == 0) { l = v; b = 0.0 }
          else {
            pred = l + b + s(idx)
            dpre = d(idx)
            val lNew = alpha * (v - s(idx)) + a1 * (l + b)
            b = beta * (lNew - l) + b1 * b
            s(idx) = gamma * (v - lNew) + g1 * s(idx)
            d(idx) = gamma * math.abs(v - pred) + g1 * d(idx)
            l = lNew
          }
          t += 1
          val upper = pred + delta * dpre
          val lower = pred - delta * dpre
          // y rides along for holtWintersAberration (amount outside the
          // band needs the observed value next to the band edges)
          (key, bkt, v, pred, dpre, upper, lower,
            if (v > upper || v < lower) 1L else 0L)
        }
      }
      .toDF(seriesCol, bucketCol, "y", "pred", "dev", "upper", "lower",
        "aberrant")
      .withColumn(bucketCol, timestamp_seconds(col(bucketCol)))
  }

  def exponentialMovingAverage(df: DataFrame, seriesCol: String,
                               bucketCol: String, valueCol: String,
                               alpha: Double): DataFrame = {
    val spark: SparkSession = df.sparkSession
    import spark.implicits._
    val beta = 1.0 - alpha
    df.select(col(seriesCol).cast("string"),
        col(bucketCol).cast("long"), col(valueCol).cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        // one series within retention: bounded by the level's `points`
        val rows = it.map(r => (r._2, r._3)).toArray
        // secondary key on value: a (series, bucket) collision would
        // otherwise order by arrival and break the bit-determinism
        // contract for callers that feed non-lww-deduped input
        java.util.Arrays.sort(rows,
          Ordering.by((p: (Long, Double)) => (p._1, p._2)))
        var e = 0.0
        var first = true
        rows.iterator.map { case (b, v) =>
          e = if (first) { first = false; v } else alpha * v + beta * e
          (key, b, e)
        }
      }
      .toDF(seriesCol, bucketCol, "ema")
      .withColumn(bucketCol, timestamp_seconds(col(bucketCol)))
  }
}
