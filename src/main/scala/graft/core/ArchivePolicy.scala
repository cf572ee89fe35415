package graft.core

/** One resolution level: `(secondsPerPoint, points)` exactly as the
  * reference declares archives (`src/hoard.coffee:57-62,412-418`).
  */
final case class Archive(step: Long, points: Long) {
  require(step > 0, s"step must be positive, got $step")
  require(points > 0, s"points must be positive, got $points")
  /** retention = secondsPerPoint * points (`src/hoard.coffee:416`). */
  def retention: Long = step * points
}

/** A retention policy = ordered archives + the downsample gate factor
  * + the consolidation function.
  *
  * Mirrors the reference's header semantics (`src/hoard.coffee:30-69`)
  * with the validation Python Whisper applies (the reference skips it):
  * archives sorted finest→coarsest, distinct steps, each coarser step a
  * multiple of the finest-above (propagation assumes divisibility), and
  * strictly growing retention so coarser levels always cover more time.
  *
  * `xff` is honored as given — the reference accidentally hardcodes 0.5
  * at create (`src/hoard.coffee:40-46`, bug B1 in SURVEY §2.3); we keep
  * the intended parameter with the same default.
  *
  * `cf` is the consolidation function applied when propagating to
  * coarser archives — the reference ships only the mean and flags the
  * gap itself (`TODO: Another CF besides average?`,
  * `src/hoard.coffee:156`); Whisper's own set is avg/min/max/sum/last.
  */
final case class ArchivePolicy(archives: Seq[Archive], xff: Double = 0.5,
                               cf: String = "avg") {
  require(archives.nonEmpty, "policy needs at least one archive")
  require(xff >= 0.0 && xff <= 1.0, s"xff must be in [0,1], got $xff")
  require(ArchivePolicy.CFs.contains(cf),
    s"cf must be one of ${ArchivePolicy.CFs.mkString("/")}, got $cf")

  val sorted: Seq[Archive] = archives.sortBy(_.step)
  require(sorted.map(_.step).distinct.size == sorted.size,
    "archive steps must be distinct")
  sorted.sliding(2).foreach {
    case Seq(hi, lo) =>
      require(lo.step % hi.step == 0,
        s"coarser step ${lo.step} must be a multiple of finer step ${hi.step}")
      require(lo.retention > hi.retention,
        s"coarser archive must retain longer (${lo.retention} <= ${hi.retention})")
    case _ => ()
  }

  def finest: Archive = sorted.head
  /** maxRetention = max over archives (`src/hoard.coffee:35-38`). */
  def maxRetention: Long = sorted.map(_.retention).max

  /** Finest archive whose retention covers an age — the routing rule used
    * by update (`src/hoard.coffee:192-198`), updateMany (`:257-272`) and
    * fetch (`:437-438`): first archive with `retention >= age`. None when
    * the point is older than every archive (batch path silently drops).
    */
  def forAge(age: Long): Option[Archive] = sorted.find(_.retention >= age)

  /** Index variant of [[forAge]], for archive-level routing columns. */
  def indexForAge(age: Long): Option[Int] = {
    val i = sorted.indexWhere(_.retention >= age)
    if (i < 0) None else Some(i)
  }
}

object ArchivePolicy {
  /** Supported consolidation functions (Whisper's aggregationMethods,
    * plus the cross-engine-deterministic decimal mean).
    */
  val CFs: Set[String] = Set("avg", "avg_exact", "min", "max", "sum", "last")

  /** The reference test policy: 1h×1y + 1d×3y (`test/hoard.test.coffee:95`). */
  val referenceTest: ArchivePolicy =
    ArchivePolicy(Seq(Archive(3600, 8760), Archive(86400, 1095)))
}
