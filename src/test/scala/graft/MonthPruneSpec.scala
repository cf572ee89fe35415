package graft

import graft.core.{Archive, ArchivePolicy}
import graft.store.HoardStore
import graft.store.HoardStore.RawPoint
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** The MonthPrune optimizer rule: an ad-hoc interval-range filter over
  * a raw level scan must prune to the covered month partitions — the
  * plan fact that turns "list 600 months" into "list 2" for readers
  * that bypass the store API.
  */
class MonthPruneSpec extends SparkTestBase {

  private val policy = ArchivePolicy(Seq(Archive(3600, 17520)))
  private val now = 1700000000L // 2023-11-14 UTC

  private def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] = {
    df.collect()
    def flatten(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case o                        => o.children
      }
      p +: kids.flatMap(flatten)
    }
    flatten(df.queryExecution.executedPlan)
      .collect { case s: FileSourceScanExec => s }
  }

  test("interval range filter on a raw level scan prunes to the covered months") {
    val root = tmpDir("prune-store") + "/store"
    val st = HoardStore.create(spark, root, policy)
    // five months of hourly points (Jul..Nov 2023)
    val pts = (0 until 150).map(i =>
      RawPoint("s", now - i.toLong * 86400, i.toDouble))
    st.updateMany(pts, now)

    val level = spark.read.parquet(s"$root/level=3600")
    // a 3-day window in October, filtered on the DATA column only
    val lo = java.sql.Timestamp.from(java.time.Instant.parse("2023-10-10T00:00:00Z"))
    val hi = java.sql.Timestamp.from(java.time.Instant.parse("2023-10-13T00:00:00Z"))
    val q = level.where(col("interval") >= lit(lo) && col("interval") < lit(hi))

    val s0 = scans(q)
    assert(s0.nonEmpty)
    // the rule injected a p_month predicate → it lands in the scan's
    // partitionFilters, and only October survives partition pruning
    assert(s0.exists(_.partitionFilters.exists(
        _.references.exists(_.name == "p_month"))),
      "no p_month partition filter reached the scan — MonthPrune did not fire")
    val parts = s0.map(_.relation.location.listFiles(
      s0.head.partitionFilters, Nil).size).sum
    assert(parts <= 1, s"expected <= 1 month partition after pruning, got $parts")

    // correctness: identical rows to the manually-pruned store read
    val viaApi = st.readLevelRange(Archive(3600, 17520),
        lo.toInstant.getEpochSecond, hi.toInstant.getEpochSecond)
      .select("series_id", "interval", "value").collect().toSet
    val viaRaw = q.select("series_id", "interval", "value").collect().toSet
    assert(viaRaw == viaApi, "MonthPrune changed query results")
  }

  test("rule leaves filters alone when p_month is already constrained or bounds are open") {
    val root = tmpDir("prune-store2") + "/store"
    val st = HoardStore.create(spark, root, policy)
    st.updateMany((0 until 40).map(i =>
      RawPoint("s", now - i.toLong * 86400, i.toDouble)), now)
    val level = spark.read.parquet(s"$root/level=3600")

    // open upper bound: no month list derivable — plan unchanged (no
    // p_month filter), full results
    val lo = java.sql.Timestamp.from(java.time.Instant.parse("2023-10-10T00:00:00Z"))
    val open = level.where(col("interval") >= lit(lo))
    assert(!scans(open).exists(_.partitionFilters.exists(
        _.references.exists(_.name == "p_month"))),
      "MonthPrune fired on a half-open range")

    // explicit p_month predicate: the rule must not double-add
    val manual = level.where(col("p_month") === "2023-10" &&
      col("interval") >= lit(lo))
    assert(manual.count() ==
      level.where(col("p_month") === "2023-10")
        .where(col("interval") >= lit(lo)).count())
  }
}
