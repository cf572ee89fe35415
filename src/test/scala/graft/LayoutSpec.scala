package graft

import graft.store.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkTestBase {

  test("bucketed tables join with zero exchanges (co-located layout)") {
    val dir = "/root/testdata/sf0.001"
    Layout.writeBucketed(Tables.load(spark, dir, "orders"),
      "b_orders", Seq("o_custkey"), 8)
    Layout.writeBucketed(
      Tables.load(spark, dir, "customer")
        .withColumn("c_custkey", col("c_custkey")),
      "b_customer", Seq("c_custkey"), 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = Layout.table(spark, "b_orders")
        .join(Layout.table(spark, "b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      joined.collect() // materialize so the adaptive plan is final
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // the join itself must consume the bucketed layout directly — no
      // shuffle before the join (the post-agg exchange is expected)
      val joinPart = plan.split("SortMergeJoin").last
      assert(!joinPart.contains("Exchange hashpartitioning"),
        s"join inputs were shuffled:\n$plan")
      // and values match the plain (unbucketed) join
      val direct = Tables.load(spark, dir, "orders")
        .join(Tables.load(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      assert(joined.orderBy("c_mktsegment").collect().toSeq ==
        direct.orderBy("c_mktsegment").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("q27_bucketjoin consumes the bucketed layout: no exchange below the SMJ") {
    val df = SparkEntry.queries("q27_bucketjoin")(spark, "/root/testdata/sf0.001")
    df.collect() // materialize so the adaptive plan is final
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    // tree text below the SMJ line is its inputs: bucketed scans only —
    // the agg/sort exchanges above the join are expected and tiny
    val joinPart = plan.split("SortMergeJoin").last
    assert(!joinPart.contains("Exchange hashpartitioning"),
      s"join inputs were shuffled despite bucketing:\n$plan")
  }
}
