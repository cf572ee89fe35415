package graft

import graft.functions.ArrayDot
import org.apache.spark.sql.SparkSessionExtensions

class FunctionsSpec extends SparkTestBase {

  test("graft_dot evaluates and codegens the array dot product") {
    ArrayDot.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(r == 32.0)
    // null propagation
    assert(spark.sql("SELECT graft_dot(NULL, array(1.0D))").head().isNullAt(0))
    // type check rejects non-double arrays
    intercept[Exception] {
      spark.sql("SELECT graft_dot(array('a'), array('b'))").collect()
    }
  }

  test("graft_dot matches the interpreted fold on real embeddings") {
    import org.apache.spark.sql.functions._
    ArrayDot.register(spark)
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(50)
      .withColumn("vd", transform(col("embedding"), x => x.cast("double")))
    val rows = e.select(
      expr("graft_dot(vd, vd)").as("native"),
      aggregate(zip_with(col("vd"), col("vd"), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x).as("fold")).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("GraftExtensions injects the function builder without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
