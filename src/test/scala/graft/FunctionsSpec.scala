package graft

import graft.functions.{ArrayDot, MersenneAffine}
import org.apache.spark.sql.SparkSessionExtensions

class FunctionsSpec extends SparkTestBase {

  test("graft_mersenne matches BigInt arithmetic on random and edge inputs") {
    val P = BigInt(MersenneAffine.P)
    val rnd = new scala.util.Random(42)
    val edges = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue,
      MersenneAffine.P, MersenneAffine.P - 1, MersenneAffine.P + 1)
    val xs = edges ++ Seq.fill(2000)(rnd.nextLong())
    for (x <- xs; j <- Seq(0, 1, 7, 15, 31)) {
      val a = 2L * j + 3; val b = 5L * j + 7
      val expected = (((BigInt(x) mod P) * a + b) mod P).toLong
      assert(MersenneAffine.eval(x, a, b) == expected,
        s"x=$x a=$a b=$b")
    }
  }

  test("graft_mersenne evaluates identically via codegen SQL and via eval") {
    MersenneAffine.register(spark)
    import spark.implicits._
    val xs = Seq(0L, -1L, Long.MaxValue, Long.MinValue, 123456789L,
      MersenneAffine.P, -MersenneAffine.P - 5)
    val got = xs.toDF("x")
      .selectExpr("x", "graft_mersenne(x, 35, 82) AS h")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach(x => assert(got(x) == MersenneAffine.eval(x, 35L, 82L)))
    // null propagation
    assert(spark.sql("SELECT graft_mersenne(CAST(NULL AS BIGINT), 3, 7)")
      .head().isNullAt(0))
    // non-foldable / wrong-typed params rejected
    intercept[Exception] {
      spark.sql("SELECT graft_mersenne(1L, 'a', 7)").collect()
    }
  }

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
