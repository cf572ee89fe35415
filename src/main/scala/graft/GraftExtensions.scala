package graft

import graft.functions.{ArrayDot, MersenneAffine}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session-extension entry point — lets a deploy wire the library's
  * custom expressions into every session via
  * `spark.sql.extensions=graft.GraftExtensions` (the standard library
  * integration path; no code changes in the consuming app). Sessions we
  * build ourselves call `ArrayDot.register` directly instead.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "graft_dot"),
      (exprs: Seq[Expression]) => ArrayDot(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_mersenne"),
      new ExpressionInfo(classOf[MersenneAffine].getName, "graft_mersenne"),
      (exprs: Seq[Expression]) =>
        MersenneAffine(exprs.head, exprs(1), exprs(2))))
    // Spark's own Bloom expressions, not publicly registered upstream —
    // see graft.functions.BloomFunctions
    e.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (exprs: Seq[Expression]) =>
        BloomFilterAggregate(exprs.head, exprs(1), exprs(2), 0, 0)))
    e.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName,
        "graft_might_contain"),
      (exprs: Seq[Expression]) =>
        BloomFilterMightContain(exprs.head, exprs(1))))
  }
}
