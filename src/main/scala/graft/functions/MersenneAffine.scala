package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd affine hash over the Mersenne prime field
  * P = 2^61 − 1:  graft_mersenne(x, a, b) = ((x mod P) · a + b) mod P,
  * x taken to its non-negative residue first (pmod semantics, so
  * negative xxhash64 ids are well-defined).
  *
  * This is the MinHash hash family's inner step. It previously ran as
  * `(pmod(x, P).cast(decimal(38,0)) * a + b) % P` because a·(x mod P)
  * reaches ~2^68 and overflows a long — exact, but Spark's decimal path
  * allocates a BigDecimal per row per hash function, which tripled the
  * whole MinHash pipeline (p2 1.7→4.9 s, p10 3→16.7 s at sf0.1 in
  * round 3). Here the 122-bit product is computed exactly in two longs
  * via `Math.multiplyHigh` (a JIT intrinsic) and reduced with Mersenne
  * folding (2^61 ≡ 1, 2^64 ≡ 8 mod P) — branch-light primitive
  * arithmetic inside whole-stage codegen, bit-identical to the decimal
  * form (property-tested against BigInt in FunctionsSpec) and to the
  * DuckDB HUGEINT oracle.
  *
  * `a` and `b` must be foldable non-negative integral literals below
  * 2^31 (the MinHash family uses a = 2j+3, b = 5j+7) — the fold bounds
  * in [[MersenneAffine.eval]] rely on a < 2^31.
  */
case class MersenneAffine(x: Expression, aExp: Expression, bExp: Expression)
  extends TernaryExpression {

  override def first: Expression = x
  override def second: Expression = aExp
  override def third: Expression = bExp

  private def litVal(e: Expression): Option[Long] =
    if (!e.foldable) None
    else e.eval(null) match {
      case i: Int => Some(i.toLong)
      case l: Long => Some(l)
      case _ => None
    }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (x.dataType != LongType)
      return TypeCheckResult.TypeCheckFailure(
        s"graft_mersenne expects BIGINT x, got ${x.dataType.simpleString}")
    (litVal(aExp), litVal(bExp)) match {
      case (Some(a), Some(b))
        if a >= 0 && a < Int.MaxValue.toLong && b >= 0 && b < Int.MaxValue.toLong =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "graft_mersenne expects foldable integral a, b in [0, 2^31)")
    }
  }

  private lazy val a: Long = litVal(aExp).get
  private lazy val b: Long = litVal(bExp).get

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_mersenne"

  override protected def nullSafeEval(xv: Any, av: Any, bv: Any): Any =
    MersenneAffine.eval(xv.asInstanceOf[Long], a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xg, _, _) => {
      val P = MersenneAffine.P
      val x0 = ctx.freshName("x0")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val r = ctx.freshName("r")
      s"""
         |long $x0 = $xg % ${P}L; if ($x0 < 0) $x0 += ${P}L;
         |long $lo = $x0 * ${a}L;
         |long $hi = java.lang.Math.multiplyHigh($x0, ${a}L);
         |long $r = ($lo & ${P}L) + ($lo >>> 61) + ($hi << 3);
         |$r = ($r & ${P}L) + ($r >>> 61);
         |if ($r >= ${P}L) $r -= ${P}L;
         |$r += ${b}L;
         |if ($r >= ${P}L) $r -= ${P}L;
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): MersenneAffine =
    copy(x = newFirst, aExp = newSecond, bExp = newThird)
}

object MersenneAffine {

  val P = 2305843009213693951L // 2^61 - 1, Mersenne prime

  /** Exact ((x mod P)·a + b) mod P for 0 <= a, b < 2^31.
    *
    * Mersenne folding: the 128-bit product hi·2^64 + lo reduces with
    * 2^64 ≡ 2^3 and 2^61 ≡ 1 (mod P), so
    * v ≡ 8·hi + (lo >>> 61) + (lo & P). With a < 2^31: hi < 2^28, so
    * the fold sum < 2^61 + 2^31 and a single re-fold + one conditional
    * subtract normalizes into [0, P).
    */
  def eval(x: Long, a: Long, b: Long): Long = {
    var x0 = x % P; if (x0 < 0) x0 += P
    val lo = x0 * a
    val hi = Math.multiplyHigh(x0, a)
    var r = (lo & P) + (lo >>> 61) + (hi << 3)
    r = (r & P) + (r >>> 61)
    if (r >= P) r -= P
    r += b
    if (r >= P) r -= P
    r
  }

  /** Register `graft_mersenne` in the session registry (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_mersenne",
      exprs => MersenneAffine(exprs.head, exprs(1), exprs(2)), "scala_udf")
}
