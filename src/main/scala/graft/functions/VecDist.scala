package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst kernels for the exact-integer vector-distance hot
  * loops of the ANN/PQ/IVFADC family (r16 optimization round).
  *
  * Every ranking pass in the family scored candidates with
  * `aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), 0L, _ + _)`.
  * Higher-order functions are CodegenFallback in Spark: the lambda is
  * interpreted PER ELEMENT with boxed Longs, and zip_with additionally
  * materializes the 64-element squared-difference array per candidate
  * pair — inside n·Q candidate expansions that interpreted inner loop
  * dominated entire queries (q220/q201/q202 ~2 s each at sf0.1). These
  * kernels fuse the loop into one whole-stage-codegen call: primitive
  * long reads, no intermediate array, no boxing (the CosineSim/AdcSum
  * precedent, guide step "eliminate non-codegen expressions in the hot
  * path").
  *
  * Semantics are the zip_with formulation's, bit for bit: Long
  * arithmetic wraps like non-ANSI Spark; result is NULL when either
  * array is NULL, when lengths differ (zip_with pads the shorter side
  * with nulls, so the fold goes null), or when any element is null.
  * Empty arrays fold to the init value 0L.
  */
object VecDist {

  /** Shared by interpreted eval and generated code. Boxed return: null
    * encodes the zip_with null-propagation cases. */
  def l2sq(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  def dot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** Σ ((q_i − c_i) − b_i)² — the IVFADC residual-vs-codeword distance
    * (query minus coarse centroid, against a PQ codeword), fused so the
    * residual array `zip_with(q, c, _ - _)` is never materialized. */
  def residL2Sq(q: ArrayData, c: ArrayData, b: ArrayData): java.lang.Long = {
    val n = q.numElements()
    if (n != c.numElements() || n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (q.isNullAt(i) || c.isNullAt(i) || b.isNullAt(i)) return null
      val d = q.getLong(i) - c.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  private def okType(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private[functions] def checkArrays(name: String, ts: Seq[DataType]): TypeCheckResult =
    if (ts.forall(okType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires array<bigint> inputs, got ${ts.mkString(" / ")}")

  /** Register all three kernels (idempotent per session). */
  def register(spark: SparkSession): Unit = {
    Registry.ensure(spark, L2SqLong.NAME)(e => L2SqLong(e(0), e(1)))
    Registry.ensure(spark, DotLong.NAME)(e => DotLong(e(0), e(1)))
    Registry.ensure(spark, ResidL2Sq.NAME)(e => ResidL2Sq(e(0), e(1), e(2)))
  }

  /** Exact integer squared L2; requires register(spark) once per session. */
  def l2sq(a: Column, b: Column): Column = call_function(L2SqLong.NAME, a, b)

  /** Exact integer dot product; requires register(spark). */
  def dot(a: Column, b: Column): Column = call_function(DotLong.NAME, a, b)

  /** Fused residual distance Σ((q−c)−b)²; requires register(spark). */
  def residL2Sq(q: Column, c: Column, b: Column): Column =
    call_function(ResidL2Sq.NAME, q, c, b)
}

case class L2SqLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    VecDist.checkArrays(L2SqLong.NAME, Seq(left.dataType, right.dataType))

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDist.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("res")
      s"""
         |java.lang.Long $r = graft.functions.VecDist.l2sq($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqLong =
    copy(left = newLeft, right = newRight)
}

object L2SqLong { private[functions] val NAME = "l2sq_long" }

case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    VecDist.checkArrays(DotLong.NAME, Seq(left.dataType, right.dataType))

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDist.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("res")
      s"""
         |java.lang.Long $r = graft.functions.VecDist.dot($a, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

object DotLong { private[functions] val NAME = "dot_long" }

case class ResidL2Sq(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    VecDist.checkArrays(ResidL2Sq.NAME,
      Seq(first.dataType, second.dataType, third.dataType))

  override def nullSafeEval(q: Any, c: Any, b: Any): Any =
    VecDist.residL2Sq(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c, b) => {
      val r = ctx.freshName("res")
      s"""
         |java.lang.Long $r = graft.functions.VecDist.residL2Sq($q, $c, $b);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): ResidL2Sq =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ResidL2Sq { private[functions] val NAME = "resid_l2sq" }
