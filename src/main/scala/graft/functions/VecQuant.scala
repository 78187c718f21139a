package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst kernel for the milli-grid vector quantization
  * `transform(embedding, x => round(cast(x as double) * 1000, 0)
  *            .cast("long"))`
  * that EVERY vector-family query projects before it does anything else
  * (r17 optimization round).
  *
  * The expression-tree form is a higher-order ArrayTransform —
  * CodegenFallback in Spark — so each of the 64 elements paid an
  * interpreted 4-node tree, and Spark's Round for DoubleType allocates
  * two java.math.BigDecimals per element (valueOf → setScale). The
  * vector family derives its `qv` relation 2–5 times per query (corpus
  * pass per ranking + training + stats), so at sf0.1 a single query
  * re-rounded 1.3–6 M elements interpreted; stage profiles put multiple
  * seconds of CPU in exactly these projections (q201's queries/corpus
  * builds, q220's stats+encode passes).
  *
  * Bit-identical semantics, proven case-wise against the expression
  * chain (cast float→double is exact; `* 1000.0` is one double
  * multiply in both forms):
  *  - NULL array → NULL; NULL element → NULL element (cast/round
  *    propagate nulls elementwise).
  *  - d = x * 1000.0 NaN / infinite / beyond long range: the replaced
  *    expression THROWS here under the session's ANSI default
  *    (CAST_OVERFLOW) — unreachable from every call site (embeddings
  *    are finite unit-scale floats; VecQuantSpec pins the defined
  *    region). The kernel is total on that unreachable region instead
  *    (NaN → 0, clamp at Long.Min/MaxValue — the d2l instruction), the
  *    ShingleHash60 strictly-more-defined precedent.
  *  - |d| >= 2^52: d is already integral (ulp >= 1), and
  *    BigDecimal.valueOf(d).setScale(0, HALF_UP) == d.
  *  - |d| < 2^52: Spark rounds HALF_UP on the SHORTEST-DECIMAL value of
  *    d (BigDecimal.valueOf goes through Double.toString). A decimal
  *    boundary "k.5" with |k| < 2^52 is exactly representable in
  *    binary, so the shortest-decimal value of d crosses k.5 exactly
  *    when d itself does — decimal HALF_UP == binary HALF_UP here. And
  *    d + 0.5 (resp. -d + 0.5) is EXACT for |d| < 2^52 (both operands
  *    are multiples of ulp(d) <= 0.5 and the sum stays in exponent
  *    range), so floor(d + 0.5) for d >= 0 and -floor(-d + 0.5) for
  *    d < 0 reproduce HALF_UP-away-from-zero without any BigDecimal.
  * VecQuantSpec locks the equivalence on fixture data plus adversarial
  * boundary values.
  */
case class MilliQuant(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"milli_quant requires array<float|double> input, got $t")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any): Any =
    MilliQuant.compute(a.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MilliQuant.compute($c, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): MilliQuant =
    copy(child = newChild)
}

object MilliQuant {

  private val TwoTo52 = 4503599627370496.0 // 2^52

  /** round(d * 1000, 0).cast(long) for one element — see the case
    * analysis in the class scaladoc. */
  def quant(x: Double): Long = {
    val d = x * 1000.0
    if (java.lang.Double.isNaN(d)) return 0L
    if (java.lang.Double.isInfinite(d) || math.abs(d) >= TwoTo52)
      return d.toLong
    val r = if (d >= 0) math.floor(d + 0.5) else -math.floor(-d + 0.5)
    r.toLong
  }

  /** Invoked from both interpreted eval and generated code. */
  def compute(a: ArrayData, float: Boolean): ArrayData = {
    val n = a.numElements()
    // fast path: no null elements (the fixture arrays) — primitive array
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = a.isNullAt(i); i += 1 }
    if (!hasNull) {
      val res = new Array[Long](n)
      var j = 0
      while (j < n) {
        res(j) = quant(if (float) a.getFloat(j).toDouble else a.getDouble(j))
        j += 1
      }
      new GenericArrayData(res)
    } else {
      val res = new Array[Any](n)
      var j = 0
      while (j < n) {
        if (!a.isNullAt(j))
          res(j) = java.lang.Long.valueOf(
            quant(if (float) a.getFloat(j).toDouble else a.getDouble(j)))
        j += 1
      }
      new GenericArrayData(res)
    }
  }

  private[functions] val NAME = "milli_quant"

  /** Idempotent per session. */
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, NAME)(exprs => MilliQuant(exprs.head))

  /** Column API; requires register(spark) once per session. */
  def apply(v: Column): Column = call_function(NAME, v)
}
