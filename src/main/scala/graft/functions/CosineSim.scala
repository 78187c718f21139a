package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two float vectors.
  *
  * This is the preferred extension point for a scalar the built-in function
  * library lacks (SURVEY §4): a single fused pass computing dot product and
  * both norms, participating in whole-stage codegen — no UDF serialization,
  * no boxing of 64 floats per row, no intermediate zip_with/aggregate
  * arrays. Accumulation is a strict left-to-right double fold so the result
  * is bit-deterministic for a given pair of vectors.
  *
  * Returns null for null inputs, mismatched lengths, or zero-norm vectors.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else {
      // Clamp to the mathematical range: Cauchy-Schwarz holds only in
      // exact arithmetic — the float kernel can land 1 ulp outside
      // [-1, 1], which would break CosineBoundRule's static reasoning
      // (and any caller's acos()). Rounded comparisons are unaffected.
      val v = dot / (math.sqrt(nx) * math.sqrt(ny))
      if (v > 1.0) 1.0 else if (v < -1.0) -1.0 else v
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  int $n = $x.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $x.getFloat($i);
         |    double $yi = (double) $y.getFloat($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  if ($nx == 0.0 || $ny == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |    if (${ev.value} > 1.0) ${ev.value} = 1.0;
         |    if (${ev.value} < -1.0) ${ev.value} = -1.0;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  private val NAME = "cosine_sim"

  /** Register the expression in the session's function registry (idempotent)
    * so it is usable from both the Column API and SQL text. */
  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, NAME)(exprs => CosineSim(exprs(0), exprs(1)))

  /** Column-API entry point; requires register(spark) once per session. */
  def apply(a: Column, b: Column): Column = call_function(NAME, a, b)
}
