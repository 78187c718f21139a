package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native Catalyst expression: all hyperplane-LSH band hashes of a float
  * vector in ONE fused pass (sign random projection).
  *
  * Replaces q41's 48 separate CosineSim kernel invocations per row — each
  * of which re-read the vector and re-computed its norm — with a single
  * loop that accumulates every hyperplane dot product and the vector norm
  * together (the round-2 verdict's watch item (a): the ids-only LSH plan
  * was scale-correct but paid a 48× kernel cost for the signature).
  *
  * Bit semantics are EXACTLY the composed form's, so the DuckDB oracle is
  * unchanged: hyperplane j (0-based) has ±1 weights derived from the
  * shared md5-60bit hash of "j|i" (i = 1-based dimension,
  * SimHash64.tokenHash60); bit j is set iff round(cos, 6) >= 0 where
  * cos = dot / (sqrt(norm²) * sqrt(dim)) accumulated in the same strict
  * left-to-right order as CosineSim (±1 weights make each term exact, so
  * the doubles are bit-identical to the CosineSim formulation). A
  * zero-norm or wrong-length vector yields all-zero bands (the composed
  * form's CosineSim returned null there, which the surrounding
  * `when(... >= 0, bit).otherwise(0)` collapsed to 0).
  *
  * Output: array<int> of `bands` band hashes, `bits` sign bits each.
  */
case class LshBands(child: Expression, bands: Int, bits: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"lsh_bands requires array<float>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    LshBands.compute(input.asInstanceOf[ArrayData], bands, bits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshBands.compute($c, $bands, $bits, $dim)")

  override protected def withNewChildInternal(newChild: Expression): LshBands =
    copy(child = newChild)
}

object LshBands {

  /** Sign masks per hyperplane: bit (i-1) set = +1 weight for dimension i
    * (1-based derivation string "j|i", identical to the composed form and
    * to the oracle's md5 reconstruction). Cached per geometry — the
    * matrix is tiny (bands×bits longs) but derives via md5. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Long]]()

  private def weights(bands: Int, bits: Int, dim: Int): Array[Long] =
    cache.computeIfAbsent((bands, bits, dim), { _ =>
      require(dim <= 64, s"sign masks are 64-bit: dim $dim > 64")
      Array.tabulate(bands * bits) { j =>
        var mask = 0L
        var i = 1
        while (i <= dim) {
          val h = SimHash64.tokenHash60(
            s"$j|$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          if ((h & 1L) == 1L) mask |= (1L << (i - 1))
          i += 1
        }
        mask
      }
    })

  /** Invoked from both interpreted eval and generated code. */
  def compute(arr: ArrayData, bands: Int, bits: Int, dim: Int): ArrayData = {
    val out = new Array[Int](bands)
    val n = arr.numElements()
    if (n == dim) {
      val w = weights(bands, bits, dim)
      val planes = bands * bits
      val dots = new Array[Double](planes)
      var nx = 0.0
      var i = 0
      while (i < n) {
        val xi = arr.getFloat(i).toDouble
        nx += xi * xi
        var j = 0
        while (j < planes) {
          // ±1 weights: xi * w is exactly ±xi, so adding/subtracting here
          // is bit-identical to CosineSim's dot += xi * wi fold
          if (((w(j) >>> i) & 1L) == 1L) dots(j) += xi else dots(j) -= xi
          j += 1
        }
        i += 1
      }
      if (nx != 0.0) {
        val denom = math.sqrt(nx) * math.sqrt(dim.toDouble)
        var j = 0
        while (j < planes) {
          var v = dots(j) / denom
          if (v > 1.0) v = 1.0 else if (v < -1.0) v = -1.0
          // bit = round(v, 6) >= 0 (HALF_UP, matching Spark's round);
          // only |v| < 1e-5 can change sign under 6-digit rounding, so
          // the BigDecimal is off the hot path
          val nonneg =
            if (v >= 1e-5) true
            else if (v <= -1e-5) false
            else java.math.BigDecimal.valueOf(v)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue() >= 0
          if (nonneg) out(j / bits) |= (1 << (j % bits))
          j += 1
        }
      }
    }
    new GenericArrayData(out)
  }

  private val NAME = "lsh_bands"

  /** Register with a fixed geometry (the Column API cannot carry non-column
    * constructor args through the function registry). */
  def register(spark: SparkSession, bands: Int, bits: Int, dim: Int): Unit =
    Registry.ensure(spark, NAME, (bands, bits, dim))(
      exprs => LshBands(exprs.head, bands, bits, dim))

  /** Column-API entry point; requires register(spark, ...) once per session. */
  def apply(c: Column): Column = call_function(NAME, c)
}
