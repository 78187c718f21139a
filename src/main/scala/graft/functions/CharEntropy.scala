package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native Catalyst expression: per-document character-distribution stats —
  * struct(n_distinct_chars BIGINT, entropy DOUBLE) of the codepoint
  * histogram, in one fused JVM pass per row.
  *
  * This is q98's kernel. The declarative form (explode the char index
  * range → (doc, ch)-keyed count → per-doc entropy aggregate) shuffles one
  * row PER CHARACTER — at 100 TB that is a corpus-sized exchange for a
  * quantity that is per-row computable. Per-document entropy depends only
  * on that document's bytes, so the right plan is map-only; this
  * expression restores that, keeping the scan → project → sort pipeline
  * with zero data-sized shuffles (the presentation sort is the only
  * exchange left).
  *
  * Determinism: the entropy sum runs over the histogram in ASCENDING
  * CODEPOINT order — a canonical order, so results are reproducible
  * bit-for-bit across partitionings and runs. Cross-engine (DuckDB sums in
  * its own order, libm vs JVM log) the residual is ulp-scale, absorbed by
  * the caller's round(·, 4) exactly as the previous two-aggregate form
  * argued. Codepoint-counted (not UTF-16 units), matching SQL length()/
  * substr() semantics in both engines.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CharEntropy.Schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"char_entropy requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {

  val Schema: StructType = StructType(Seq(
    StructField("n_distinct_chars", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  private val Log2 = math.log(2.0)

  /** Invoked from both interpreted eval and generated code. */
  def compute(s: org.apache.spark.unsafe.types.UTF8String): InternalRow = {
    // codepoint histogram in sorted order (TreeMap): canonical sum order
    val counts = new java.util.TreeMap[Integer, Integer]()
    var n = 0L
    val it = s.toString.codePoints().iterator()
    while (it.hasNext) {
      val cp = it.next()
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1 else prev + 1)
      n += 1
    }
    var h = 0.0
    if (n > 0) {
      val vals = counts.values().iterator()
      while (vals.hasNext) {
        val p = vals.next().doubleValue() / n
        h -= p * (math.log(p) / Log2)
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](counts.size().toLong, h))
  }

  private val NAME = "char_entropy"

  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, NAME)(exprs => CharEntropy(exprs.head))

  /** Column-API entry point; requires register(spark) once per session. */
  def apply(c: Column): Column = call_function(NAME, c)
}
