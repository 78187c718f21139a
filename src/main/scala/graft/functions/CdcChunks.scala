package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: fused content-defined chunker — q226's
  * whole per-document kernel (all three boundary moduli) in ONE
  * generated call over the raw text.
  *
  * Semantics (bit-identical to the expression-tree form it replaces,
  * and to the DuckDB oracle): tokens split on single spaces (Java
  * split semantics with limit −1 — consecutive/trailing empties kept,
  * matching Spark's `split(text, " ")`); per token the repo's md5-60
  * PRF (SimHash64.tokenHash60 — leading 15 hex digits as a long); a
  * token whose hash ≡ 0 (mod B) CLOSES its chunk, trailing tokens form
  * a final partial chunk; a chunk's key is the packed double 31-bit
  * polynomial rolling hash over the token-hash run —
  * (Σ 131-poly mod 2147483629)·2^31 + (Σ 137-poly mod 2147483647) —
  * all intermediates < 2^39, so both engines reproduce the integer
  * arithmetic exactly. Output: array<struct<bmod, k, l>> holding every
  * chunk for every modulus in {4, 8, 16}, exploded by the caller.
  *
  * Why a kernel: the expression-tree form evaluated interpreted
  * higher-order lambdas per token per modulus (filter + indexed
  * transform + per-chunk slice/aggregate folds) — 43 s at sf1 against
  * 3 s for this loop, which hashes each token ONCE and feeds all three
  * chunkers from the same long. The HrwPack/CharEntropy
  * fuse-the-hot-loop precedent. Map-only; stays inside whole-stage
  * codegen via a static call. */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("bmod", LongType, nullable = false),
    StructField("k", LongType, nullable = false),
    StructField("l", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"cdc_chunks requires a string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcChunks.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  val Bs: Array[Int] = Array(4, 8, 16)
  val M31 = 2147483648L // 2^31: digit base for the packed key
  val P1 = 2147483629L  // largest prime < 2^31 − 18
  val P2 = 2147483647L  // Mersenne prime 2^31 − 1

  /** Invoked from both interpreted eval and generated code. */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val nb = Bs.length
    val h1 = new Array[Long](nb)
    val h2 = new Array[Long](nb)
    val len = new Array[Long](nb)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var start = 0
    var i = 0
    // token loop: split on 0x20, Java split(-1) semantics (empties kept)
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        val h = SimHash64.tokenHash60(
          java.util.Arrays.copyOfRange(bytes, start, i))
        val hm = h % M31
        var b = 0
        while (b < nb) {
          h1(b) = (h1(b) * 131 + hm) % P1
          h2(b) = (h2(b) * 137 + hm) % P2
          len(b) += 1
          if (h % Bs(b) == 0) {
            out += new GenericInternalRow(
              Array[Any](Bs(b).toLong, h1(b) * M31 + h2(b), len(b)))
            h1(b) = 0L; h2(b) = 0L; len(b) = 0L
          }
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var b = 0
    while (b < nb) {
      if (len(b) > 0)
        out += new GenericInternalRow(
          Array[Any](Bs(b).toLong, h1(b) * M31 + h2(b), len(b)))
      b += 1
    }
    new GenericArrayData(out.toArray)
  }

  val NAME = "cdc_chunks"

  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, NAME) { args => CdcChunks(args.head) }

  def apply(c: Column): Column = call_function(NAME, c)
}
