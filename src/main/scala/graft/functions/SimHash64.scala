package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: 60-bit SimHash of a token array.
  *
  * One fused JVM pass per row: hash each token to the md5-derived 60-bit
  * integer scheme shared with MinHash (TextOps.minhash — the value of the
  * leading 15 hex digits of md5(token), so the signature is reproducible
  * in any engine with an md5 builtin and therefore oracle-checkable),
  * accumulate the 60 bit-votes in a local array, and emit the sign bits.
  * Replaces a 60-fold higher-order-function expression tree whose lambdas
  * evaluate interpreted per element (~60×|tokens| boxed evals per row);
  * this kernel stays inside whole-stage codegen via a static call.
  * Map-only: no shuffle is involved in signature computation.
  *
  * Callers pass the distinct-token array; duplicate tokens would simply
  * vote multiple times.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 requires array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Signature width: 60 bits = the 15 leading hex digits of md5. */
  val Bits = 60

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Per-thread token-hash memo: natural-language vocabularies are tiny
    * relative to token occurrences (Zipf), so caching turns ~|occurrences|
    * MD5 computations into ~|vocabulary| lookups. Bounded: cleared when it
    * reaches 128k entries, so a pathological unique-token stream degrades
    * to plain hashing, never to unbounded memory. (At sf0.1 the signature
    * pass is not q32's bottleneck — the win is at real corpus scale where
    * token volume per partition is orders of magnitude larger.) */
  private val CacheCap = 1 << 17
  private val memo = new ThreadLocal[java.util.HashMap[String, java.lang.Long]] {
    override def initialValue() = new java.util.HashMap[String, java.lang.Long](1 << 12)
  }

  /** md5-derived 60-bit token hash: the integer value of the first 15 hex
    * digits of md5(utf8), i.e. the big-endian first 8 digest bytes >>> 4.
    * Identical to `conv(substring(md5(t), 1, 15), 16, 10)` in Spark SQL and
    * `concat('0x', substr(md5(t), 1, 15))::BIGINT` in DuckDB. */
  def tokenHash60(utf8: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(utf8)
    val be =
      ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
      ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
      ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
    be >>> 4
  }

  private def cachedHash(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val m = memo.get()
    val key = s.toString
    val hit = m.get(key)
    if (hit != null) hit.longValue()
    else {
      val h = tokenHash60(s.getBytes)
      if (m.size() >= CacheCap) m.clear()
      m.put(key, java.lang.Long.valueOf(h))
      h
    }
  }

  /** Invoked from both interpreted eval and generated code. */
  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](Bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = cachedHash(arr.getUTF8String(i))
        var b = 0
        while (b < Bits) {
          if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  private val NAME = "simhash64"

  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, NAME)(exprs => SimHash64(exprs.head))

  /** Column-API entry point; requires register(spark) once per session. */
  def apply(c: Column): Column = call_function(NAME, c)
}
