package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: 120-bit SimHash of a token array, emitted
  * as `array(lo, hi)` — two 60-bit halves.
  *
  * The wide sibling of [[SimHash64]] and q32's scale path (VERDICT r6 #1):
  * a 60-bit signature banded 4×15 pins the band-bucket space at 2^15
  * forever, so past ~10^7 docs occupancy grows as n/65k and in-bucket
  * pairs become the q41 defect class (quadratic in disguise). Doubling
  * the signature lets the band width grow with the corpus
  * (graft.util.Geometry.adaptiveBits, 15..30 bits per band = up to 2^30
  * buckets) at the same 4-band recall shape.
  *
  * Width is 120 (not 128) to stay on md5 HEX-DIGIT boundaries: each half
  * is the integer value of 15 hex digits — lo = digits 1-15, hi = digits
  * 17-31 — i.e. `conv(substring(md5(t), 1|17, 15), 16, 10)` in Spark SQL
  * and `concat('0x', substr(md5(t), 1|17, 15))::BIGINT` in DuckDB. A full
  * 64-bit half (16 digits) would overflow signed BIGINT in the oracle;
  * 60+60 keeps both halves exactly reconstructable in any engine with an
  * md5 builtin, which is what keeps q32 oracle-checkable.
  *
  * Same execution shape as SimHash64: one fused JVM pass per row inside
  * whole-stage codegen, map-only, memoized token hashes.
  */
case class SimHash128(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash128 requires array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash128.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash128.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash128 =
    copy(child = newChild)
}

object SimHash128 {

  /** Bits per half; total signature width = 2 × 60 = 120. */
  val HalfBits = 60
  val Bits: Int = 2 * HalfBits

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Same bounded per-thread memo as SimHash64 (Zipf vocabularies make
    * this ~|vocabulary| MD5s instead of ~|occurrences|). */
  private val CacheCap = 1 << 17
  private val memo = new ThreadLocal[java.util.HashMap[String, Array[Long]]] {
    override def initialValue() = new java.util.HashMap[String, Array[Long]](1 << 12)
  }

  /** (lo, hi) md5-derived 60-bit token hashes: big-endian digest bytes
    * 0-7 >>> 4 (hex digits 1-15) and bytes 8-15 >>> 4 (digits 17-31). */
  def tokenHash120(utf8: Array[Byte]): Array[Long] = {
    val md = digest.get()
    md.reset()
    val d = md.digest(utf8)
    def be(off: Int): Long =
      ((d(off) & 0xFFL) << 56) | ((d(off + 1) & 0xFFL) << 48) |
      ((d(off + 2) & 0xFFL) << 40) | ((d(off + 3) & 0xFFL) << 32) |
      ((d(off + 4) & 0xFFL) << 24) | ((d(off + 5) & 0xFFL) << 16) |
      ((d(off + 6) & 0xFFL) << 8) | (d(off + 7) & 0xFFL)
    Array(be(0) >>> 4, be(8) >>> 4)
  }

  private def cachedHash(s: org.apache.spark.unsafe.types.UTF8String): Array[Long] = {
    val m = memo.get()
    val key = s.toString
    val hit = m.get(key)
    if (hit != null) hit
    else {
      val h = tokenHash120(s.getBytes)
      if (m.size() >= CacheCap) m.clear()
      m.put(key, h)
      h
    }
  }

  /** Invoked from both interpreted eval and generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val votes = new Array[Int](Bits)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = cachedHash(arr.getUTF8String(i))
        val lo = h(0)
        val hi = h(1)
        var b = 0
        while (b < HalfBits) {
          if (((lo >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
          if (((hi >>> b) & 1L) != 0L) votes(HalfBits + b) += 1
          else votes(HalfBits + b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sigLo = 0L
    var sigHi = 0L
    var b = 0
    while (b < HalfBits) {
      if (votes(b) > 0) sigLo |= (1L << b)
      if (votes(HalfBits + b) > 0) sigHi |= (1L << b)
      b += 1
    }
    new GenericArrayData(Array(sigLo, sigHi))
  }

  private val NAME = "simhash128"

  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, NAME)(exprs => SimHash128(exprs.head))

  /** Column-API entry point; requires register(spark) once per session. */
  def apply(c: Column): Column = call_function(NAME, c)
}
