package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression: fused rendezvous-hash (HRW) shard
  * assignment for a long key under an old/new shard-count pair —
  * q150's whole per-row kernel in ONE generated call.
  *
  * Semantics (bit-identical to the expression-tree form it replaces,
  * and to the DuckDB oracle): h(key, s) is the md5-60 keyed hash of
  * the string "key:s" (TextOps.shingleHash60 — the value of the
  * leading 15 hex digits of md5, the repo's cross-engine PRF); the
  * old shard is argmax over s < oldN, the new shard argmax over
  * s < newN, FIRST index winning ties (list_position/array_position
  * return the first occurrence of the max). Returns old·100 + new,
  * unpacked by the caller with div/mod — two ints in one long, so the
  * kernel stays a scalar expression.
  *
  * Why a kernel: the per-key contract cost is O(newN) md5 evaluations
  * BY DESIGN (md5 is the oracle-portability contract, q150 scaladoc),
  * but the expression-tree form paid, per shard, a UTF8String
  * concat_ws allocation, Spark's Md5 (bytes → 32-char hex string),
  * a substring, and a base-16 conv parse — then materialized the
  * 12-element array and scanned it four times (2× array_max +
  * 2× array_position). This kernel digests the raw "key:s" bytes
  * straight to the 60-bit long (no hex round-trip, one reused
  * MessageDigest, one stack buffer) and tracks both argmaxes inline —
  * the CharEntropy/SimHash64 fuse-the-hot-loop precedent
  * (r12 verdict task 4). Map-only; stays inside whole-stage codegen
  * via a static call.
  */
case class HrwPack(child: Expression, oldN: Int, newN: Int)
    extends UnaryExpression {

  require(0 < oldN && oldN <= newN && newN < 100,
    s"HrwPack needs 0 < oldN <= newN < 100 (decimal packing), got ($oldN, $newN)")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hrw_pack requires a long key, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val k = input match {
      case i: Int => i.toLong
      case l: Long => l
    }
    HrwPack.compute(k, oldN, newN)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HrwPack.compute((long)$c, $oldN, $newN)")

  override protected def withNewChildInternal(newChild: Expression): HrwPack =
    copy(child = newChild)
}

object HrwPack {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Invoked from both interpreted eval and generated code. Computes
    * md5-60("key:s") for s in [0, newN), tracking the first-index argmax
    * over the oldN prefix and over all newN; returns old·100 + new. */
  def compute(key: Long, oldN: Int, newN: Int): Long = {
    val md = digest.get()
    // "key:" prefix bytes, built once per row; ASCII digits only
    val prefix = java.lang.Long.toString(key)
    val pn = prefix.length
    val buf = new Array[Byte](pn + 3) // ":" + up to 2 shard digits
    var i = 0
    while (i < pn) { buf(i) = prefix.charAt(i).toByte; i += 1 }
    buf(pn) = ':'
    var bestOld = 0L; var argOld = -1
    var bestNew = 0L; var argNew = -1
    var s = 0
    while (s < newN) {
      md.reset()
      val len =
        if (s < 10) { buf(pn + 1) = ('0' + s).toByte; pn + 2 }
        else {
          buf(pn + 1) = ('0' + s / 10).toByte
          buf(pn + 2) = ('0' + s % 10).toByte
          pn + 3
        }
      md.update(buf, 0, len)
      val d = md.digest()
      val h = (((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
        ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
        ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
        ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)) >>> 4
      // strict > keeps the FIRST max (array_position tie semantics)
      if (s < oldN && (argOld < 0 || h > bestOld)) { bestOld = h; argOld = s }
      if (argNew < 0 || h > bestNew) { bestNew = h; argNew = s }
      s += 1
    }
    argOld * 100L + argNew
  }

  private val NAME = "hrw_pack"

  def register(spark: SparkSession, oldN: Int, newN: Int): Unit =
    Registry.ensure(spark, NAME, (oldN, newN))(
      exprs => HrwPack(exprs.head, oldN, newN))

  /** Column-API entry point; requires register(spark, oldN, newN) once
    * per session. */
  def apply(c: Column): Column = call_function(NAME, c)
}
