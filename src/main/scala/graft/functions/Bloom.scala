package graft.functions

import org.apache.spark.sql.{Column, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Engine-level runtime bloom filter for join pruning — the semi-join
  * pre-filter that cuts shuffle volume when neither side broadcasts.
  *
  * At 100 TB the canonical shape is: a selective dimension/filter subquery
  * produces keys far too many to broadcast as a hash relation but whose
  * BLOOM FILTER is kilobytes; the fact side tests membership BEFORE its
  * shuffle, dropping the (1 - selectivity) of rows that could never join;
  * an exact join afterwards removes the false positives. Spark's own AQE
  * injects such filters only under narrow conditions — this makes the
  * pattern a first-class, composable operator.
  *
  * Hashing: Kirsch–Mitzenmacher double hashing over two splitmix64
  * streams — k bit positions from h1 + i·h2. Pure JVM arithmetic on both
  * the build (Aggregator) and probe (native codegen expression) sides, so
  * build and probe agree bit-for-bit by construction. k is fixed at 3;
  * numBits is carried structurally as the bit-array length (words×64), so
  * a probe can never be paired with a mis-sized filter silently.
  */
object Bloom {
  val HashCount = 3

  /** splitmix64 finalizer — the standard 64-bit avalanche mix. */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** i-th bit position for a key in a `numBits`-wide filter. */
  @inline def bitFor(key: Long, i: Int, numBits: Int): Int = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0x6A09E667F3BCC909L) | 1L // odd → full-period stride
    (java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong)).toInt
  }

  /** Probe kernel (static: called from generated code). */
  def contains(bits: ArrayData, key: Long): Boolean = {
    val words = bits.numElements()
    val numBits = words << 6
    var i = 0
    while (i < HashCount) {
      val b = bitFor(key, i, numBits)
      if ((bits.getLong(b >> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Build-side typed aggregate: OR-merges fixed-width bitsets. The
    * buffer is a constant `numBits/64` longs regardless of input rows —
    * the same bounded-partial-state contract as BoundedHead, and the
    * reference's partial→final combine once more (the combine is bitwise
    * OR). */
  final class BuildAgg(numBits: Int)
      extends Aggregator[Long, Array[Long], Array[Long]] {
    require(numBits > 0 && numBits % 64 == 0,
      s"numBits must be a positive multiple of 64, got $numBits")
    override def zero: Array[Long] = new Array[Long](numBits / 64)
    override def reduce(b: Array[Long], key: Long): Array[Long] = {
      var i = 0
      while (i < HashCount) {
        val bit = bitFor(key, i, numBits)
        b(bit >> 6) |= (1L << (bit & 63))
        i += 1
      }
      b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) |= y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Column aggregate building a `numBits`-wide filter over a long key. */
  def buildAgg(numBits: Int)(key: Column): Column =
    org.apache.spark.sql.functions.udaf(
      new BuildAgg(numBits), ExpressionEncoder[Long]()).apply(key)

  private val NAME = "bloom_contains"

  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, NAME)(
      exprs => BloomContains(exprs.head, exprs(1)))

  /** Column-API probe; requires register(spark) once per session. */
  def mightContain(bits: Column, key: Column): Column =
    call_function(NAME, bits, key)
}

/** Native codegen membership test — stays inside whole-stage codegen on
  * the fact-table hot path (a Scala UDF here would box every row and
  * break the codegen span around the scan filter). */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains requires (array<bigint>, bigint), got ($l, $r)")
    }

  override def nullSafeEval(bits: Any, key: Any): Any =
    Bloom.contains(bits.asInstanceOf[ArrayData], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) => s"graft.functions.Bloom.contains($b, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
