package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator (SURVEY §4.1): element-wise mean of float vectors —
  * the centroid-training kernel for IVF bucketing (q37's codebook would be
  * trained with this at scale).
  *
  * Maps the reference's partial-state + merge pattern directly onto the
  * Aggregator contract: `reduce` is the per-chunk accumulation
  * (max_aggregation.cpp:54-55), `merge` the cross-worker combine
  * (max_aggregation.cpp:57-60) — except Spark shuffles partial buffers
  * instead of CAS-ing shared memory.
  */
final case class VecBuf(var sum: Array[Double], var n: Long)

object VectorAvg extends Aggregator[Array[Float], VecBuf, Array[Float]] {
  type Buf = VecBuf
  private def Buf(sum: Array[Double], n: Long): VecBuf = VecBuf(sum, n)

  override def zero: Buf = Buf(Array.empty[Double], 0L)

  // Contract: all non-null input vectors must share one dimension. Both
  // reduce and merge fail fast on a mismatch — silently truncating (or
  // letting merge throw an opaque index error) would hide bad data.
  override def reduce(b: Buf, a: Array[Float]): Buf = {
    if (a == null) return b
    if (b.sum.isEmpty) b.sum = new Array[Double](a.length)
    require(a.length == b.sum.length,
      s"vector_avg: dimension mismatch (${a.length} vs ${b.sum.length})")
    var i = 0
    while (i < a.length) { b.sum(i) += a(i); i += 1 }
    b.n += 1
    b
  }

  override def merge(x: Buf, y: Buf): Buf = {
    if (x.sum.isEmpty) return y
    if (y.sum.isEmpty) return x
    require(x.sum.length == y.sum.length,
      s"vector_avg: dimension mismatch (${x.sum.length} vs ${y.sum.length})")
    var i = 0
    while (i < x.sum.length) { x.sum(i) += y.sum(i); i += 1 }
    x.n += y.n
    x
  }

  override def finish(b: Buf): Array[Float] =
    if (b.n == 0) null else b.sum.map(s => (s / b.n).toFloat)

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Array[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()

  /** Expose the aggregator to SQL text (`SELECT vector_avg(embedding)`),
    * completing the surface: Column API via udaf, SQL via this. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("vector_avg", org.apache.spark.sql.functions.udaf(
      VectorAvg,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()))
}
