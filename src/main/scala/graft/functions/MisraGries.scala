package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary as a typed Aggregator — the
  * candidate pass of the classic TWO-PASS exact heavy-hitters algorithm
  * (Misra & Gries 1982; merge rule per Agarwal et al., "Mergeable
  * Summaries", PODS'12). Absent from the reference (its only aggregate is
  * a global MAX, max_aggregation.cpp:54-60); this is the same
  * partial-state + merge pattern with a bounded-size state instead of a
  * scalar.
  *
  * Guarantee (the reason the two-pass algorithm is EXACT): a summary of
  * capacity m over n items under-counts any key by at most n/(m+1), and
  * the Agarwal merge (combine, then subtract the (m+1)-th largest count
  * and drop non-positives) preserves that bound across partials. Hence
  * every key with true frequency > n/k for any k <= m+1 SURVIVES in some
  * candidate set, and a second exact-recount pass over the candidates
  * (a broadcast semi-join — the candidate set is <= m keys) yields the
  * exact heavy-hitter set with exact counts. q123 runs this end to end
  * with m=64, k=50.
  *
  * State is two parallel arrays (keys/counts, linear probe) — O(m) per
  * update worst case, the textbook cost; product-encodable so the buffer
  * only serializes at shuffle boundaries (ObjectHashAggregate keeps the
  * JVM object between updates). Capacity is a constructor parameter:
  * state is m entries regardless of input size — driver and executors
  * hold O(m), never O(distinct keys).
  */
final case class MgBuf(var keys: Array[String], var counts: Array[Long])

final class MisraGries(m: Int) extends Aggregator[String, MgBuf, Map[String, Long]] {
  require(m > 0, s"capacity must be positive, got $m")

  override def zero: MgBuf = MgBuf(Array.empty, Array.empty)

  override def reduce(b: MgBuf, key: String): MgBuf = {
    if (key == null) return b
    val i = b.keys.indexOf(key)
    if (i >= 0) { b.counts(i) += 1; b }
    else if (b.keys.length < m)
      MgBuf(b.keys :+ key, b.counts :+ 1L)
    else {
      // summary full: decrement every counter (the MG step that charges
      // one occurrence of each tracked key against the new arrival),
      // dropping keys that reach zero
      var j = 0
      while (j < b.counts.length) { b.counts(j) -= 1; j += 1 }
      compact(b, 0L)
    }
  }

  override def merge(x: MgBuf, y: MgBuf): MgBuf = {
    if (y.keys.isEmpty) return x
    if (x.keys.isEmpty) return y
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var j = 0
    while (j < x.keys.length) { acc(x.keys(j)) = x.counts(j); j += 1 }
    j = 0
    while (j < y.keys.length) {
      acc(y.keys(j)) = acc.getOrElse(y.keys(j), 0L) + y.counts(j); j += 1
    }
    val merged = MgBuf(acc.keys.toArray, acc.values.toArray)
    if (merged.keys.length <= m) merged
    else {
      // Agarwal et al. merge: subtract the (m+1)-th largest count, keep
      // strictly-positive survivors (at most m of them)
      val sorted = merged.counts.sorted(Ordering[Long].reverse)
      compact(merged, sorted(m))
    }
  }

  private def compact(b: MgBuf, sub: Long): MgBuf = {
    val keep = Array.newBuilder[String]
    val cnts = Array.newBuilder[Long]
    var j = 0
    while (j < b.keys.length) {
      if (b.counts(j) - sub > 0) { keep += b.keys(j); cnts += b.counts(j) - sub }
      j += 1
    }
    MgBuf(keep.result(), cnts.result())
  }

  /** Candidate key → lower-bound count (under-count <= n/(m+1)). */
  override def finish(b: MgBuf): Map[String, Long] =
    b.keys.zip(b.counts).toMap

  override def bufferEncoder: Encoder[MgBuf] = Encoders.product[MgBuf]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object MisraGries {
  /** Column API: `misraGries(64)(col)` — a map<string,bigint> aggregate. */
  def apply(m: Int)(c: Column): Column =
    org.apache.spark.sql.functions.udaf(new MisraGries(m),
      Encoders.STRING).apply(c)

  /** SQL surface: `SELECT misra_gries(token)` with the given capacity. */
  def register(spark: SparkSession, m: Int): Unit =
    spark.udf.register("misra_gries",
      org.apache.spark.sql.functions.udaf(new MisraGries(m), Encoders.STRING))
}
