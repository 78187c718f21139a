package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded sorted-head merge: aggregates ascending-sorted Long arrays into
  * the `cap` smallest elements of their union, with EVERY partial state —
  * map-side buffer, shuffled bytes, merge-side buffer — bounded by `cap`
  * elements. This is the constant-memory replacement for the
  * `slice(array_sort(flatten(collect_list(...))), 1, cap)` idiom, whose
  * collect_list state grows with the NUMBER OF INPUT ROWS merged into a
  * group before the slice ever runs (for s11's index merge: delta-count ×
  * postings per hot token — unbounded over ingest history).
  *
  * Correctness of capping early: the global `cap` smallest elements of a
  * union are each among the `cap` smallest of whichever input they came
  * from, so keeping only cap-length sorted heads at every merge step loses
  * nothing. reduce/merge are a two-pointer sorted merge truncated at cap —
  * O(cap) per step, no re-sort.
  *
  * The same partial-state + combine shape as the reference's MAX
  * aggregation (max_aggregation.cpp:54-60) — except the state is the
  * k-smallest head instead of a scalar, and the bound is what makes it
  * deployable on 100 TB ingest histories.
  */
final class BoundedHead(cap: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  require(cap > 0, s"BoundedHead cap must be positive, got $cap")

  override def zero: Array[Long] = Array.emptyLongArray

  /** Two-pointer merge of two sorted arrays, truncated to `cap`. */
  private def mergeCap(x: Array[Long], y: Array[Long]): Array[Long] = {
    if (y.isEmpty) return if (x.length <= cap) x else java.util.Arrays.copyOf(x, cap)
    if (x.isEmpty) return if (y.length <= cap) y else java.util.Arrays.copyOf(y, cap)
    val n = math.min(cap, x.length + y.length)
    val out = new Array[Long](n)
    var i = 0; var j = 0; var k = 0
    while (k < n) {
      if (j >= y.length || (i < x.length && x(i) <= y(j))) { out(k) = x(i); i += 1 }
      else { out(k) = y(j); j += 1 }
      k += 1
    }
    out
  }

  /** Inputs are contractually sorted (s11 deltas are written sort_array'd);
    * verified in O(n) and repaired with a sort only on violation, so a
    * misbehaving producer degrades to correct-but-slower, never to wrong. */
  private def ensureSorted(a: Array[Long]): Array[Long] = {
    var i = 1
    while (i < a.length && a(i - 1) <= a(i)) i += 1
    if (i >= a.length) a
    else { val c = a.clone(); java.util.Arrays.sort(c); c }
  }

  override def reduce(b: Array[Long], in: Array[Long]): Array[Long] =
    if (in == null) b else mergeCap(b, ensureSorted(in))

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = mergeCap(x, y)

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object BoundedHead {
  /** Column-API handle: `BoundedHead.head(cap)(col)` aggregates an
    * array<bigint> column into its bounded sorted head. */
  def head(cap: Int)(c: Column): Column =
    org.apache.spark.sql.functions.udaf(
      new BoundedHead(cap), ExpressionEncoder[Array[Long]]()).apply(c)
}
