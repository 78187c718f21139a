package graft

import graft.functions.BoundedHead
import org.apache.spark.sql.functions._

/** BoundedHead — the constant-state sorted-head merge behind s11's index
  * merge. The state-bound tests exercise reduce/merge DIRECTLY: the buffer
  * those methods return IS the aggregate's partial state (map-side buffer,
  * shuffled bytes, merge-side buffer), so asserting its length ≤ cap on
  * adversarial inputs locks the constant-memory property the r3 verdict
  * asked for. */
class BoundedHeadSpec extends SparkSpec {
  import spark.implicits._

  private def brute(inputs: Seq[Array[Long]], cap: Int): Seq[Long] =
    inputs.flatten.sorted.take(cap)

  test("reduce/merge state never exceeds cap, result is the global head") {
    val cap = 7
    val agg = new BoundedHead(cap)
    val rnd = new scala.util.Random(42)
    // 200 "deltas" of wildly varying size, including empties and one
    // hot-token burst of 5000 elements — the stop-token profile
    val inputs = (0 until 200).map { i =>
      val sz = if (i == 17) 5000 else rnd.nextInt(40)
      Array.fill(sz)(rnd.nextLong() & 0xFFFFFFFFL).sorted
    }
    // map-side: fold through reduce, checking the state bound every step
    var buf = agg.zero
    inputs.foreach { in =>
      buf = agg.reduce(buf, in)
      assert(buf.length <= cap, "reduce state exceeded cap")
    }
    // merge-side: combine 8 independently-reduced partials pairwise
    val partials = inputs.grouped(25).map(_.foldLeft(agg.zero)(agg.reduce)).toSeq
    val merged = partials.reduce { (a, b) =>
      val m = agg.merge(a, b)
      assert(m.length <= cap, "merge state exceeded cap")
      m
    }
    assert(agg.finish(merged).toSeq == brute(inputs, cap))
    assert(agg.finish(buf).toSeq == brute(inputs, cap))
  }

  test("unsorted producer input degrades to correct, never to wrong") {
    val agg = new BoundedHead(3)
    val out = agg.reduce(agg.zero, Array(9L, 1L, 5L, 0L))
    assert(out.toSeq == Seq(0L, 1L, 5L))
  }

  test("null input rows and empty arrays are identity") {
    val agg = new BoundedHead(4)
    val b1 = agg.reduce(Array(2L, 3L), null)
    assert(b1.toSeq == Seq(2L, 3L))
    assert(agg.reduce(b1, Array.emptyLongArray).toSeq == Seq(2L, 3L))
    assert(agg.merge(agg.zero, agg.zero).isEmpty)
  }

  test("as a Column aggregate: matches flatten+sort+slice on grouped data") {
    val cap = 5
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      (s"tok${i % 13}", Array.fill(rnd.nextInt(9))(rnd.nextLong() & 0xFFFFFL).sorted)
    }
    val df = rows.toDF("token", "postings")
    val got = df.groupBy($"token")
      .agg(BoundedHead.head(cap)($"postings").as("head"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val want = rows.groupBy(_._1).map { case (t, rs) =>
      t -> brute(rs.map(_._2), cap)
    }
    assert(got == want)
  }
}
