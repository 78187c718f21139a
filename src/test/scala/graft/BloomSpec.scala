package graft

import graft.functions.Bloom
import org.apache.spark.sql.functions._

/** Bloom build/probe — the q90 runtime-filter kernel. The q90 oracle can
  * only catch FALSE NEGATIVES (a dropped key changes the join result);
  * these tests additionally lock the no-false-negative property directly,
  * the false-positive rate (a degenerate always-true filter would pass
  * the oracle while pruning nothing), and build/probe hash agreement
  * through the full aggregate → native expression round trip. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives, and false positives stay near the design rate") {
    val numBits = 1 << 14
    val keys = (0 until 500).map(i => (i * 7919L) ^ 0x5DEECE66DL)
    val agg = new Bloom.BuildAgg(numBits)
    val bits = keys.foldLeft(agg.zero)(agg.reduce)
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(bits)
    keys.foreach(k => assert(Bloom.contains(arr, k), s"false negative for $k"))
    // fp rate at n=500, m=2^14, k=3: (1-e^(-kn/m))^3 ~ 0.06% — allow 1%
    val probes = (1 to 20000).map(i => 1000000L + i * 104729L)
      .filterNot(keys.toSet)
    val fps = probes.count(p => Bloom.contains(arr, p))
    assert(fps.toDouble / probes.size < 0.01,
      s"$fps false positives over ${probes.size} probes")
  }

  test("merge ORs partials: split build equals whole build") {
    val numBits = 1 << 10
    val agg = new Bloom.BuildAgg(numBits)
    val keys = (0L until 200L).map(_ * 31L + 5L)
    val whole = keys.foldLeft(agg.zero)(agg.reduce)
    val merged = keys.grouped(37).map(_.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge)
    assert(whole.toSeq == merged.toSeq)
  }

  test("distributed build agrees with the native probe expression") {
    Bloom.register(spark)
    val numBits = 1 << 12
    val keysDf = (0 until 300).map(i => i * 13L).toDF("k")
    val bits = keysDf.agg(Bloom.buildAgg(numBits)($"k").as("bits"))
      .head.getSeq[Long](0).toArray
    assert(bits.length == numBits / 64)
    val probed = (0 until 300).map(i => i * 13L).toDF("k")
      .filter(Bloom.mightContain(typedLit(bits), $"k"))
      .count()
    assert(probed == 300, "distributed probe dropped an inserted key")
  }
}
