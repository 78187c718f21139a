package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Value invariants for the round-12 wave-30 operators (q204/q205/q206):
  * from-scratch replays of the t-closeness census, the min-shingle
  * source-collision matrix, and the PRF-bloom fpr audit. */
class Wave30Spec extends SparkSpec {

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def hash60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).take(15), 16)

  test("q204: t-closeness census matches a from-scratch replay") {
    val rows = spark.read.parquet(s"$sfSmoke/customer.parquet")
      .select(col("c_nationkey").cast("long"),
        floor(col("c_acctbal") / 1000d).cast("bigint"), col("c_mktsegment"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getString(2))).toSeq
    val n = rows.length.toLong
    val g = rows.groupBy(_._2).map { case (s, xs) => s -> xs.length.toLong }
    val per = rows.groupBy(_._1).toSeq.map { case (_, xs) =>
      val k = xs.length.toLong
      val counts = xs.groupBy(_._2).map { case (s, ys) => s -> ys.length.toLong }
      val present = counts.map { case (s, c) => math.abs(c * n - g(s) * k) }.sum
      val absent = (n - counts.keys.map(g).sum) * k
      (k, present + absent)
    }.toSeq
    def above(t: Int) = per.filter { case (k, num) => num * 100 > k * n * 2 * t }
    val maxTvd = per.map { case (k, num) =>
      BigDecimal(num.toDouble / (2L * k * n).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }.max
    val got = SparkEntry.queries("q204_t_closeness")(spark, sfSmoke)
      .collect().head
    assert(got.getLong(0) == per.length.toLong)
    assert(got.getLong(1) == n)
    Seq(20, 35, 50).zipWithIndex.foreach { case (t, i) =>
      assert(got.getLong(2 + 2 * i) == above(t).length.toLong, s"classes t=$t")
      assert(got.getLong(3 + 2 * i) == above(t).map(_._1).sum, s"rows t=$t")
    }
    assert(got.getDouble(8) == maxTvd)
    // the census discriminates: monotone under the threshold and never
    // all-pass / all-fail (the strict 20-vs-50 split shows from sf0.01
    // up, where classes hold ~5 rows; smoke classes are singletons)
    assert(above(20).length >= above(35).length
      && above(35).length >= above(50).length)
    assert(above(50).nonEmpty && above(20).length < per.length)
  }

  test("q205: source-collision matrix matches a from-scratch replay") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val mh = docs.flatMap { case (src, text) =>
      val toks = text.split(" ", -1)
      if (toks.length < 3) None
      else Some(src -> (0 to toks.length - 3)
        .map(i => hash60(toks.slice(i, i + 3).mkString(" "))).min)
    }
    val k = mh.groupBy(identity).map { case ((src, h), xs) =>
      (h, src) -> xs.length.toLong }
    val tot = k.groupBy(_._1._1).map { case (h, xs) => h -> xs.values.sum }
    val kept = k.filter { case ((h, _), _) => tot(h) <= 1000L }
    val want = kept.toSeq.flatMap { case ((h, sa), na) =>
      kept.toSeq.collect {
        case ((h2, sb), nb) if h2 == h && sa <= sb =>
          val pairs = if (sa == sb) na * (na - 1) / 2 else na * nb
          ((sa, sb), pairs)
      }
    }.filter(_._2 > 0)
      .groupBy(_._1).map { case (key, xs) =>
        key -> (xs.length.toLong, xs.map(_._2).sum) }
    val got = SparkEntry.queries("q205_source_collision_matrix")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getString(1))
        -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
    // discriminates: cross-source mass exists (shared templates), and
    // the matrix is sparse (not every pair collides)
    assert(got.keys.exists { case (a, b) => a != b })
    val nSrc = docs.map(_._1).distinct.length.toLong
    assert(got.size.toLong < nSrc * (nSrc + 1) / 2)
  }

  test("q206: bloom fpr audit matches a from-scratch replay, no false negatives") {
    val keys = spark.read.parquet(s"$sfSmoke/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    val bits = graft.util.Geometry.adaptiveBits(
      math.max(keys.size.toLong, 1L), -3, 8, 24)
    val m = 1L << bits
    def pos(j: Int, key: Long): Long = hash60(s"$j:$key") % m
    val set = keys.flatMap(k => (0 until 3).map(j => pos(j, k)))
    val facts = spark.read.parquet(s"$sfSmoke/orders.parquet")
      .select(col("o_custkey").cast("long")).collect().map(_.getLong(0)).toSeq
    val exact = facts.count(keys.contains)
    val passes = facts.count(f => (0 until 3).forall(j => set.contains(pos(j, f))))
    val fp = facts.count(f =>
      !keys.contains(f) && (0 until 3).forall(j => set.contains(pos(j, f))))
    val got = SparkEntry.queries("q206_bloom_fpr_audit")(spark, sfSmoke)
      .collect().head
    assert(got.getLong(0) == facts.length.toLong)   // n_fact
    assert(got.getLong(1) == keys.size.toLong)      // n_keys
    assert(got.getLong(2) == m)                     // m_bits
    assert(got.getLong(3) == set.size.toLong)       // n_bits_set
    assert(got.getLong(4) == exact.toLong)          // exact_matches
    assert(got.getLong(5) == passes.toLong)         // bloom_passes
    assert(got.getLong(6) == fp.toLong)             // false_positives
    assert(got.getLong(7) == 0L)                    // false_negatives
    assert(got.getLong(8) ==
      (if (facts.length > exact) fp.toLong * 1000000L / (facts.length - exact)
       else 0L))                                    // fpr_ppm
    // the bloom is real: loaded but not saturated, and it measurably
    // over-admits (bloom_passes >= exact_matches, strictly on a loaded
    // filter probed by a large fact side)
    assert(set.nonEmpty && set.size.toLong < m)
    assert(passes >= exact)
  }
}
