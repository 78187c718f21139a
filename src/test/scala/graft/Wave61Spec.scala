package graft

import java.security.MessageDigest

/** q239 (DP quantile via noisy histogram) replayed from scratch in plain
  * driver Scala — same public-domain bucket grid, same q161 noise rule,
  * same cumulative probe — plus the mechanism's structure: DP estimates
  * are bucket midpoints, monotone in p, and every released count is
  * non-negative. */
class Wave61Spec extends SparkSpec {

  private def h60(s: String): Long =
    java.lang.Long.parseLong(MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .substring(0, 15), 16)

  test("q239 equals a from-scratch driver replay; mechanism structure holds") {
    val (buckets, width) = (64, (1L << 24) / 64)
    val vs = graft.sources.Tables.lineitem(spark, sfSmoke)
      .selectExpr("CAST(round(l_extendedprice * 100) AS BIGINT)",
        "l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val counts = vs.groupBy(v => math.min(buckets - 1L, v._1 / width))
      .map { case (b, xs) => b -> xs.length.toLong }
    def r6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val released = (0L until buckets).map { b =>
      val u = ((h60(s"dpq:$b") % 1048576L) + 0.5) / 1048576.0 - 0.5
      val noise = r6(-10.0 * math.signum(u) * math.log(1.0 - 2.0 * math.abs(u)))
      b -> math.max(0L, math.round(counts.getOrElse(b, 0L) + noise))
    }
    val t = released.map(_._2).sum
    val cum = released.scanLeft(0L)(_ + _._2).tail
    def dpQ(p: Long): Long = {
      val rp = (p * t + 99) / 100
      val b = cum.indexWhere(_ >= rp).toLong
      b * width + width / 2
    }
    val sorted = vs.map(_._1).sorted
    val want = Seq(25L, 50L, 75L, 90L).map { p =>
      val e = sorted((((p * sorted.length + 99) / 100) - 1).toInt)
      val dq = dpQ(p)
      (p, e, dq, math.abs(dq - e), math.abs(dq - e) * 1000000L / (1L << 24))
    }
    val got = SparkEntry.queries("q239_dp_quantile")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    assert(got.map(_._3) == got.map(_._3).sorted, "DP estimates not monotone")
    got.foreach(r => assert((r._3 - width / 2) % width == 0,
      s"DP estimate not a bucket midpoint: $r"))
  }
}
