package graft

/** q236 (histogram quality audit) replayed from scratch in plain driver
  * Scala — same bucket assignment rules, same uniformity estimator —
  * plus the structural facts: bucket counts cover n exactly under both
  * rules, and equi-depth buckets hold n/16 ± 1 rows by construction. */
class Wave58Spec extends SparkSpec {

  test("q236 equals a from-scratch driver replay; bucket invariants hold") {
    val b = 16
    val rows = graft.sources.Tables.lineitem(spark, sfSmoke)
      .selectExpr("CAST(round(l_extendedprice * 100) AS BIGINT)",
        "l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val n = rows.length.toLong
    val lo = rows.map(_._1).min; val hi = rows.map(_._1).max
    val w = hi - lo + 1
    val sorted = rows.sortBy(r => (r._1, r._2, r._3))
    def mkBuckets(assign: ((Long, Long), Int) => Long) =
      sorted.zipWithIndex
        .map { case (r, i) => (assign((r._1, i.toLong + 1), b), r._1) }
        .groupBy(_._1).values
        .map(g => (g.length.toLong, g.map(_._2).min, g.map(_._2).max)).toSeq
    val widthB = mkBuckets { case ((v, _), bb) => (v - lo) * bb / w }
    val depthB = mkBuckets { case ((_, rn), bb) => (rn - 1) * bb / n }
    val preds = Seq(("p00_10", 0, 10), ("p00_50", 0, 50), ("p25_75", 25, 75),
      ("p45_55", 45, 55), ("p90_100", 90, 100), ("p99_100", 99, 100))
      .map { case (nm, p1, p2) =>
        (nm, lo + w * p1 / 100, lo + w * p2 / 100) }
    def est(bs: Seq[(Long, Long, Long)], a: Long, bb: Long): Long =
      bs.map { case (c, mn, mx) =>
        c * math.max(0L, math.min(bb, mx) - math.max(a, mn) + 1) /
          (mx - mn + 1) }.sum
    val want = (for {
      (ht, bs) <- Seq(("depth", depthB), ("width", widthB))
      (nm, a, bb) <- preds
    } yield {
      val t = rows.count(r => r._1 >= a && r._1 <= bb).toLong
      val e = est(bs, a, bb)
      (ht, nm, t, e, math.abs(e - t) * 1000000L / math.max(t, 1L))
    }).sortBy(x => (x._1, x._2))
    val got = SparkEntry.queries("q236_hist_quality")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    assert(widthB.map(_._1).sum == n && depthB.map(_._1).sum == n)
    // equi-depth balance: every bucket holds n/16 (+/- 1 for remainder)
    depthB.foreach { case (c, _, _) =>
      assert(math.abs(c - n / b) <= 1, s"depth bucket off balance: $c") }
  }
}
