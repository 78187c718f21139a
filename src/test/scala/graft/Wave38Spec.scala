package graft

/** Value invariants for the round-13 wave-38 operator (q216): the MMR
  * diversification sheet replayed from scratch over the shared
  * [[IvfadcReplay]] index — same probed-cell pool, same exact-integer
  * greedy (score = ex − min-distance-to-selected, ties to the lowest
  * neighbour id). */
class Wave38Spec extends SparkSpec {

  private val PoolK = 10
  private val MmrK = 5

  test("q216: MMR sheet matches a from-scratch greedy replay") {
    val (cents, perVec, books, vs) = IvfadcReplay.replayIndex(spark, sfSmoke)
    val mod = graft.util.Geometry.adaptiveSampleMod(vs.length.toLong, 50L, 5)
    val qids = vs.filter(_._1 % mod == 0).map(_._1)
    val byId = vs.toMap
    var (relT, relM, divT, divM) = (0L, 0L, 0L, 0L)
    qids.foreach { qid =>
      val qqv = byId(qid)
      val probed = cents
        .sortBy { case (c, cv) => (IvfadcReplay.sq(qqv, cv), c) }
        .take(IvfadcReplay.Nprobe).map(_._1).toSet
      val pool = vs
        .filter { case (id, _) => id != qid && probed.contains(perVec(id)._1) }
        .map { case (id, v) => (IvfadcReplay.sq(v, qqv), id) }
        .sorted.take(PoolK).map { case (ex, id) => (id, ex) }
      val exOf = pool.toMap
      def pd(a: Long, b: Long): Long = IvfadcReplay.sq(byId(a), byId(b))
      // greedy MMR
      var sel = pool.headOption.map(_._1).toList
      while (sel.nonEmpty && sel.length < MmrK
          && pool.exists(p => !sel.contains(p._1))) {
        val pick = pool.filter(p => !sel.contains(p._1))
          .map { case (id, ex) => (ex - sel.map(s => pd(id, s)).min, id) }
          .min._2
        sel = sel :+ pick
      }
      val top5 = pool.take(MmrK).map(_._1)
      def minPair(set: Seq[Long]): Long =
        if (set.length < 2) 0L
        else (for (a <- set; b <- set if a != b) yield pd(a, b)).min
      relT += top5.map(exOf).sum
      relM += sel.map(exOf).sum
      divT += minPair(top5)
      divM += minPair(sel)
    }
    val want = (qids.length.toLong, relT, relM, divT, divM,
      (divM - divT) * 1000000L / math.max(divT, 1L),
      (relM - relT) * 1000000L / math.max(relT, 1L))
    val got = SparkEntry.queries("q216_mmr_diversify")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).head
    assert(got == want)
    // the diversification trade is real on the fixture: MMR buys
    // strictly more diversity and pays a non-negative relevance cost
    assert(got._6 > 0, s"div_gain_ppm ${got._6} not positive")
    assert(got._7 >= 0, s"rel_cost_ppm ${got._7} negative")
  }
}
