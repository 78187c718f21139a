package graft

/** Value invariants for the round-13 wave-37 operator (q215): the
  * rerank-lift sheet replayed from scratch over the shared
  * [[IvfadcReplay]] index — ADC top-30 reranked by exact distance,
  * q212's literal ppm weight table — plus the rearrangement-inequality
  * invariant the architecture rests on: exact rerank of a candidate
  * superset can never lower DCG below the raw ADC top-10's. */
class Wave37Spec extends SparkSpec {

  private val K = 10
  private val R = 30
  private val W: IndexedSeq[Long] = (1 to K).map(i =>
    math.round(1000000.0 * math.log(2.0) / math.log(i + 1.0)))

  test("q215: rerank lift matches a from-scratch replay") {
    val (cents, perVec, books, vs) = IvfadcReplay.replayIndex(spark, sfSmoke)
    val mod = graft.util.Geometry.adaptiveSampleMod(vs.length.toLong, 50L, 5)
    val qids = vs.filter(_._1 % mod == 0).map(_._1)
    val byId = vs.toMap
    var (sumA, sumR, nn1A, nn1R) = (0L, 0L, 0L, 0L)
    qids.foreach { qid =>
      val qqv = byId(qid)
      val (cand, _) =
        IvfadcReplay.replaySearch(cents, perVec, books, vs, qid, R)
      val adc10 = cand.take(K).map(_._1)
      val rr10 = cand.map { case (nbr, _, _) =>
        (IvfadcReplay.sq(byId(nbr), qqv), nbr) }.sorted.take(K).map(_._2)
      val exTop = vs.filter(_._1 != qid)
        .map { case (id, v) => (IvfadcReplay.sq(v, qqv), id) }
        .sorted.take(K).map(_._2)
      val xrkOf = exTop.zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
      def dcg(ranking: Seq[Long]): Long =
        ranking.zipWithIndex.map { case (nbr, i) =>
          xrkOf.get(nbr).map(x => (11L - x) * W(i)).getOrElse(0L) }.sum
      val idcg = exTop.indices.map(i => (11L - (i + 1)) * W(i)).sum
      val (da, dr) = (dcg(adc10), dcg(rr10))
      assert(dr >= da, s"q$qid: rerank DCG $dr below ADC DCG $da")
      sumA += (if (idcg > 0) da * 1000000L / idcg else 0L)
      sumR += (if (idcg > 0) dr * 1000000L / idcg else 0L)
      exTop.headOption.foreach { nn =>
        if (adc10.headOption.contains(nn)) nn1A += 1
        if (rr10.headOption.contains(nn)) nn1R += 1
      }
    }
    val nq = qids.length.toLong
    val want = (nq, sumA / nq, sumR / nq, sumR / nq - sumA / nq, nn1A, nn1R)
    val got = SparkEntry.queries("q215_rerank_lift")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).head
    assert(got == want)
    // the sheet discriminates: reranking recovers real ordering quality
    // on the fixture (lift strictly positive, rank-1 hits not fewer)
    assert(got._4 > 0, s"lift_ppm ${got._4} not positive")
    assert(got._6 >= got._5, s"nn1 rerank ${got._6} < adc ${got._5}")
  }
}
