package graft

/** Value invariants for the round-13 wave-34 operator (q212): NDCG@10 +
  * MRR replayed from scratch over the shared [[IvfadcReplay]] index —
  * same exact integer arithmetic, same literal ppm weight table. */
class Wave34Spec extends SparkSpec {

  private val K = 10
  private val W: IndexedSeq[Long] = (1 to K).map(i =>
    math.round(1000000.0 * math.log(2.0) / math.log(i + 1.0)))

  test("q212: NDCG@10 + MRR match a from-scratch replay") {
    val (cents, perVec, books, vs) = IvfadcReplay.replayIndex(spark, sfSmoke)
    val mod = graft.util.Geometry.adaptiveSampleMod(vs.length.toLong, 50L, 5)
    val qids = vs.filter(_._1 % mod == 0).map(_._1)
    var (sumNdcg, sumRr, nnAt1) = (0L, 0L, 0L)
    qids.foreach { qid =>
      val qqv = vs.find(_._1 == qid).get._2
      val (top, _) = IvfadcReplay.replaySearch(cents, perVec, books, vs, qid, K)
      val exTop = vs.filter(_._1 != qid)
        .map { case (id, v) => (IvfadcReplay.sq(v, qqv), id) }
        .sorted.take(K).map(_._2)
      val xrkOf = exTop.zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
      // relevance of a served neighbour = 11 - its exact rank (0 if
      // outside the exact top-10); ideal DCG = the exact ranking itself
      val dcg = top.zipWithIndex.map { case ((nbr, _, _), i) =>
        xrkOf.get(nbr).map(x => (11L - x) * W(i)).getOrElse(0L) }.sum
      val idcg = exTop.indices.map(i => (11L - (i + 1)) * W(i)).sum
      sumNdcg += (if (idcg > 0) dcg * 1000000L / idcg else 0L)
      // reciprocal rank of the exact NN under the served ranking
      val ark = exTop.headOption.flatMap(nn =>
        top.zipWithIndex.find(_._1._1 == nn).map(_._2 + 1))
      sumRr += ark.map(1000000L / _).getOrElse(0L)
      if (ark.contains(1)) nnAt1 += 1
    }
    val want = (qids.length.toLong, sumNdcg / qids.length,
      sumRr / qids.length, nnAt1)
    val got = SparkEntry.queries("q212_retrieval_ndcg")(spark, sfSmoke)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .head
    assert(got == want)
    // the metric discriminates on the fixture: ordering quality is
    // neither perfect (ppm 10^6) nor vacuously zero across the sample
    assert(got._2 > 0 && got._2 < 1000000L, s"ndcg ${got._2}")
  }
}
