package graft

/** q227 (interpolated Kneser–Ney bigram estimator) replayed from scratch
  * in plain driver Scala — same counts, same scaled-integer discounting —
  * plus the estimator's defining properties: probabilities stay in
  * (0, 10^6], and the discount strictly shrinks the MLE term while the
  * continuation term keeps every seen bigram strictly positive. */
class Wave49Spec extends SparkSpec {

  test("q227 equals a from-scratch driver replay; KN properties hold") {
    val texts = graft.sources.Tables.documents(spark, sfSmoke)
      .select("text").collect().map(_.getString(0))
    val bg = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { t =>
      val toks = t.split(" ")
      toks.sliding(2).filter(_.length == 2).foreach { w =>
        bg((w(0), w(1))) = bg.getOrElse((w(0), w(1)), 0L) + 1 }
    }
    val c1 = bg.groupBy(_._1._1).map { case (w, xs) => w -> xs.values.sum }
    val n1f = bg.groupBy(_._1._1).map { case (w, xs) => w -> xs.size.toLong }
    val n1p = bg.groupBy(_._1._2).map { case (w, xs) => w -> xs.size.toLong }
    val t = bg.size.toLong
    val want = bg.toSeq
      .map { case ((w1, w2), c12) =>
        val p = (4 * c12 - 3) * 250000L / c1(w1) +
          3 * n1f(w1) * n1p(w2) * 250000L / (c1(w1) * t)
        (w1, w2, c12, c1(w1), n1f(w1), n1p(w2), p)
      }
      .sortBy { case (w1, w2, c12, _, _, _, _) => (-c12, w1, w2) }
      .take(20)
    val got = SparkEntry.queries("q227_kn_bigram")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want)
    got.foreach { case (_, _, c12, c1v, _, _, p) =>
      assert(p > 0 && p <= 1000000L, s"p_ppm out of range: $p")
      // the discounted term sits strictly under the raw MLE
      assert((4 * c12 - 3) * 250000L / c1v < c12 * 1000000L / c1v + 1)
    }
  }
}
