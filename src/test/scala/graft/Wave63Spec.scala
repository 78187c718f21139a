package graft

import java.security.MessageDigest

/** q241 (Krippendorff's alpha) replayed from scratch in plain driver
  * Scala — same synthetic annotator pool, same pairable-value rule,
  * same exact-integer disagreement sums — plus the coefficient's
  * structure: alpha ∈ [−1, 1], and a replay with the noise REMOVED
  * (all raters = latent signal) yields alpha = 1 exactly. */
class Wave63Spec extends SparkSpec {

  private def h60(s: String): Long =
    java.lang.Long.parseLong(MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .substring(0, 15), 16)

  test("q241 equals a from-scratch driver replay; alpha structure holds") {
    val ids = graft.sources.Tables.documents(spark, sfSmoke)
      .select("doc_id").collect().map(_.getLong(0))
    val labels = for {
      id <- ids.toSeq
      a <- 1 to 3
      if java.lang.Math.floorMod(h60(s"$id:p") + a, 10L) < 7
    } yield (id, (java.lang.Math.floorMod(h60(s"$id:s"), 100L)
      + java.lang.Math.floorMod(h60(s"$id:r$a"), 21L) - 10) >= 50)
    val items = labels.groupBy(_._1).values
      .map(ls => (ls.length.toLong, ls.count(_._2).toLong))
      .filter(_._1 >= 2).toSeq
    val nItems = items.length.toLong
    val nVals = items.map(_._1).sum
    val nPos = items.map(_._2).sum
    val dSum = items.map { case (m, n1) => 2 * n1 * (m - n1) / (m - 1) }.sum
    def r6(d: Double) = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val alpha =
      if (nPos > 0 && nPos < nVals)
        Some(r6(1.0 - (dSum * (nVals - 1))
          / (2.0 * nPos * (nVals - nPos))))
      else None
    val got = SparkEntry.queries("q241_krippendorff")(spark, sfSmoke)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((nItems, nVals, nPos, dSum)))
    assert(Option(r.get(4)).map(_.asInstanceOf[Double]) == alpha)
    // the fixture pool must actually exercise the missing-data machinery
    assert(nVals < 3L * ids.length && nVals > 2L * nItems,
      s"coverage degenerate: nVals=$nVals nItems=$nItems ids=${ids.length}")
    alpha.foreach(a => assert(a >= -1.0 && a <= 1.0))
    // noise-free raters agree perfectly -> alpha = 1 (De > 0 guaranteed
    // unless the latent signal is one-sided on this fixture)
    val pure = ids.toSeq.flatMap { id =>
      (1 to 3).filter(a => java.lang.Math.floorMod(h60(s"$id:p") + a, 10L) < 7)
        .map(_ => java.lang.Math.floorMod(h60(s"$id:s"), 100L) >= 50)
    }
    if (pure.exists(identity) && pure.exists(!_)) {
      // Do = 0 by construction; alpha must be exactly 1
      val pureItems = ids.toSeq.map { id =>
        val m = (1 to 3).count(a =>
          java.lang.Math.floorMod(h60(s"$id:p") + a, 10L) < 7)
        (m, java.lang.Math.floorMod(h60(s"$id:s"), 100L) >= 50)
      }.filter(_._1 >= 2)
      val d = pureItems.map { case (m, l) =>
        val n1 = if (l) m.toLong else 0L
        2 * n1 * (m - n1) / (m - 1)
      }.sum
      assert(d == 0L)
    }
  }
}
