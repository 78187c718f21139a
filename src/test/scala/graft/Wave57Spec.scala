package graft

import java.security.MessageDigest

/** q235 (KMV Jaccard sketch audit) replayed from scratch in plain driver
  * Scala — same shingle hashing, same bottom-k merge, same U_k flag rule
  * — plus the estimator's structural bound: the estimate is always a
  * multiple of 1/k, and a pair's sketch hit count never exceeds k·J's
  * support (hits ≤ true intersection size). */
class Wave57Spec extends SparkSpec {

  private def h60(s: String): Long =
    java.lang.Long.parseLong(MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .substring(0, 15), 16)

  test("q235 equals a from-scratch driver replay; estimator bounds hold") {
    val k = 128
    val srcs = (0 until 5).map(i => s"src$i")
    val rows = graft.sources.Tables.documents(spark, sfSmoke)
      .selectExpr("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter(r => srcs.contains(r._1))
    val sets: Map[String, Set[Long]] = rows.groupBy(_._1).map {
      case (src, docs) =>
        src -> docs.flatMap { case (_, t) =>
          val toks = t.split(" ")
          if (toks.length < 3) Seq.empty
          else toks.sliding(3).map(w => h60(w.mkString(" "))).toSeq
        }.toSet
    }
    val want = (for {
      i <- srcs.indices; j <- srcs.indices if i < j
    } yield {
      val (sa, sb) = (srcs(i), srcs(j))
      val (a, b) = (sets(sa), sets(sb))
      val inter = (a & b).size.toLong
      val (na, nb) = (a.size.toLong, b.size.toLong)
      val ska = a.toSeq.sorted.take(k).toSet
      val skb = b.toSeq.sorted.take(k).toSet
      val uk = (ska ++ skb).toSeq.sorted.take(k)
      val hits = uk.count(h => ska(h) && skb(h)).toLong
      val ku = uk.length.toLong
      val jac = inter * 1000000L / (na + nb - inter)
      val est = hits * 1000000L / ku
      (sa, sb, na, nb, inter, jac, est, math.abs(jac - est))
    }).toSeq
    val got = SparkEntry.queries("q235_kmv_jaccard")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).toSeq
    assert(got == want)
    got.foreach { r =>
      assert(r._7 >= 0 && r._7 <= 1000000L, s"estimate out of [0,1]: $r")
      assert(r._5 <= math.min(r._3, r._4))
    }
    assert(got.map(_._5).distinct.size > 1, "pairs do not discriminate")
  }
}
