package graft

import java.security.MessageDigest

/** q225 (deletion-vector MOR audit) replayed from scratch in plain
  * driver Scala — same file layout, same md5 deletion sampling, same
  * threshold grid — plus the policy monotonicity the sheet is FOR:
  * raising the threshold can only shrink the rewrite bill and grow
  * the residual read amplification. */
class Wave47Spec extends SparkSpec {

  private def h60(s: String): Long =
    java.lang.Long.parseLong(MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .substring(0, 15), 16)

  test("q225 equals a from-scratch driver replay; thresholds are monotone") {
    val keys = graft.sources.Tables.orders(spark, sfSmoke)
      .select("o_orderkey").collect().map(_.getLong(0))
    val files = keys.groupBy(_ / 256).toSeq.map { case (_, ks) =>
      (ks.length.toLong, ks.count(k => h60(s"$k:del") % 20 == 0).toLong)
    }
    val want = Seq(30000L, 60000L, 90000L).map { t =>
      val rw = files.map { case (n, d) =>
        (n, d, if (d * 1000000L >= n * t) 1L else 0L) }
      val total = rw.map(_._1).sum; val del = rw.map(_._2).sum
      val reclaimed = rw.map(r => r._3 * r._2).sum
      (t, files.length.toLong, rw.map(_._3).sum, del,
        rw.map(r => r._3 * r._1).sum, reclaimed,
        (total - reclaimed) * 1000000L / (total - del))
    }
    val got = SparkEntry.queries("q225_deletion_vectors")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want)
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(b._5 <= a._5 && b._7 >= a._7) // rewrite bill down, read-amp up
    }
  }
}
