package graft

import java.security.MessageDigest

/** q234 (split-conformal interval audit) replayed from scratch in plain
  * driver Scala — same hash split, same integer model, same
  * ⌈(n+1)(1−α)⌉ conformal index — plus the protocol's structure:
  * q̂ shrinks as α grows, and coverage tracks target within the
  * finite-sample slack of the calibration size. */
class Wave56Spec extends SparkSpec {

  private def h60(s: String): Long =
    java.lang.Long.parseLong(MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .substring(0, 15), 16)

  test("q234 equals a from-scratch driver replay; conformal structure holds") {
    val ev = graft.sources.Tables.events(spark, sfSmoke)
      .selectExpr("event_id", "event_type", "CAST(round(value * 100) AS BIGINT)")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .map(x => (x._1, x._2, x._3, h60(s"${x._1}:cf") % 4))
    val train = ev.filter(_._4 <= 1)
    val mu = train.groupBy(_._2).map { case (t, xs) =>
      t -> xs.map(_._3).sum / xs.length }
    val cal = ev.filter(_._4 == 2)
      .map(x => (math.abs(x._3 - mu(x._2)), x._1)).sorted
    val test0 = ev.filter(_._4 == 3).map(x => math.abs(x._3 - mu(x._2)))
    val want = Seq(10L, 20L).map { a =>
      val k = math.min(((cal.length + 1) * (100 - a) + 99) / 100,
        cal.length.toLong)
      val qhat = cal((k - 1).toInt)._1
      val covered = test0.count(_ <= qhat).toLong
      (a, train.length.toLong, cal.length.toLong, test0.length.toLong,
        qhat, (100 - a) * 10000, covered * 1000000L / test0.length)
    }
    val got = SparkEntry.queries("q234_conformal")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want)
    val Seq(a10, a20) = got
    assert(a10._5 >= a20._5, "qhat must shrink as alpha grows")
    // marginal guarantee: one fixed split sits within ~4/sqrt(n_cal) of
    // target (generous DKW-style slack)
    got.foreach { r =>
      val slack = (4000000.0 / math.sqrt(r._3.toDouble)).toLong
      assert(math.abs(r._7 - r._6) <= slack,
        s"coverage ${r._7} strays past target ${r._6} +/- $slack")
    }
  }
}
