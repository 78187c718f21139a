package graft

import java.security.MessageDigest

/** q221 (HLL accuracy audit) replayed from scratch in plain driver
  * Scala — same md5-60 PRF, same register rule (idx = low 6 bits,
  * rho = leading zeros of the next 27 bits + 1), same scaled-integer
  * estimator — plus the estimator's structural guarantees: the raw
  * estimate is within the documented HLL error envelope on the
  * fixture, and zeros/max_rho agree with the registers. */
class Wave43Spec extends SparkSpec {

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)

  test("q221 equals a from-scratch driver replay of the registers") {
    import graft.operators.Wave43Queries.{HllB, HllM, HllWBits, EstNum}
    val rows = graft.sources.Tables.events(spark, sfSmoke)
      .select("event_type", "user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val regs = scala.collection.mutable.Map
      .empty[String, Array[Long]].withDefault(_ => Array.fill(HllM)(0L))
    rows.foreach { case (grp, uid) =>
      val h = h60("hll:" + uid.toString)
      val idx = (h % HllM).toInt
      val hw = (h >>> HllB) % (1L << HllWBits)
      val rho =
        if (hw == 0) (HllWBits + 1).toLong
        else (HllWBits + 1).toLong - (64 - java.lang.Long.numberOfLeadingZeros(hw))
      val a = regs.getOrElseUpdate(grp, Array.fill(HllM)(0L))
      if (rho > a(idx)) a(idx) = rho
    }
    val want = regs.map { case (grp, a) =>
      val sAll = a.map(r => 1L << (HllWBits + 1 - r)).sum
      val est = (EstNum / sAll) / 1000000L
      val exact = rows.filter(_._1 == grp).map(_._2).distinct.length.toLong
      grp -> ((exact, est, ((est - exact) * 1000000L) / exact,
        a.count(_ == 0L).toLong, a.max, HllM.toLong))
    }.toMap
    val got = SparkEntry.queries("q221_hll_audit")(spark, sfSmoke)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == want)
    // envelope: the raw estimator at m = 64 has RSE ~1.04/sqrt(64) = 13%;
    // allow 4 sigma on the fixture (and require a non-degenerate sketch)
    got.values.foreach { case (exact, est, _, zeros, maxRho, _) =>
      assert(est > 0 && maxRho >= 1)
      if (zeros == 0) assert(math.abs(est - exact).toDouble / exact < 0.52)
    }
  }
}
