package graft

import java.security.MessageDigest

/** q228 (hash-sample quantile accuracy) replayed from scratch in plain
  * driver Scala — same cents rounding, same ⌈pn/100⌉ order statistic,
  * same md5 sample — plus monotonicity of both quantile columns in p. */
class Wave50Spec extends SparkSpec {

  private def h60(s: String): Long =
    java.lang.Long.parseLong(MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .substring(0, 15), 16)

  test("q228 equals a from-scratch driver replay; quantiles are monotone") {
    val rows = graft.sources.Tables.lineitem(spark, sfSmoke)
      .selectExpr("CAST(round(l_extendedprice * 100) AS BIGINT)",
        "l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    def kth(vs: Array[Long], p: Long): Long =
      vs((((p * vs.length + 99) / 100) - 1).toInt)
    val full = rows.map(_._1).sorted
    val samp = rows.filter { case (_, ok, ln) =>
      h60(s"$ok:$ln:qs") % 64 == 0 }.map(_._1).sorted
    val want = Seq(25L, 50L, 75L, 90L, 99L).map { p =>
      val e = kth(full, p); val m = kth(samp, p)
      (p, full.length.toLong, e, samp.length.toLong, m, math.abs(m - e),
        math.abs(m - e) * 1000000L / e)
    }
    val got = SparkEntry.queries("q228_sample_quantile")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want)
    assert(got.map(_._3) == got.map(_._3).sorted, "exact not monotone in p")
    assert(got.map(_._5) == got.map(_._5).sorted, "estimate not monotone in p")
    assert(samp.length > 0 && samp.length < full.length)
  }
}
