package graft

import java.security.MessageDigest

/** q237 (CUPED audit) replayed from scratch in plain driver Scala —
  * same per-user halves, same exact moments, same rounded θ — plus the
  * method's point: the realized variance reduction is strictly
  * positive (user-activity variance correlates the halves), and the
  * adjustment moves both arms' means coherently (same θ). */
class Wave59Spec extends SparkSpec {

  private def h60(s: String): Long =
    java.lang.Long.parseLong(MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .substring(0, 15), 16)

  test("q237 equals a from-scratch driver replay; reduction is real") {
    val epoch = java.time.LocalDate.parse("2024-01-01").toEpochDay
    val ev = graft.sources.Tables.events(spark, sfSmoke)
      .selectExpr("user_id", "CAST(round(value * 100) AS BIGINT)",
        "CAST(ts AS DATE)")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        (r.getDate(2).toLocalDate.toEpochDay - epoch).toInt))
    val users = ev.groupBy(_._1).map { case (u, xs) =>
      (u, xs.filter(_._3 < 15).map(_._2).sum,
        xs.filter(_._3 >= 15).map(_._2).sum, h60(s"$u:cuped") % 2)
    }.toSeq
    val n = users.size.toLong
    def bi(x: Long) = BigInt(x)
    val sx = users.map(u => bi(u._2)).sum
    val sy = users.map(u => bi(u._3)).sum
    val sxy = users.map(u => bi(u._2) * bi(u._3)).sum
    val sxx = users.map(u => bi(u._2) * bi(u._2)).sum
    val syy = users.map(u => bi(u._3) * bi(u._3)).sum
    val cov = (sxy * n - sx * sy).toDouble
    val vx = (sxx * n - sx * sx).toDouble
    val vy = (syy * n - sy * sy).toDouble
    val theta = BigDecimal(cov / vx)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val red = math.floor(cov * cov / (vx * vy) * 1000000d).toLong
    val want = Seq(0L, 1L).map { t =>
      val arm = users.filter(_._4 == t)
      val na = arm.size.toLong
      val sxa = arm.map(u => bi(u._2)).sum.toDouble
      val sya = arm.map(u => bi(u._3)).sum.toDouble
      def r4(d: Double) = BigDecimal(d)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (t, na, theta, red, r4(sya / na),
        r4((sya - theta * (sxa - na * (sx.toDouble / n))) / na))
    }
    val got = SparkEntry.queries("q237_cuped")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == want)
    assert(got.head._4 > 0, "variance reduction should be strictly positive")
    assert(got.head._4 < 1000000L)
  }
}
