package graft

/** q231 (first/last-touch attribution) replayed from scratch in plain
  * driver Scala — same 7-day lookback, same DECIMAL(18,2) value sums —
  * plus the policies' structural relation: both attribute the same
  * purchase set (a window with any click has both a first and a last),
  * and first-touch latency dominates last-touch latency. */
class Wave53Spec extends SparkSpec {

  test("q231 equals a from-scratch driver replay; policy relations hold") {
    val look = 7L * 86400L * 1000000L
    val ev = graft.sources.Tables.events(spark, sfSmoke)
      .selectExpr("user_id", "unix_micros(ts)", "event_type", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    val byUser = ev.groupBy(_._1)
    def dec2(d: Double): BigDecimal =
      BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    def sheet(first: Boolean): (String, Long, Long, Double, Double, Long) = {
      var (np, na, lat) = (0L, 0L, 0L)
      var (av, ov) = (BigDecimal(0), BigDecimal(0))
      byUser.values.foreach { rows =>
        val clicks = rows.filter(_._3 == "click").map(_._2).sorted
        rows.filter(_._3 == "purchase").foreach { p =>
          np += 1
          val in = clicks.filter(c => c >= p._2 - look && c <= p._2)
          if (in.nonEmpty) {
            na += 1; av += dec2(p._4)
            lat += p._2 - (if (first) in.min else in.max)
          } else ov += dec2(p._4)
        }
      }
      (if (first) "first" else "last", np, na, av.toDouble, ov.toDouble, lat)
    }
    val want = Seq(sheet(first = true), sheet(first = false))
    val got = SparkEntry.queries("q231_attribution")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5))).toSeq
    assert(got == want)
    val Seq(f, l) = got
    assert(f._3 == l._3, "policies must attribute the same purchase set")
    assert(f._6 >= l._6, "first-touch latency must dominate last-touch")
    assert(f._3 > 0 && f._3 < f._2, "sheet does not discriminate")
  }
}
