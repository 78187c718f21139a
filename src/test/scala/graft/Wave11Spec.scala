package graft

import org.apache.spark.sql.functions._

/** Value invariants for the round-7 wave-11 operators (q139-q141):
  * driver-side brute-force recomputations of the interval lookup and
  * both test statistics.
  */
class Wave11Spec extends SparkSpec {
  import spark.implicits._

  private def run(key: String) = SparkEntry.queries(key)(spark, sfSmoke)

  private def events() = graft.sources.Tables.events(spark, sfSmoke)
    .select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"), col("event_type"), col("value"))
    .as[(Long, Long, Long, String, Double)].collect()

  test("q139: regime labels match a brute-force interval scan") {
    val evs = events()
    // per-user non-purchase regimes as (from, type) change points
    val regimes = evs.filter(_._4 != "purchase")
      .groupBy(_._1).view.mapValues { rows =>
        val sorted = rows.sortBy(r => (r._3, r._2))
        val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
        sorted.foreach { r =>
          if (runs.isEmpty || runs.last._2 != r._4) runs += ((r._3, r._4))
        }
        runs.toSeq
      }.toMap
    def regimeAt(u: Long, us: Long): String =
      regimes.get(u).flatMap(_.takeWhile(_._1 <= us).lastOption)
        .map(_._2).getOrElse("none")
    val want = evs.filter(_._4 == "purchase")
      .groupBy(p => regimeAt(p._1, p._3))
      .map { case (reg, ps) =>
        reg -> ((ps.length.toLong, ps.map(_._1).distinct.length.toLong))
      }
    val got = run("q139_scd2_lookup").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    // conservation: every purchase labeled exactly once
    assert(got.values.map(_._1).sum == evs.count(_._4 == "purchase"))
  }

  test("q140: chi-square matches a driver-side contingency computation") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select("source", "lang").as[(String, String)].collect()
    val cells = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rm = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cm = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = docs.length
    val chi2 = cells.map { case ((s0, l0), o) =>
      val e = rm(s0).toDouble * cm(l0) / n
      val c = BigDecimal((o - e) * (o - e) / e)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      math.round(c * 1e6)
    }.sum / 1e6
    val r = run("q140_chi_square").collect().head
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == (rm.size - 1).toLong * (cm.size - 1))
    assert(math.abs(r.getDouble(2) - chi2) < 1e-9, s"${r.getDouble(2)} vs $chi2")
    assert(r.getDouble(5) >= 0.0)
  }

  test("q141: KS statistic matches a brute-force CDF sweep") {
    val evs = events().filter(e => e._4 == "click" || e._4 == "purchase")
    val a = evs.filter(_._4 == "click").map(_._5).sorted
    val b = evs.filter(_._4 == "purchase").map(_._5).sorted
    val values = (a ++ b).distinct.sorted
    def cdf(xs: Array[Double], v: Double) =
      xs.count(_ <= v).toDouble / xs.length
    val d = values.map(v => math.abs(cdf(a, v) - cdf(b, v))).max
    val r = run("q141_ks_test").collect().head
    assert(r.getLong(0) == a.length && r.getLong(1) == b.length)
    val want = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(2) - want) < 1e-9, s"${r.getDouble(2)} vs $want")
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    // the reported location actually achieves the max gap
    val at = r.getDouble(3)
    assert(math.abs(math.abs(cdf(a, at) - cdf(b, at)) - d) < 1e-12)
  }
}
