package graft

import org.apache.spark.sql.functions._

/** Value invariants for the round-13 wave-36 operator (q214): the
  * zone-map skipping sheet replayed from scratch in plain driver Scala
  * (integer day-space, truncating division — both engines' semantics),
  * plus the property the sheet exists to show: clustering by the
  * predicate column must strictly out-skip the arrival-order layout. */
class Wave36Spec extends SparkSpec {

  test("q214: skipping sheet matches a from-scratch replay") {
    val epoch = java.time.LocalDate.parse("1995-01-01")
    val rows = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
      .select(col("l_orderkey"),
        col("l_shipdate").cast("date").cast("string")).collect()
      .map(r => (r.getLong(0), java.time.temporal.ChronoUnit.DAYS.between(
        epoch, java.time.LocalDate.parse(r.getString(1)))))
      .toSeq
    val preds = (0 until 8).map { i => (i, 365L + 91L * i, 365L + 91L * (i + 1)) }
    def sheet(layout: String, fid: ((Long, Long)) => Long)
        : Seq[(String, Int, Long, Long, Long, Long, Long, Long, Long)] = {
      val files = rows.groupBy(fid).map { case (_, rs) =>
        (rs.map(_._2).min, rs.map(_._2).max, rs.size.toLong) }.toSeq
      preds.map { case (q, lo, hi) =>
        val read = files.filter(f => f._1 < hi && f._2 >= lo)
        val rowsTotal = files.map(_._3).sum
        val rowsRead = read.map(_._3).sum
        val matched = rows.count(r => r._2 >= lo && r._2 < hi).toLong
        (layout, q, files.size.toLong, read.size.toLong, rowsTotal,
          rowsRead, matched,
          (rowsTotal - rowsRead) * 1000000L / rowsTotal,
          rowsRead * 1000000L / math.max(matched, 1L))
      }
    }
    val want = sheet("natural", r => r._1 / 256L) ++
      sheet("shipdate", r => r._2 / 91L)
    val got = SparkEntry.queries("q214_skipping_audit")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9))).toSeq
    assert(got == want)
    // the sheet must discriminate: the predicate-clustered layout skips
    // strictly more rows than arrival order on every window, and no
    // window reads fewer rows than it matches
    val byLayout = got.groupBy(_._1)
    byLayout("shipdate").zip(byLayout("natural")).foreach { case (sd, nat) =>
      assert(sd._8 > nat._8,
        s"window ${sd._2}: shipdate skip ${sd._8} !> natural ${nat._8}")
    }
    got.foreach(r => assert(r._6 >= r._7, s"read ${r._6} < matched ${r._7}"))
  }
}
