package graft

/** q233 (bitmap-container layout audit) replayed from scratch in plain
  * driver Scala — same file grids, same run counting, same Roaring
  * container costs — plus the claim the sheet exists for: clustering
  * collapses RLE cost and flips every container win to RLE. */
class Wave55Spec extends SparkSpec {

  test("q233 equals a from-scratch driver replay; clustering collapses RLE") {
    val epoch = java.time.LocalDate.parse("1995-01-01").toEpochDay
    val rows = graft.sources.Tables.orders(spark, sfSmoke)
      .selectExpr("o_orderkey", "month(o_orderdate)",
        "CAST(o_orderdate AS DATE)")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getDate(2).toLocalDate.toEpochDay - epoch))
    def sheet(name: String,
        assigned: Seq[(Long, (Long, Int, Long))]) = {
      val files = assigned.groupBy(_._1)
      val conts = files.toSeq.flatMap { case (_, frk) =>
        val sorted = frk.map(_._2)
        val frows = sorted.length.toLong
        val starts = sorted.zipWithIndex.map { case (r, i) =>
          (r._2, i == 0 || sorted(i - 1)._2 != r._2) }
        starts.groupBy(_._1).map { case (_, xs) =>
          val n = xs.length.toLong
          val runs = xs.count(_._2).toLong
          val (aw, rw, bw) = (n, runs * 2, (frows + 15) / 16)
          val best = Seq(aw, rw, bw).min
          val winner = if (rw == best) "rle"
            else if (aw == best) "array" else "bitmap"
          (n, runs, aw, rw, bw, best, winner)
        }
      }
      (name, conts.size.toLong, conts.map(_._1).sum, conts.map(_._2).sum,
        conts.map(_._3).sum, conts.map(_._4).sum, conts.map(_._5).sum,
        conts.map(_._6).sum,
        conts.count(_._7 == "rle").toLong,
        conts.count(_._7 == "array").toLong,
        conts.count(_._7 == "bitmap").toLong)
    }
    // arrival: file = orderkey div 256, in-file order by orderkey;
    // clustered: sort by (day, orderkey), cut a file every 256 rows
    val arrivalAssigned = rows.toSeq.sortBy(_._1)
      .map(r => (r._1 / 256, r))
      .sortBy { case (f, r) => (f, r._1) }
    val clusteredAssigned = rows.toSeq.sortBy(r => (r._3, r._1))
      .zipWithIndex.map { case (r, i) => (i.toLong / 256, r) }
    val want = Seq(
      sheet("arrival", arrivalAssigned),
      sheet("clustered", clusteredAssigned))
    val got = SparkEntry.queries("q233_bitmap_layout")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10))).toSeq
    assert(got == want)
    val Seq(a, c) = got
    assert(c._6 < a._6, "clustered RLE words must collapse below arrival")
    assert(c._8 < a._8, "clustered best-container total must beat arrival")
    // at sf0.001 a 91-day file holds only ~55 rows, so a few month
    // boundaries split runs; RLE must still win the large majority
    // (ALL containers at sf0.01+, where files reach ~550 rows)
    assert(c._9 * 10 > c._2 * 9 && c._9 > a._9,
      s"RLE should win >=90% of clustered containers (${c._9}/${c._2})")
  }
}
