package graft

/** q238 (Gini split planner) replayed from scratch in plain driver Scala
  * — same label, same stump predicates, same overflow-safe scaled
  * division — plus the planner's point: the genuinely predictive stump
  * (token count, r ≈ 0.998 with the label's n_chars) wins with a gain
  * that dwarfs the independent features'. */
class Wave60Spec extends SparkSpec {

  private def gini(n: Long, p: Long): Long =
    if (n == 0) 0L
    else {
      val x = p * p + (n - p) * (n - p)
      1000000L - (((x / n) * 1000000L + ((x % n) * 1000000L) / n) / n)
    }

  test("q238 equals a from-scratch driver replay; the real feature wins") {
    val rows = graft.sources.Tables.documents(spark, sfSmoke)
      .selectExpr("CAST(n_chars >= 306 AS LONG)",
        "CAST(size(split(text, ' ')) AS LONG)", "lang", "source")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3)))
    val n = rows.length.toLong
    val p = rows.map(_._1).sum
    val feats = Seq(
      ("f_tokens_ge56", (r: (Long, Long, String, String)) => r._2 >= 56),
      ("f_lang_en", (r: (Long, Long, String, String)) => r._3 == "en"),
      ("f_src_lt10", (r: (Long, Long, String, String)) => r._4.length == 4))
    val grid = feats.map { case (nm, pred) =>
      val n1 = rows.count(pred).toLong
      val p1 = rows.filter(pred).map(_._1).sum
      val (n0, p0) = (n - n1, p - p1)
      val split = (n1 * gini(n1, p1) + n0 * gini(n0, p0)) / n
      (nm, n1, p1, n0, p0, gini(n, p), split, gini(n, p) - split)
    }
    val bestKey = grid.map(g => (g._8, g._1)).max
    val want = grid.map(g =>
        (g._1, g._2, g._3, g._4, g._5, g._6, g._7, g._8,
          (g._8, g._1) == bestKey))
      .sortBy(_._1)
    val got = SparkEntry.queries("q238_gini_split")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getBoolean(8))).toSeq
    assert(got == want)
    val winner = got.find(_._9).get
    assert(winner._1 == "f_tokens_ge56", s"wrong winner: $winner")
    val runnerUp = got.filter(!_._9).map(_._8).max
    assert(winner._8 > 100 * math.max(runnerUp, 1L),
      s"winning gain should dwarf the independents: ${got.map(_._8)}")
  }
}
