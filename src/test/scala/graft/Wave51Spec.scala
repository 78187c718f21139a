package graft

/** q229 (2-D skyline) checked against the O(n²) brute-force dominance
  * definition — the prefix-scan decomposition must reproduce the
  * textbook semantics exactly, including equal-point and equal-cents
  * tie handling — plus the frontier's defining staircase shape. */
class Wave51Spec extends SparkSpec {

  test("q229 equals the brute-force dominance skyline") {
    val epoch = java.time.LocalDate.parse("1995-01-01").toEpochDay
    val pts = graft.sources.Tables.orders(spark, sfSmoke)
      .selectExpr("o_orderkey", "CAST(round(o_totalprice * 100) AS BIGINT)",
        "CAST(o_orderdate AS DATE)")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDate(2).toLocalDate.toEpochDay - epoch))
    val want = pts.filter { case (_, c, d) =>
      !pts.exists { case (_, c2, d2) =>
        c2 >= c && d2 >= d && (c2 > c || d2 > d) }
    }.sortBy { case (k, c, _) => (-c, k) }.toSeq
    val got = SparkEntry.queries("q229_skyline")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // staircase: walking cents down, days strictly increase across
    // distinct cents levels (equal-(c,d) duplicates may repeat a step)
    val steps = got.map(x => (x._2, x._3)).distinct
    steps.sliding(2).foreach {
      case Seq(a, b) => assert(a._1 > b._1 && a._2 < b._2, s"$a !< $b")
      case _ =>
    }
  }
}
