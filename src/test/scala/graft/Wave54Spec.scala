package graft

/** q232 (Selinger join-order cost sheet) replayed from scratch in plain
  * driver Scala — same filters, same flag-sum intermediates — plus the
  * properties the planner exists for: exactly one winner, the winner is
  * never the cross-product start, and the cross's step-1 intermediate
  * dwarfs both join starts. */
class Wave54Spec extends SparkSpec {

  test("q232 equals a from-scratch driver replay; the cross never wins") {
    val lf = graft.sources.Tables.lineitem(spark, sfSmoke)
      .filter("l_discount > 0.07").selectExpr("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ok = graft.sources.Tables.orders(spark, sfSmoke)
      .filter("o_orderstatus = 'F'").select("o_orderkey")
      .collect().map(_.getLong(0)).toSet
    val pk = graft.sources.Tables.part(spark, sfSmoke)
      .filter("p_size > 25").select("p_partkey")
      .collect().map(_.getLong(0)).toSet
    val nLo = lf.count(x => ok(x._1)).toLong
    val nLp = lf.count(x => pk(x._2)).toLong
    val nLop = lf.count(x => ok(x._1) && pk(x._2)).toLong
    val cross = ok.size.toLong * pk.size.toLong
    val grid = Seq(("1_LO_then_P", nLo), ("2_LP_then_O", nLp),
      ("3_OxP_then_L", cross))
    val minCost = grid.map(_._2 + nLop).min
    val want = grid.map { case (n, s1) =>
      (n, s1, nLop, s1 + nLop, s1 + nLop == minCost) }
    val got = SparkEntry.queries("q232_join_order")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    assert(got == want)
    assert(got.count(_._5) == 1, "exactly one winning order")
    assert(!got.find(_._1.startsWith("3")).get._5, "the cross must not win")
    // scale-free form of "the cross dwarfs the join starts": it must
    // exceed both strictly even at the 1.5k-order smoke scale (the
    // ratio grows with sf — 1000x at sf0.01, unbounded at 100 TB)
    assert(cross > math.max(nLo, nLp) * 10,
      "cross start should dwarf both join starts")
  }
}
