package graft

import org.apache.spark.sql.functions._

/** Value invariants for the round-11 wave-27 operators (q199-q200):
  * from-scratch water-fill and rule-battery replays, plus a synthetic
  * skewed-supply drive of the water-fill's saturated branch (the
  * fixture's near-uniform sources keep every row in the capped
  * branch). */
class Wave27Spec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Reference water-fill: ascending greedy with exact integers. */
  private def replayFill(supplies: Seq[(String, Long)], budget: Long)
      : (Long, Map[String, Long]) = {
    val sorted = supplies.sortBy { case (s, v) => (v, s) }
    var rem = budget
    var level = 0L
    var found = false
    sorted.zipWithIndex.foreach { case ((_, sup), i) =>
      if (!found) {
        val cand = rem / (sorted.length - i)
        if (sup > cand) { level = cand; found = true }
        else rem -= sup
      }
    }
    if (!found) level = 0L // unreachable for budget < total
    (level, supplies.map { case (s, v) => s -> math.min(v, level) }.toMap)
  }

  test("q199: fixture water-fill matches a from-scratch greedy replay") {
    val supplies = graft.sources.Tables.documents(spark, sfSmoke)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val budget = supplies.map(_._2).sum / 2
    val (level, alloc) = replayFill(supplies, budget)
    val got = SparkEntry.queries("q199_mixture_waterfill")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    got.foreach { case (s, sup, a, sat, l, b, left) =>
      assert(l == level && b == budget)
      assert(a == alloc(s))
      assert((sat == 1) == (sup <= level))
      assert(left == budget - alloc.values.sum && left >= 0)
    }
    assert(got.nonEmpty)
  }

  test("q199: skewed synthetic supply exercises BOTH branches") {
    // one giant source + small ones: the small ones fund fully
    // (saturated), the giant caps at the water level
    val supplies = Seq(("tiny1", 10L), ("tiny2", 20L), ("mid", 100L),
      ("giant", 10000L))
    val budget = 300L
    val src = supplies.toDF("source", "supply")
      .withColumn("budget", lit(budget))
    val got = graft.operators.Wave27Queries.waterfill(src)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getInt(3)))).toMap
    // replay: 10 + 20 fully funded; cand at 'mid' = (300-30)/2 = 135 >=
    // 100 -> funded; cand at 'giant' = 170/1 = 170 < 10000 -> level 170
    assert(got == Map("tiny1" -> ((10L, 1)), "tiny2" -> ((20L, 1)),
      "mid" -> ((100L, 1)), "giant" -> ((170L, 0))))
    val (level, alloc) = replayFill(supplies, budget)
    assert(level == 170L && supplies.forall { case (s, v) =>
      alloc(s) == got(s)._1 })
  }

  test("q200: rule battery matches a from-scratch replay and the rules bite") {
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, ds) =>
      val rules = ds.map { case (_, t) =>
        val toks = t.split(" ", -1)
        val nt = toks.length.toLong
        val ns = t.count(c => !c.isLetterOrDigit && c != ' ').toLong
        val swl = toks.map(_.length.toLong).sum
        val mwl = toks.map(_.length.toLong).max
        val nn = toks.count(_.forall(_.isDigit)).toLong
        val rSym = if (ns * 10 > nt * 1) 1L else 0L
        val rWl = if (swl * 1000 < nt * 4100 || swl * 1000 > nt * 4900
          || mwl > 10) 1L else 0L
        val rNum = if (nn * 10 > nt * 1) 1L else 0L
        val rShort = if (nt < 12) 1L else 0L
        (rSym, rWl, rNum, rShort)
      }
      val any = rules.count(r => r._1 + r._2 + r._3 + r._4 > 0).toLong
      val all4 = rules.count(r => r._1 + r._2 + r._3 + r._4 == 4).toLong
      (src, ds.length.toLong, rules.map(_._1).sum, rules.map(_._2).sum,
        rules.map(_._3).sum, rules.map(_._4).sum, any, all4,
        r6((ds.length - any).toDouble / ds.length))
    }
    val got = SparkEntry.queries("q200_quality_rule_battery")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getDouble(8))).toSeq
    assert(got == want)
    // the tuned rules DISCRIMINATE on the fixture (not all-pass):
    assert(got.map(_._4).sum > 0, "wordlen rule never fires")
    // symbol/numeric tripwires: the synthetic corpus is clean by
    // construction — zero IS the assertion
    assert(got.map(_._3).sum == 0 && got.map(_._5).sum == 0)
    // and not everything fails either
    assert(got.exists(_._9 > 0.0))
  }
}
