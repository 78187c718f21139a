package graft

import org.apache.spark.sql.functions._

/** Value invariants for the round-13 wave-41 operator (q219): the
  * cascade-ordering sheet replayed from scratch in plain driver Scala
  * — same rule kernels as q200, same joint-distribution stage pricing,
  * same greedy tie-break — plus the planner's point: the greedy order
  * must pay strictly fewer rule evaluations than the declared order on
  * the fixture, while both reject the same documents. */
class Wave41Spec extends SparkSpec {

  test("q219: ordering sheet matches a from-scratch replay") {
    val texts = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("text")).collect().map(_.getString(0)).toSeq
    def bitsOf(t: String): Map[String, Long] = {
      val toks = t.split(" ", -1).toSeq
      val nt = toks.length.toLong
      val ns = (t.length - t.replaceAll("[^a-zA-Z0-9 ]", "").length).toLong
      val swl = toks.map(_.length.toLong).sum
      val mwl = toks.map(_.length.toLong).max
      val nn = toks.count(_.matches("[0-9]+")).toLong
      Map(
        "symbol" -> (if (ns * 10 > nt * 1) 1L else 0L),
        "wordlen" -> (if (swl * 1000 < nt * 4100 || swl * 1000 > nt * 4900
          || mwl > 10) 1L else 0L),
        "numeric" -> (if (nn * 10 > nt * 1) 1L else 0L),
        "short" -> (if (nt < 12) 1L else 0L))
    }
    val docs = texts.map(bitsOf)
    val rules = Seq("symbol", "wordlen", "numeric", "short")
    val fails = rules.map(r => r -> docs.map(_(r)).sum).toMap
    val greedy = rules.sortBy(r => (-fails(r), r))
    def stages(order: Seq[String], policy: String)
        : Seq[(String, Int, String, Long, Long)] =
      order.zipWithIndex.map { case (r, i) =>
        val in = docs.count(d => order.take(i).forall(d(_) == 0L)).toLong
        val rej = docs.count(d =>
          order.take(i).forall(d(_) == 0L) && d(r) == 1L).toLong
        (policy, i + 1, r, in, rej)
      }
    def withTotal(st: Seq[(String, Int, String, Long, Long)]) =
      (st.head._1, 0, "TOTAL", st.map(_._4).sum, st.map(_._5).sum) +: st
    val want = (withTotal(stages(rules, "declared"))
      ++ withTotal(stages(greedy, "greedy"))).sortBy(r => (r._1, r._2))
    val got = SparkEntry.queries("q219_filter_ordering")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    // the planner discriminates: greedy pays strictly fewer evaluations
    // and both policies reject the same total documents
    val totD = got.find(r => r._1 == "declared" && r._2 == 0).get
    val totG = got.find(r => r._1 == "greedy" && r._2 == 0).get
    assert(totG._4 < totD._4,
      s"greedy evals ${totG._4} not < declared ${totD._4}")
    assert(totG._5 == totD._5, "policies disagree on rejected docs")
  }
}
