package graft

import java.security.MessageDigest

/** q230 (IVM signed-delta maintenance) replayed from scratch in plain
  * driver Scala — same hash splits, same signed-delta merge — and the
  * property the sheet certifies: maintained == recomputed everywhere. */
class Wave52Spec extends SparkSpec {

  private def h60(s: String): Long =
    java.lang.Long.parseLong(MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .substring(0, 15), 16)

  test("q230 equals a from-scratch driver replay; algebra closes") {
    val rows = graft.sources.Tables.lineitem(spark, sfSmoke)
      .selectExpr("l_returnflag", "l_linestatus",
        "CAST(l_quantity AS BIGINT)", "l_orderkey", "l_linenumber")
      .collect().map { r =>
        val key = s"${r.getLong(3)}:${r.getInt(4)}"
        (r.getString(0), r.getString(1), r.getLong(2),
          h60(s"$key:ivm") % 10 == 0, h60(s"$key:ivmdel") % 15 == 0)
      }
    def agg(xs: Seq[(String, String, Long)]): Map[(String, String), (Long, Long)] =
      xs.groupBy(x => (x._1, x._2))
        .map { case (k, vs) => k -> (vs.map(_._3).sum, vs.size.toLong) }
    val v0 = agg(rows.toSeq.filter(!_._4).map(x => (x._1, x._2, x._3)))
    val delta = (rows.toSeq.filter(_._4).map(x => (x._1, x._2, x._3, 1L)) ++
      rows.toSeq.filter(x => !x._4 && x._5).map(x => (x._1, x._2, x._3, -1L)))
      .groupBy(x => (x._1, x._2))
      .map { case (k, vs) =>
        k -> (vs.map(v => v._4 * v._3).sum, vs.map(_._4).sum) }
    val maintained = (v0.keySet ++ delta.keySet).toSeq.map { k =>
      val (q, n) = v0.getOrElse(k, (0L, 0L))
      val (dq, dn) = delta.getOrElse(k, (0L, 0L))
      (k, q + dq, n + dn)
    }.filter(_._3 > 0)
    val recomputed = agg(rows.toSeq.filter(x => (!x._4 && !x._5) || x._4)
      .map(x => (x._1, x._2, x._3)))
    val want = maintained.map { case (k, mq, mn) =>
      val (rq, rn) = recomputed(k)
      (k._1, k._2, mq, mn, rq, rn, mq == rq, mn == rn)
    }.sortBy(x => (x._1, x._2))
    val got = SparkEntry.queries("q230_ivm_delta")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6),
        r.getBoolean(7))).toSeq
    assert(got == want)
    assert(got.forall(x => x._7 && x._8), "IVM algebra diverged from recompute")
    assert(got.nonEmpty)
  }
}
