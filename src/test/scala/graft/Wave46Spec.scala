package graft

import java.security.MessageDigest

/** q224 (ring vs HRW rebalance) replayed from scratch in plain driver
  * Scala — same packed 52-bit ring points, same first-point-clockwise
  * rule, same HRW argmax — plus the consistency guarantee the policy
  * is FOR: a ring key moves old→new ONLY onto one of the added
  * shards (growth never reshuffles between surviving shards). */
class Wave46Spec extends SparkSpec {

  private val Vn = 16
  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  private def h52(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 13), 16)
  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 15), 16)

  private def ring(n: Int): Seq[(Long, Long)] =
    (for (sh <- 0 until n; v <- 0 until Vn)
      yield (h52(s"ring:$sh:$v") * 256L + sh * Vn + v, sh.toLong)).sortBy(_._1)

  private def owner(pts: Seq[(Long, Long)], h: Long): Long =
    pts.find(_._1 >= h).getOrElse(pts.head)._2

  test("q224 equals a from-scratch driver replay; ring growth is consistent") {
    val keys = graft.sources.Tables.orders(spark, sfSmoke)
      .select("o_orderkey").collect().map(_.getLong(0))
    val (rOld, rNew) = (ring(8), ring(12))
    val rows = keys.map { k =>
      val h = h52(k.toString + ":ring") * 256L
      val (ro, rn) = (owner(rOld, h), owner(rNew, h))
      // consistency: a moved ring key lands on an ADDED shard only
      if (ro != rn) assert(rn >= 8, s"key $k moved $ro -> $rn")
      val hs = (0 until 12).map(s => h60(s"$k:$s"))
      val ho = hs.take(8).zipWithIndex.maxBy(p => (p._1, -p._2))._2.toLong
      val hn = hs.zipWithIndex.maxBy(p => (p._1, -p._2))._2.toLong
      (ro, rn, ho, hn)
    }
    def sheet(policy: String, old: ((Long, Long, Long, Long)) => Long,
        nw: ((Long, Long, Long, Long)) => Long) = {
      val n = rows.length.toLong
      val moved = rows.count(r => old(r) != nw(r)).toLong
      val maxLoad = rows.groupBy(nw).map(_._2.length.toLong).max
      (policy, n, moved, moved * 1000000L / n, maxLoad,
        maxLoad * 12L * 1000000L / n)
    }
    val want = Seq(sheet("hrw", _._3, _._4), sheet("ring", _._1, _._2))
    val got = SparkEntry.queries("q224_ring_rebalance")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
  }
}
