package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Value invariants for the round-11 wave-28 operator (q201): a
  * from-scratch PQ-retrieval-audit replay — train, encode, ADC and
  * exact rankings, and the published recall/rank sheet. */
class Wave28Spec extends SparkSpec {

  private val M = 4
  private val S = 16
  private val K = 4

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def sq(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("q201: PQ recall audit matches a from-scratch replay") {
    val vs = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toIndexedSeq))
      .toSeq
    // train (the Wave24Spec replay, inlined): md5-first K seeds + one
    // integer Lloyd iteration per subspace
    val seeds = vs.sortBy { case (id, _) => (md5Hex(id.toString), id) }
      .take(K).map(_._2)
    def assign(books: Seq[(Long, IndexedSeq[Long])],
        sv: IndexedSeq[Long]): Long =
      books.map { case (c, cv) => (sq(sv, cv), c) }.min._2
    val books = (0 until M).map { m =>
      val init = seeds.zipWithIndex.map { case (v, i) =>
        ((i + 1).toLong, v.slice(m * S, (m + 1) * S)) }
      val subs = vs.map { case (_, qv) => qv.slice(m * S, (m + 1) * S) }
      subs.groupBy(sv => assign(init, sv)).toSeq
        .map { case (c, svs) =>
          (c, (0 until S).map(i =>
            svs.map(_(i)).sum / svs.length).toIndexedSeq) }
        .sortBy(_._1)
    }
    val codes = vs.map { case (id, qv) =>
      id -> (0 until M).map(m =>
        assign(books(m), qv.slice(m * S, (m + 1) * S)))
    }.toMap
    val mod = graft.util.Geometry.adaptiveSampleMod(vs.length.toLong, 50L, 5)
    val qids = vs.filter(_._1 % mod == 0).map(_._1)
    var (hits, at1, in5, in10, missed) = (0L, 0L, 0L, 0L, 0L)
    qids.foreach { qid =>
      val qqv = vs.find(_._1 == qid).get._2
      val adcTable = (0 until M).map { m =>
        val qs = qqv.slice(m * S, (m + 1) * S)
        books(m).map { case (c, cv) => c -> sq(qs, cv) }.toMap
      }
      val others = vs.filter(_._1 != qid)
      val adcRank = others.map { case (id, _) =>
        (codes(id).zipWithIndex.map { case (c, m) => adcTable(m)(c) }.sum, id)
      }.sorted.map(_._2).zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
      val exSorted = others.map { case (id, v) => (sq(v, qqv), id) }
        .sorted.map(_._2)
      val exTop = exSorted.take(10)
      hits += exTop.count(id => adcRank(id) <= 10)
      val r1 = adcRank(exTop.head)
      if (r1 == 1) at1 += 1
      if (r1 <= 5) in5 += 1
      if (r1 <= 10) in10 += 1 else missed += 1
    }
    val got = SparkEntry.queries("q201_pq_recall_audit")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).head
    assert(got == ((qids.length.toLong, hits, at1, in5, in10, missed)))
    // bucket consistency: at1 <= in5 <= in10, and in10 + missed = n
    assert(got._3 <= got._4 && got._4 <= got._5)
    assert(got._5 + got._6 == got._1)
    assert(got._1 > 0)
  }
}
