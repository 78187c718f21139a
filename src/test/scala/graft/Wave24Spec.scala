package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Value invariants for the round-11 wave-24 operators (q191-q193):
  * from-scratch driver-side PQ train/encode/ADC replays and the multi-k
  * span escalation's cross-operator consistency with q117. */
class Wave24Spec extends SparkSpec {

  private val M = 4
  private val S = 16
  private val K = 4

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def milli(v: Seq[Float]): IndexedSeq[Long] =
    v.map(x => BigDecimal(x.toDouble * 1000)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toIndexedSeq

  private def sq(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  private def vecs(): Seq[(Long, IndexedSeq[Long])] =
    spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), milli(r.getSeq[Float](1)))).toSeq

  /** From-scratch PQ train: md5-first K seeds, one integer Lloyd
    * iteration per subspace, ties to the lowest code id — the exact
    * contract of Wave24Queries.trainBooks. */
  private def replayBooks(vs: Seq[(Long, IndexedSeq[Long])])
      : IndexedSeq[Seq[(Long, IndexedSeq[Long])]] = {
    val seeds = vs.sortBy { case (id, _) => (md5Hex(id.toString), id) }
      .take(K).map(_._2)
    def assign(books: Seq[(Long, IndexedSeq[Long])],
        sv: IndexedSeq[Long]): (Long, Long) =
      books.map { case (c, cv) => (sq(sv, cv), c) }.min
    (0 until M).map { m =>
      val init = seeds.zipWithIndex.map { case (v, i) =>
        ((i + 1).toLong, v.slice(m * S, (m + 1) * S)) }
      val subs = vs.map { case (_, qv) => qv.slice(m * S, (m + 1) * S) }
      subs.groupBy(sv => assign(init, sv)._2).toSeq
        .map { case (c, svs) =>
          (c, (0 until S).map(i =>
            svs.map(_(i)).sum / svs.length).toIndexedSeq) }
        .sortBy(_._1)
    }
  }

  test("q191: PQ codebook sheet matches a from-scratch integer Lloyd replay") {
    val vs = vecs()
    val books = replayBooks(vs)
    val want = (0 until M).flatMap { m =>
      val subs = vs.map { case (_, qv) => qv.slice(m * S, (m + 1) * S) }
      subs.map(sv => books(m).map { case (c, cv) => (sq(sv, cv), c) }.min)
        .groupBy(_._2).toSeq.map { case (c, ds) =>
          val total = ds.map(_._1).sum
          (m, c, ds.length.toLong, total,
            r6(total.toDouble / ds.length / 1000000.0),
            books(m).find(_._1 == c).get._2.sum)
        }
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("q191_pq_codebook")(spark, sfSmoke)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).toSeq
    assert(got == want)
    // every vector is encoded exactly once per subspace
    (0 until M).foreach { m =>
      assert(got.filter(_._1 == m).map(_._3).sum == vs.length.toLong)
    }
  }

  test("q192: ADC top-k matches a from-scratch table-lookup replay") {
    val vs = vecs()
    val books = replayBooks(vs)
    val qv = vs.find(_._1 == 0L).get._2
    val adcTable = (0 until M).map { m =>
      val qs = qv.slice(m * S, (m + 1) * S)
      books(m).map { case (c, cv) => c -> sq(qs, cv) }.toMap
    }
    val want = vs.filter(_._1 != 0L).map { case (id, v) =>
      val codes = (0 until M).map { m =>
        val sv = v.slice(m * S, (m + 1) * S)
        books(m).map { case (c, cv) => (sq(sv, cv), c) }.min._2
      }
      (id, codes.mkString(","),
        codes.zipWithIndex.map { case (c, m) => adcTable(m)(c) }.sum,
        sq(v, qv))
    }.sortBy(t => (t._3, t._1)).take(10)
    val got = SparkEntry.queries("q192_pq_adc_topk")(spark, sfSmoke)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    // ADC is a lower-variance surrogate, not exact: distances are
    // non-negative, and the quantization never reports a zero distance
    // for a vector whose exact distance is large (sanity bound: adc <=
    // exact + M * max per-subspace cell radius is data-dependent, so
    // assert the weaker ordering sanity instead)
    got.foreach { case (_, _, adc, exact) =>
      assert(adc >= 0L && exact >= 0L)
    }
  }

  test("q193: multi-k levels agree with q117 at uncapped fixture scale") {
    val got = SparkEntry.queries("q193_multik_span")(spark, sfSmoke)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    // q117 = the k=8 kernel at minSpan 12; its >=36 pairs are exactly
    // q193's k=8 level (same shingles, same caps, same islands)
    val q117 = SparkEntry.queries("q117_span_dedup")(spark, sfSmoke)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .filter(_._2 >= 36L).toMap
    assert(got.keySet == q117.keySet)
    got.foreach { case (pair, (k8, k16, k32, best, gain)) =>
      assert(k8 == q117(pair))
      // no bucket caps at fixture scale -> every level sees every span
      // >= 36, so the levels agree and escalation buys nothing (the
      // column prices CAP loss, which needs corpus-scale shingle mass)
      assert(k16 == k8 && k32 == k8 && best == k8 && gain == 0L, pair)
      assert(k8 >= 36L)
    }
    assert(got.nonEmpty)
  }
}
