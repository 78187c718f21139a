package graft

import org.apache.spark.sql.functions._

/** Value invariants for the round-13 wave-42 operator (q220): the
  * scalar-quantization recall sheet replayed from scratch in plain
  * driver Scala — same milli grid, same per-dim (v − mn)·L / rng
  * integer codes, same (dist, nbr) tie-break. */
class Wave42Spec extends SparkSpec {

  private val K = 10

  test("q220: SQ recall matches a from-scratch replay") {
    val vs = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toIndexedSeq))
      .toSeq
    val dim = vs.head._2.length
    val mn = (0 until dim).map(i => vs.map(_._2(i)).min)
    val rg = (0 until dim).map(i =>
      math.max(vs.map(_._2(i)).max - mn(i), 1L))
    val mod = graft.util.Geometry.adaptiveSampleMod(vs.length.toLong, 50L, 5)
    val qids = vs.filter(_._1 % mod == 0).map(_._1)
    def sqv(v: IndexedSeq[Long], lv: Long): IndexedSeq[Long] =
      (0 until dim).map(i => (v(i) - mn(i)) * lv / rg(i))
    def d2(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val byId = vs.toMap
    def top10(qid: Long, enc: IndexedSeq[Long] => IndexedSeq[Long])
        : Seq[Long] = {
      val qe = enc(byId(qid))
      vs.filter(_._1 != qid)
        .map { case (id, v) => (d2(enc(v), qe), id) }
        .sorted.take(K).map(_._2)
    }
    val want = Seq(4, 8).map { b =>
      val lv = (1L << b) - 1L
      var (hits, nn1, exact) = (0L, 0L, 0L)
      qids.foreach { qid =>
        val f = top10(qid, identity)
        val t = top10(qid, sqv(_, lv))
        exact += f.length
        hits += f.count(t.contains)
        if (f.headOption.nonEmpty && f.headOption == t.headOption) nn1 += 1
      }
      (b, qids.length.toLong, exact, hits,
        if (exact > 0) hits * 1000000L / exact else 0L, nn1)
    }
    val got = SparkEntry.queries("q220_sq_recall")(spark, sfSmoke)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // the byte-budget dial discriminates: 8-bit codes rank at least as
    // faithfully as 4-bit, and 4-bit pays a real, visible loss
    val byB = got.map(r => r._1 -> r._5).toMap
    assert(byB(8) >= byB(4), s"recall not monotone in bits: $byB")
    assert(byB(4) < 1000000L && byB(4) > 0, s"SQ4 degenerate: $byB")
  }
}
