package graft

import org.apache.spark.sql.functions._

/** Value invariants for the round-13 wave-39 operator (q217): the
  * dimension-truncation recall sheet replayed from scratch in plain
  * driver Scala — same milli grid, same (dist, nbr) tie-break, same
  * adaptive query sample. */
class Wave39Spec extends SparkSpec {

  private val K = 10

  test("q217: truncation recall matches a from-scratch replay") {
    val vs = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toIndexedSeq))
      .toSeq
    val mod = graft.util.Geometry.adaptiveSampleMod(vs.length.toLong, 50L, 5)
    val qids = vs.filter(_._1 % mod == 0).map(_._1)
    val byId = vs.toMap
    def sqp(a: IndexedSeq[Long], b: IndexedSeq[Long], p: Int): Long =
      (0 until p).map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    def top10(qid: Long, p: Int): Seq[Long] = {
      val qqv = byId(qid)
      vs.filter(_._1 != qid)
        .map { case (id, v) => (sqp(v, qqv, p), id) }
        .sorted.take(K).map(_._2)
    }
    val want = Seq(16, 32).map { p =>
      var (hits, nn1) = (0L, 0L)
      var exact = 0L
      qids.foreach { qid =>
        val f = top10(qid, 64)
        val t = top10(qid, p)
        exact += f.length
        hits += f.count(t.contains)
        if (f.headOption.nonEmpty && f.headOption == t.headOption) nn1 += 1
      }
      (p, qids.length.toLong, exact, hits,
        if (exact > 0) hits * 1000000L / exact else 0L, nn1)
    }
    val got = SparkEntry.queries("q217_dim_truncation")(spark, sfSmoke)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // the sheet discriminates: a longer prefix can only help, and the
    // random fixture's prefixes are lossy but not useless
    val byP = got.map(r => r._1 -> r._5).toMap
    assert(byP(32) >= byP(16), s"recall not monotone in P: $byP")
    assert(byP(16) > 0 && byP(32) < 1000000L, s"degenerate sheet: $byP")
  }
}
