package graft

/** q222 (pass@k) replayed from scratch in plain driver Scala — exact
  * BigInt binomials C(n−c,k)/C(n,k) instead of the sheet's unrolled
  * integer products, so the replay checks the ALGEBRA (the unroll and
  * the ppm truncation), not just the arithmetic. */
class Wave44Spec extends SparkSpec {

  private def choose(n: Long, k: Long): BigInt =
    if (k < 0 || k > n) BigInt(0)
    else (0L until k).map(i => BigInt(n - i)).product /
      (1L to k).map(BigInt(_)).product

  test("q222 equals an exact-binomial driver replay") {
    val ev = graft.sources.Tables.events(spark, sfSmoke)
      .select("user_id", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val tasks = ev.groupBy(_._1).toSeq.map { case (_, rows) =>
      val first = rows.sortBy(_._2).take(16)
      (first.length.toLong, first.count(_._3 == "purchase").toLong)
    }
    val want = Seq(1, 2, 4, 8).map { k =>
      val el = tasks.filter(_._1 >= k)
      val ppm = el.map { case (n, c) =>
        // same double truncation as the sheet: (10^6·num) div den
        val num = (0 until k).map(i => BigInt(math.max(n - c - i, 0L))).product
        val den = (0 until k).map(i => BigInt(n - i)).product
        val p = 1000000L - ((BigInt(1000000) * num) / den).toLong
        // cross-check the unroll against the binomial identity
        assert(BigInt(1000000) * num / den ==
          BigInt(1000000) * choose(n - c, k) / choose(n, k))
        p
      }
      (k.toLong, el.size.toLong, ppm.sum / el.size,
        ppm.count(_ == 1000000L).toLong, ppm.count(_ == 0L).toLong)
    }
    val got = SparkEntry.queries("q222_passk")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
  }
}
