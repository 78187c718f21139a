package graft

import org.apache.spark.sql.functions._

/** Value invariants for the round-12 wave-31 operators (q207–q209):
  * shared-kernel consistency for the SimHash threshold curve, a
  * from-scratch replay of the negative-sampling table, and a driver
  * replay of the burstiness census. */
class Wave31Spec extends SparkSpec {

  test("q207: decile histogram is exactly the q32 pair relation, cut-consistent") {
    val got = SparkEntry.queries("q207_simhash_threshold")(spark, sfSmoke)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // cumulative column telescopes
    got.foldLeft(0L) { case (acc, (_, n, cum)) =>
      assert(cum == acc + n); cum
    }
    // the q32 acceptance cut (hamming <= 30) reads off the curve:
    // deciles 0-2 cover hamming 0-29, so cum(2) <= |q32| <= cum(3)
    val q32n = SparkEntry.queries("q32_dedup_simhash")(spark, sfSmoke).count()
    val cum = got.map(x => x._1 -> x._3).toMap
    assert(cum.getOrElse(2, 0L) <= q32n && q32n <= cum.getOrElse(3, cum(2)))
    // the histogram discriminates: pairs on both sides of the cut
    assert(got.exists(_._1 <= 2) && got.exists(_._1 >= 3))
  }

  test("q208: negative-sampling table matches a from-scratch replay and flattens") {
    val toks = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1)).toSeq
    val counts = toks.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val w = counts.map { case (t, c) =>
      t -> (c, BigDecimal(math.sqrt(c * math.sqrt(c.toDouble)) * 1000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }
    val tot = counts.values.sum
    val sw = w.values.map(_._2).sum
    val want = w.toSeq.map { case (t, (c, ww)) => (c, t, ww) }
      .sortBy { case (c, t, _) => (-c, t) }.take(20)
      .map { case (c, t, ww) =>
        (t, c, c * 1000000L / tot, ww, ww * 1000000L / sw) }
    val got = SparkEntry.queries("q208_negative_sampling")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    // ^0.75 flattens the head: the hottest token strictly cedes mass
    // (rows near the corpus mean can tie or flip by one ppm of floor
    // division — the near-uniform fixture vocabulary sits close to it)
    val (_, _, rawTop, _, sampTop) = got.head
    assert(sampTop < rawTop)
  }

  test("q209: burstiness census matches a driver replay on floor-second gaps") {
    val evs = spark.read.parquet(s"$sfSmoke/events.parquet")
      .select(col("user_id"), col("ts").cast("long"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val per = evs.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val secs = xs.sortBy(e => (e._2, e._3)).map(_._2)
      if (secs.length < 2) None
      else {
        val gaps = secs.zip(secs.tail).map { case (a, b) => b - a }
        Some((gaps.length.toLong, gaps.sum, gaps.map(g => g * g).sum))
      }
    }
    def cnt(p: ((Long, Long, Long)) => Boolean) = per.count(p).toLong
    val got = SparkEntry.queries("q209_user_burstiness")(spark, sfSmoke)
      .collect().head
    assert(got.getLong(0) == per.length.toLong)
    assert(got.getLong(1) == cnt { case (_, sg, _) => sg == 0 })
    assert(got.getLong(2) == cnt { case (n, sg, sg2) =>
      sg > 0 && n * sg2 <= 2 * sg * sg })
    assert(got.getLong(3) == cnt { case (n, sg, sg2) =>
      sg > 0 && n * sg2 > 2 * sg * sg && n * sg2 <= 5 * sg * sg })
    assert(got.getLong(4) == cnt { case (n, sg, sg2) =>
      sg > 0 && n * sg2 > 5 * sg * sg })
    val maxCv2 = per.filter(_._2 > 0).map { case (n, sg, sg2) =>
      BigDecimal((n * sg2).toDouble / (sg * sg).toDouble - 1.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }.max
    assert(got.getDouble(5) == maxCv2)
    // bands discriminate on the fixture (both sides populated)
    assert(got.getLong(2) > 0 && got.getLong(3) + got.getLong(4) > 0)
  }
}
