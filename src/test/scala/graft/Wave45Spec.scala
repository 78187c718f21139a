package graft

import java.security.MessageDigest

/** q223 (prefix-cache sharing) replayed from scratch in plain driver
  * Scala — same whitespace tokens, same md5 prefix buckets — plus the
  * structural invariants: saved_tokens = (docs − prefixes)·P per
  * level, and sharing can only shrink as P grows on a fixed eligible
  * set (a longer prefix refines the bucketing). */
class Wave45Spec extends SparkSpec {

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q223 equals a from-scratch driver replay of the prefix buckets") {
    val texts = graft.sources.Tables.documents(spark, sfSmoke)
      .select("text").collect().map(_.getString(0))
    val want = Seq(4L, 8L, 16L, 32L).map { p =>
      val el = texts.map(_.split(" ", -1)).filter(_.length >= p)
        .map(t => md5Hex(t.take(p.toInt).mkString(" ")))
      val buckets = el.groupBy(identity).map(_._2.length.toLong).toSeq
      val saved = buckets.map(c => (c - 1) * p).sum
      (p, el.length.toLong, buckets.size.toLong, saved,
        if (el.nonEmpty) saved * 1000000L / (el.length * p) else 0L,
        if (buckets.nonEmpty) buckets.max else 0L)
    }.filter(_._2 > 0)
    val got = SparkEntry.queries("q223_prefix_cache")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // saved_tokens ≡ (docs − prefixes)·P — each bucket saves all but one
    got.foreach { case (p, docs, prefixes, saved, _, _) =>
      assert(saved == (docs - prefixes) * p)
    }
  }
}
