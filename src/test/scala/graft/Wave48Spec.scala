package graft

import java.security.MessageDigest

/** q226 (CDC chunk dedup) replayed from scratch in plain driver Scala —
  * same boundary PRF, same chunk assembly, same per-B rollup — plus the
  * invariants the sheet is FOR: total tokens are B-independent (chunking
  * is a partition of the corpus) and finer chunks (smaller B) find at
  * least as much duplication as the coarsest. */
class Wave48Spec extends SparkSpec {

  private def h60(s: String): Long =
    java.lang.Long.parseLong(MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .substring(0, 15), 16)

  /** Packed double 31-bit polynomial rolling hash of a token-hash run —
    * the Wave48 chunk key, replayed. */
  private def key(run: Seq[Long]): Long = {
    val h1 = run.foldLeft(0L)((a, x) => (a * 131 + (x % 2147483648L)) % 2147483629L)
    val h2 = run.foldLeft(0L)((a, x) => (a * 137 + (x % 2147483648L)) % 2147483647L)
    h1 * 2147483648L + h2
  }

  private def chunksOf(toks: Array[String], b: Int): Seq[(Long, Long)] = {
    val out = Seq.newBuilder[(Long, Long)]
    var cur = List.empty[Long]
    toks.foreach { t =>
      val h = h60(t)
      cur ::= h
      if (h % b == 0) {
        out += ((key(cur.reverse), cur.length.toLong))
        cur = Nil
      }
    }
    if (cur.nonEmpty) out += ((key(cur.reverse), cur.length.toLong))
    out.result()
  }

  test("q226 equals a from-scratch driver replay; curve invariants hold") {
    val texts = graft.sources.Tables.documents(spark, sfSmoke)
      .select("text").collect().map(_.getString(0))
    val want = Seq(4, 8, 16).map { b =>
      // limit -1: keep trailing empty tokens, matching the CdcChunks
      // kernel's documented split semantics (Spark split / DuckDB
      // string_split keep them too; Java's default limit 0 drops them,
      // which would falsely fail the kernel on a space-terminated doc)
      val inst = texts.toSeq.flatMap(t => chunksOf(t.split(" ", -1), b))
      val perChunk = inst.groupBy(_._1).toSeq.map { case (_, xs) =>
        (xs.size.toLong, xs.head._2) }
      val total = perChunk.map(x => x._1 * x._2).sum
      val stored = perChunk.map(_._2).sum
      (b.toLong, perChunk.map(_._1).sum, perChunk.size.toLong, total,
        stored, (total - stored) * 1000000L / total, perChunk.map(_._1).max)
    }
    val got = SparkEntry.queries("q226_cdc_chunks")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want)
    // chunking partitions the corpus: total tokens are B-independent
    assert(got.map(_._4).distinct.size == 1)
    // the curve discriminates: finest chunks find strictly more
    // duplication than the coarsest (the granularity trade is real)
    assert(got.head._6 > got.last._6,
      s"savings curve flat: ${got.map(_._6)}")
  }
}
