package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Value invariants for the round-13 wave-40 operator (q218): the CMS
  * accuracy sheet replayed from scratch in plain driver Scala — same
  * md5-60 PRF buckets, same adaptive width, same min-over-rows
  * estimate — plus the sketch's structural guarantee (never
  * underestimates) and the discrimination check (real collisions at
  * the fixture's vocab/4 width — CmsOccLog2 = 2). */
class Wave40Spec extends SparkSpec {

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def h60(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).take(15), 16)

  test("q218: CMS sheet matches a from-scratch replay") {
    val counts = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).map { case (t, a) => t -> a.length.toLong }
    val bits = graft.util.Geometry.adaptiveBits(counts.size.toLong, 2, 3, 20)
    val w = 1L << bits
    val cms = scala.collection.mutable.Map.empty[(Int, Long), Long]
    counts.foreach { case (t, c) =>
      (0 until 3).foreach { r =>
        val b = h60(s"$r:$t") % w
        cms((r, b)) = cms.getOrElse((r, b), 0L) + c
      }
    }
    val top = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(10)
    val nTotal = counts.values.sum
    val want = top.map { case (t, c) =>
      val est = (0 until 3).map(r => cms((r, h60(s"$r:$t") % w))).min
      (t, c, est, est - c, w, nTotal)
    }
    val got = SparkEntry.queries("q218_cms_audit")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // structural: CMS never underestimates; discriminating: at the
    // vocab/4 width, at least one top token shares a cell in every row
    assert(got.forall(_._4 >= 0), "CMS underestimated")
    assert(got.map(_._4).sum > 0, "no collisions — sheet discriminates nothing")
  }
}
