package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Value invariants for the round-11 wave-26 operators (q197-q198):
  * from-scratch MMD replay and the semantic-leakage sheet's
  * cross-operator consistency with q41. */
class Wave26Spec extends SparkSpec {

  private def h60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map(b => f"$b%02x").mkString.take(15), 16)
  }
  private def split(id: Long): String =
    if (h60(s"$id:mmd") % 10 < 8) "train" else "val"
  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q197: split MMD matches a from-scratch integer-sum replay") {
    val rows = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toIndexedSeq))
    val bySplit = rows.groupBy(t => split(t._1))
    val (tr, va) = (bySplit("train").map(_._2), bySplit("val").map(_._2))
    val gaps = (0 until 64).map(i =>
      tr.map(_(i)).sum.toDouble / tr.length - va.map(_(i)).sum.toDouble / va.length)
    var mmd = 0.0
    gaps.foreach(g => mmd += g * g)
    val got = SparkEntry.queries("q197_split_mmd")(spark, sfSmoke)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == Seq((tr.length.toLong, va.length.toLong,
      r6(mmd), r6(gaps.map(math.abs).max))))
    // a content-hash split is representative: the mean gap per dim is
    // far under the component scale (means ~0 on ~[-1000,1000] millis)
    assert(got.head._4 < 100.0)
  }

  test("q198: semantic leakage sheet equals q41's pairs typed by split") {
    val pairs = SparkEntry.queries("q41_dedup_embedding")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = pairs.groupBy { case (v1, v2, _) =>
      val (s1, s2) = (split(v1), split(v2))
      if (s1 == s2) s"$s1-$s2" else "cross"
    }.toSeq.sortBy(_._1).map { case (t, ps) =>
      (t, ps.length.toLong, ps.count(_._3 >= 0.9).toLong, ps.map(_._3).max)
    }
    val got = SparkEntry.queries("q198_split_leakage_semantic")(spark, sfSmoke)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
  }
}
