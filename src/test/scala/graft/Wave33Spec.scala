package graft

import org.apache.spark.sql.functions._

/** Value invariants for the round-13 wave-33 operator (q211): a
  * from-scratch coarse-assignment occupancy replay in plain driver
  * Scala with the same exact integer arithmetic as Wave29's index. */
class Wave33Spec extends SparkSpec {

  private def sq(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("q211: occupancy sheet matches a from-scratch coarse replay") {
    val vs = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toIndexedSeq))
      .toSeq
    val bc = graft.util.Geometry.adaptiveCodebook(vs.length.toLong, 16,
      graft.operators.Wave29Queries.IvfCap)
    val cents = vs.filter(_._1 < bc).sortBy(_._1)
    val occOf = vs.groupBy { case (_, qv) =>
      cents.minBy { case (c, cv) => (sq(qv, cv), c) }._1
    }.map { case (cid, rows) => cid -> rows.size.toLong }
    val occs = cents.map { case (cid, _) => occOf.getOrElse(cid, 0L) }
      .sorted
    val idx = (99 * bc + 99) / 100
    val nVecs = vs.length.toLong
    val maxOcc = occs.max
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = (bc.toLong, nVecs, occs.count(_ == 0L).toLong, maxOcc,
      occs(idx - 1),
      r6(nVecs.toDouble / bc),
      r4(maxOcc.toDouble / (nVecs.toDouble / bc)))
    val got = SparkEntry.queries("q211_ivf_occupancy")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))).head
    assert(got == want)
    // the sheet prices a real imbalance: first-Bc seeding on the random
    // fixture never lands uniform, so the max-load factor must exceed 1
    // (otherwise the audit discriminates nothing)
    assert(got._7 > 1.0, s"max_load_factor ${got._7} not > 1")
    assert(got._5 <= got._4 && got._2 == nVecs && got._1 == bc.toLong)
  }
}
