package graft

import org.apache.spark.sql.functions._

/** Value invariants for the round-13 wave-35 operator (q213): a
  * from-scratch coarse-Lloyd-round replay in plain driver Scala with
  * the same exact integer arithmetic as the engine (truncating `/` on
  * Long = Spark `div` = DuckDB `//` for the non-negative sums here;
  * centroid means may be negative, and Scala's `/` truncates toward
  * zero exactly like both engines). */
class Wave35Spec extends SparkSpec {

  private def sq(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("q213: retrain sheet matches a from-scratch Lloyd replay") {
    val vs = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toIndexedSeq))
      .toSeq
    val bc = graft.util.Geometry.adaptiveCodebook(vs.length.toLong, 16,
      graft.operators.Wave29Queries.IvfCap)
    val cents0 = vs.filter(_._1 < bc).map { case (id, qv) => id -> qv }.toMap
    def assign(cents: Map[Long, IndexedSeq[Long]])
        : Seq[(Long, Long, Long)] =
      vs.map { case (id, qv) =>
        val (cid, d) = cents.toSeq
          .map { case (c, cv) => (c, sq(qv, cv)) }
          .minBy { case (c, d) => (d, c) }
        (id, cid, d)
      }
    val a0 = assign(cents0)
    // one Lloyd update: elementwise integer mean (truncating division),
    // emptied cells drop out
    val byId = vs.toMap
    val cents1 = a0.groupBy(_._2).map { case (cid, rows) =>
      val vecs = rows.map(r => byId(r._1))
      cid -> IndexedSeq.tabulate(vecs.head.length)(i =>
        vecs.map(_(i)).sum / vecs.length)
    }
    val a1 = assign(cents1)
    val err0 = a0.map(_._3).sum
    val err1 = a1.map(_._3).sum
    val drop = math.max(err0 - err1, 0L)
    val ppm =
      if (err0 > 0) (drop * 1000 / err0) * 1000 + drop * 1000 % err0 * 1000 / err0
      else 0L
    def occ(a: Seq[(Long, Long, Long)]) = a.groupBy(_._2).map(_._2.size)
    val want = (vs.length.toLong, bc.toLong, err0, err1, ppm,
      bc.toLong - occ(a0).size, occ(a0).size.toLong - occ(a1).size,
      occ(a0).max.toLong, occ(a1).max.toLong)
    val got = SparkEntry.queries("q213_ivf_retrain")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8))).head
    assert(got == want)
    // the retrain round must actually buy something on the random
    // fixture (otherwise the sheet discriminates nothing) and can never
    // report more than a full drop
    assert(got._5 > 0 && got._5 <= 1000000L, s"err_drop_ppm ${got._5}")
    assert(got._4 <= got._3, "one Lloyd round should not raise the error")
  }
}
