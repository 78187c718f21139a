package graft

import org.apache.spark.sql.functions._

/** Value invariants for q137 (histogram quantile sketch) and q138
  * (k-core peel): driver-side recomputations plus the analytic error
  * bound the histogram estimator promises.
  */
class Wave10Spec extends SparkSpec {
  import spark.implicits._

  private def run(key: String) = SparkEntry.queries(key)(spark, sfSmoke)

  test("q137: estimates stay within one bucket width of the exact quantile") {
    val rows = run("q137_histogram_quantiles").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == Seq(0.50, 0.90, 0.99))
    rows.foreach { case (p, est, exact, err) =>
      // the histogram interpolation can never miss by more than the
      // bucket width (the estimator's whole contract)
      assert(err <= 2.0, s"p=$p err $err exceeds bucket width")
      assert(math.abs(math.abs(est - exact) - err) < 1e-6 + 1e-9)
      assert(est >= 0.0 && est <= 512.0)
    }
    // exact side against a driver-side (n-1)p interpolation
    val vs = graft.sources.Tables.events(spark, sfSmoke)
      .select("value").as[Double].collect().sorted
    rows.foreach { case (p, _, exact, _) =>
      val pos = (vs.length - 1) * p
      val lo = vs(pos.toInt)
      val hi = vs(math.min(pos.toInt + 1, vs.length - 1))
      val want = BigDecimal(lo + (pos - pos.toInt) * (hi - lo))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(exact - want) < 1e-9, s"p=$p exact $exact want $want")
    }
  }

  test("q138: peel rounds match a driver-side k-core computation") {
    val pairs = run("q31_dedup_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var edges = pairs.toSet
    val want = (1 to 3).map { _ =>
      val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 2).keySet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
      (keep.size.toLong, edges.size.toLong)
    }
    val got = run("q138_kcore").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"got $got want $want")
    // peeling is monotone: survivors never increase
    assert(got.map(_._1).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("q146: curve is reconstructible from the q25/q31 relations") {
    val truth = run("q25_dedup_near").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val cand = run("q31_dedup_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = run("q146_lsh_recall_curve").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    got.foreach { case (t, nTrue, nCaught, nCand) =>
      // thresholds all sit at/above q25's 0.2 emission bar, so the
      // truth counts are exactly q25's rows at that bar
      val want = truth.filter(_._2 >= t)
      assert(nTrue == want.size, s"t=$t n_true")
      assert(nCaught == want.keySet.intersect(cand).size, s"t=$t n_caught")
      assert(nCand == cand.size, s"t=$t n_cand")
      assert(nCaught <= nTrue && nCaught <= nCand)
    }
    // thresholds ascend, true-pair counts can only shrink
    assert(got.map(_._1).toSeq == Seq(0.2, 0.4, 0.6, 0.8))
    assert(got.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("q147: modularity matches a driver-side union-find computation") {
    val edges = run("q31_dedup_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      parent.getOrElseUpdate(x, x)
      while (parent(x) != x) {
        parent(x) = parent.getOrElse(parent(x), parent(x))
        x = parent(x)
      }
      x
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    val deg = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    // note .toSeq: deg.keys is a Set, and Set.map would collapse equal
    // degree values before the sum
    val dc = deg.keys.toSeq.groupBy(find).view
      .mapValues(_.map(deg).sum).toMap
    val m = edges.length.toLong
    val q = (BigInt(4) * m * m - dc.values.map(d => BigInt(d) * d).sum)
      .toDouble / (4.0 * m * m)
    val r = run("q147_modularity").collect().head
    assert(r.getLong(0) == m)
    assert(r.getLong(1) == deg.size)
    assert(r.getLong(2) == dc.size)
    val want = BigDecimal(q).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(3) - want) < 1e-9, s"${r.getDouble(3)} vs $want")
    assert(r.getDouble(3) >= -0.5 && r.getDouble(3) <= 1.0)
  }
}
