package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Value invariants for the round-8 wave-16 operators (q157-q158): both
  * are replayed on the driver from first principles (a from-scratch md5
  * hash chain, not the engine's helpers) and compared field-for-field. */
class Wave16Spec extends SparkSpec {
  import spark.implicits._

  /** Independent reimplementation of the md5-60 hash (hex prefix → long)
    * so the spec does not trust TextOps with its own verification. */
  private def h60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def docIds() = spark.read.parquet(s"$sfSmoke/documents.parquet")
    .select(col("doc_id")).as[Long].collect().toSeq

  test("q157: kappa matches a from-scratch confusion-matrix replay") {
    val labels = docIds().map { id =>
      val s = h60(s"$id:s") % 100
      ((s + h60(s"$id:a1") % 21 - 10) >= 50, (s + h60(s"$id:a2") % 21 - 10) >= 50)
    }
    val n = labels.size.toLong
    val n11 = labels.count(l => l._1 && l._2).toLong
    val n10 = labels.count(l => l._1 && !l._2).toLong
    val n01 = labels.count(l => !l._1 && l._2).toLong
    val n00 = labels.count(l => !l._1 && !l._2).toLong
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble / n) * ((n11 + n01).toDouble / n) +
      ((n01 + n00).toDouble / n) * ((n10 + n00).toDouble / n)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = SparkEntry.queries("q157_label_agreement")(spark, sfSmoke)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((n, n11, n10, n01, n00)))
    assert(r.getDouble(5) == r6(po), "po")
    assert(r.getDouble(6) == r6(pe), "pe")
    assert(r.getDouble(7) == r6((po - pe) / (1.0 - pe)), "kappa")
    // the synthetic raters must agree far above chance but not perfectly
    assert(r.getDouble(7) > 0.5 && r.getDouble(7) < 1.0, s"kappa=${r.getDouble(7)}")
    assert(n10 + n01 > 0, "boundary noise must produce some disagreement")
  }

  test("q158: reliability table and Brier match a from-scratch replay") {
    val rows = docIds().map { id =>
      val p = h60(s"$id:p") % 1000
      val y = if (h60(s"$id:y") % 1000 < p) 1L else 0L
      (p, y)
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = rows.groupBy(_._1 / 100).toSeq.sortBy(_._1).map { case (b, rs) =>
      val n = rs.size.toLong
      val sp = rs.map(_._1).sum
      val sy = rs.map(_._2).sum
      val sq = rs.map(r => (r._1 - 1000 * r._2) * (r._1 - 1000 * r._2)).sum
      (b.toInt, n, r6(sp / (n * 1000.0)), r6(sy.toDouble / n),
        r6(sp / (n * 1000.0) - sy.toDouble / n), r6(sq / (n * 1000000.0)))
    }
    val got = SparkEntry.queries("q158_score_calibration")(spark, sfSmoke)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.toSeq == want)
    assert(got.length == 10, "all ten confidence deciles must be populated")
    // calibration-by-construction: every decile's observed rate is within
    // a generous finite-sample band of its mean confidence
    got.foreach { case (b, n, mp, or, gap, _) =>
      assert(math.abs(gap) < 0.25, s"bucket $b gap $gap implausibly large")
    }
    // Brier of a calibrated scorer ~ mean p(1-p) — strictly inside (0, 0.25)
    assert(got.forall(_._6 > 0.0) && got.forall(_._6 < 0.3))
  }
}
