package graft

import org.apache.spark.sql.functions._

/** Value invariants for the round-7 wave-9 operators (q133-q136):
  * driver-side brute-force recomputations plus each operator's analytic
  * contract (PSI batch/stream agreement, sketch-vs-exact bounds,
  * Heaps-curve conservation, Pearson bounds).
  */
class Wave9Spec extends SparkSpec {
  import spark.implicits._

  private def run(key: String) = SparkEntry.queries(key)(spark, sfSmoke)

  test("q133: PSI matches a driver-side recompute on the same halves") {
    val ev = graft.sources.Tables.events(spark, sfSmoke)
      .select((col("ts") >= lit("2024-01-16").cast("timestamp")).as("late"),
        col("value"))
      .as[(Boolean, Double)].collect()
    def hist(xs: Seq[Double]): (Long, Seq[Long]) = {
      val c = Array.fill(8)(0L)
      xs.foreach(v => c(math.min(7, math.max(0, (v / 64.0).toInt))) += 1)
      (xs.length.toLong, c.toSeq)
    }
    val (nRef, ref) = hist(ev.filter(!_._1).map(_._2).toSeq)
    val (nCur, cur) = hist(ev.filter(_._1).map(_._2).toSeq)
    val psi = (0 until 8).map { i =>
      val p = (cur(i) + 0.5) / (nCur + 4.0)
      val r = (ref(i) + 0.5) / (nRef + 4.0)
      (p - r) * math.log(p / r)
    }.sum
    val row = run("q133_drift_psi").collect().head
    assert(row.getLong(0) == nRef && row.getLong(1) == nCur)
    val want = BigDecimal(psi).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(math.abs(row.getDouble(2) - want.toDouble) < 1e-9)
  }

  test("q133 batch agrees with the s19 streaming scorer on the same window") {
    // feed ONE hour of the late half through driftMonitor with the early
    // half's distribution as ref: PSI formula identity means batch and
    // stream must produce the same alarm logic; here we just pin the
    // shared constants (bucket count/width) so the twins cannot drift
    assert(graft.streaming.StreamOps.DriftBuckets == 8)
    assert(graft.streaming.StreamOps.DriftBucketWidth == 64.0)
  }

  test("q134: exact Jaccard is right and the sketch stays in its error envelope") {
    val occ = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .distinct().as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = run("q134_source_overlap").collect()
    val srcs = occ.keys.toSeq.sorted
    assert(rows.length == srcs.combinations(2).size)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (sa, sb) = (occ(a), occ(b))
      val inter = (sa & sb).size.toLong
      assert(r.getLong(2) == sa.size && r.getLong(3) == sb.size)
      assert(r.getLong(4) == inter, s"($a,$b) exact intersection")
      val wantJ = BigDecimal(inter.toDouble / (sa.size + sb.size - inter))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(5) - wantJ) < 1e-9)
      // smoke-scale vocabularies exceed k=256, so the estimate is a real
      // estimate; it must still land within a loose KMV error envelope
      assert(math.abs(r.getDouble(6) - r.getDouble(5)) < 0.15,
        s"($a,$b) sketch ${r.getDouble(6)} vs exact ${r.getDouble(5)}")
    }
  }

  test("q135: decile curve conserves types and occurrences") {
    val occ = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .as[(Long, String)].collect()
    val rows = run("q135_vocab_growth").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._2).sum == occ.length, "occurrence conservation")
    assert(rows.last._4 == occ.map(_._2).distinct.length,
      "cumulative types must end at |vocab|")
    assert(rows.map(_._3).sum == rows.last._4, "new_types sums to cum tail")
    // Heaps: growth decelerates — the first decile mints more types than
    // the last (any natural corpus; guards accidental column swaps)
    assert(rows.head._3 > rows.last._3)
    // cum is the running sum of new
    rows.foldLeft(0L) { case (acc, (_, _, nt, cum)) =>
      assert(acc + nt == cum); cum
    }
  }

  test("q136: Pearson matches driver-side exact moments and sits in [-1,1]") {
    val xs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("n_chars"), size(split(col("text"), " ")).cast("long"))
      .as[(Long, Long)].collect()
    val n = BigInt(xs.length)
    def S(f: ((Long, Long)) => BigInt) = xs.map(f).sum
    val (sx, sy) = (S(t => BigInt(t._1)), S(t => BigInt(t._2)))
    val sxy = S(t => BigInt(t._1) * t._2)
    val (sxx, syy) = (S(t => BigInt(t._1) * t._1), S(t => BigInt(t._2) * t._2))
    val cov = (sxy * n - sx * sy).toDouble
    val r = cov / (math.sqrt((sxx * n - sx * sx).toDouble)
      * math.sqrt((syy * n - sy * sy).toDouble))
    val row = run("q136_feature_corr").collect().head
    assert(row.getLong(0) == xs.length)
    val want = BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(row.getDouble(1) - want) < 1e-9)
    assert(row.getDouble(1) >= -1.0 && row.getDouble(1) <= 1.0)
    // chars-per-token slope must be positive and sane (tokens are
    // space-separated substrings of the chars)
    assert(row.getDouble(2) > 0.0)
  }
}
