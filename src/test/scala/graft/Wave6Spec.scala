package graft

import org.apache.spark.sql.functions._

/** Value invariants for the round-7 operators (q117-q121): hand-built
  * fixtures with analytically known answers, plus registry-level
  * cross-checks on the smoke fixture — the same facts the DuckDB oracle
  * asserts at sf0.01, provable here without DuckDB.
  */
class Wave6Spec extends SparkSpec {
  import spark.implicits._

  private def run(key: String) = SparkEntry.queries(key)(spark, sfSmoke)

  test("sharedSpans: planted verbatim run is found with exact length") {
    // doc 1 and doc 2 share tokens w10..w29 (a 20-token run); doc 3 is
    // disjoint. 8-shingles, min span 12.
    val shared = (10 until 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 $shared z1 z2"),
      (2L, s"b1 $shared y1 y2 y3 y4"),
      (3L, (0 until 40).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = graft.operators.CorpusOps
      .sharedSpans(docs, "doc_id", "text", n = 8, bucketCap = 64,
        minSpanTokens = 12)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((1L, 2L, 20L, 1L)))
  }

  test("sharedSpans: two disjoint runs come back as two islands") {
    val runA = (0 until 12).map(i => s"a$i").mkString(" ")
    val runB = (0 until 15).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$runA x1 x2 x3 $runB"),
      (2L, s"$runB q1 q2 q3 q4 q5 $runA")
    ).toDF("doc_id", "text")
    val out = graft.operators.CorpusOps
      .sharedSpans(docs, "doc_id", "text", n = 8, bucketCap = 64,
        minSpanTokens = 12)
      .collect()
    assert(out.length == 1)
    val r = out.head
    // longest = the 15-token run, islands = 2 (offsets differ per run)
    assert((r.getLong(2), r.getLong(3)) == ((15L, 2L)))
  }

  test("sharedSpans: identical docs produce one full-length span") {
    val text = (0 until 25).map(i => s"t$i").mkString(" ")
    val docs = Seq((7L, text), (9L, text)).toDF("doc_id", "text")
    val out = graft.operators.CorpusOps
      .sharedSpans(docs, "doc_id", "text", n = 8, bucketCap = 64,
        minSpanTokens = 12).collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 25L && out.head.getLong(3) == 1L)
  }

  test("q118: CI brackets the point estimate and weights are Poisson-like") {
    val rows = run("q118_poisson_bootstrap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mean, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(lo < hi, s"${r.getString(0)}: ci_lo $lo !< ci_hi $hi")
      assert(lo < mean && mean < hi,
        s"${r.getString(0)}: mean $mean outside CI [$lo, $hi]")
      // a ~200-row-per-type smoke fixture: the bootstrap CI must be a
      // real interval, not a degenerate or wildly dispersed one — width
      // well under half the mean (analytically ~3.7·σ/√n ≈ 25% here)
      assert((hi - lo) < 0.5 * mean, s"${r.getString(0)}: CI too wide")
    }
    // n_events sums to the fixture event count
    val n = spark.read.parquet(s"$sfSmoke/events.parquet").count()
    assert(rows.map(_.getLong(1)).sum == n)
  }

  test("q119: SCD2 segments partition each user's history exactly") {
    val out = run("q119_scd2")
    val ev = graft.sources.Tables.events(spark, sfSmoke)
    // event mass is conserved: segment n_events sums to the event count
    assert(out.agg(sum("n_events")).head().getLong(0) == ev.count())
    // exactly one open (is_current) segment per user
    val openPerUser = out.filter(col("is_current"))
      .groupBy("user_id").count().filter(col("count") =!= 1).count()
    assert(openPerUser == 0)
    // segments are contiguous: valid_to equals the next valid_from, and
    // adjacent segments never share an event_type (else not maximal)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("seg_no")
    val bad = out
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_from").isNotNull &&
        (col("valid_to") =!= col("next_from") ||
          col("event_type") === col("next_type")))
      .count()
    assert(bad == 0)
  }

  test("q120: variance matches a local two-pass computation per dim") {
    val out = run("q120_dim_variance").collect()
    assert(out.length == 64)
    val vecs = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.round(x.toDouble * 1000).toDouble / 1000))
    for (d <- Seq(0, 31, 63)) {
      val xs = vecs.map(_(d))
      val mean = xs.sum / xs.length
      val varisc = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
      val r = out(d)
      assert(r.getInt(0) == d + 1)
      assert(math.abs(r.getDouble(2) - mean) < 1e-4, s"dim ${d + 1} mean")
      assert(math.abs(r.getDouble(3) - varisc) < 1e-4, s"dim ${d + 1} var")
    }
  }

  test("q121: holdout takes exactly min(2, user's events) newest events") {
    val rows = run("q121_user_holdout").collect()
    val ev = graft.sources.Tables.events(spark, sfSmoke)
    val nUsers = ev.select("user_id").distinct().count()
    val holdout = rows.filter(_.getString(0) == "holdout")
    // every user contributes exactly 2 holdout events (fixture users all
    // have >= 2), so the holdout mass is 2 * |users|
    assert(holdout.map(_.getLong(2)).sum == 2 * nUsers)
    // split masses partition the table
    assert(rows.map(_.getLong(2)).sum == ev.count())
    // holdout rows really are each user's 2 newest: recompute locally
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val newest = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    holdout.foreach { r =>
      assert(newest(r.getString(1)) == r.getLong(2),
        s"holdout count mismatch for ${r.getString(1)}")
    }
  }
}
