package graft

import org.apache.spark.sql.functions._

/** Value invariants for the round-8 wave-13 operators (q149-q151):
  * containment against brute-force set arithmetic, the HRW optimal-
  * movement property, and the watermark-planner lateness counts against
  * a sequential replay of the arrival order. */
class Wave13Spec extends SparkSpec {
  import spark.implicits._

  private def run(key: String) = SparkEntry.queries(key)(spark, sfSmoke)

  test("q149: containment matches brute-force shingle-set arithmetic") {
    // brute-force: per-doc distinct 5-shingle sets (post stop-cap), all
    // co-shingle pairs, containment = |A∩B| / min|A|,|B|
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val shingles = docs.map { case (id, text) =>
      // split(" ", -1) keeps trailing empties — Spark's split semantics
      val t = text.split(" ", -1)
      id -> t.sliding(5).filter(_.length == 5).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty).toMap
    // stop-shingle cap (1000) can't bind at sfSmoke doc counts; verify
    val byShingle = shingles.toSeq.flatMap { case (id, ss) => ss.map(_ -> id) }
      .groupBy(_._1)
    assert(byShingle.values.map(_.size).max <= 1000)
    val want = (for {
      (d1, s1) <- shingles; (d2, s2) <- shingles if d1 < d2
      common = (s1 & s2).size if common > 0
      cont = common.toDouble / math.min(s1.size, s2.size) if cont >= 0.5
    } yield (d1, d2,
        BigDecimal(cont).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        if (s1.size <= s2.size) d1 else d2)).toSet
    val got = run("q149_containment_dedup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(4))).toSet
    assert(got == want, s"got ${got.size} want ${want.size}")
    assert(got.nonEmpty)
  }

  test("q150: HRW movement is exactly the new-shard wins; mod movement is 2/3-ish") {
    val r = run("q150_shard_rebalance").collect().head
    val nKeys = r.getLong(0)
    val hrwMoved = r.getLong(1)
    val modMoved = r.getLong(4)
    // HRW optimality: a key moves IFF one of the 4 added shards wins its
    // argmax — recompute that set directly from the same hash definition
    val keys = spark.read.parquet(s"$sfSmoke/orders.parquet")
      .select(col("o_orderkey").as("k"))
    val winners = keys.withColumn("hs", transform(
        sequence(lit(0), lit(11)),
        sh => graft.functions.TextOps.shingleHash60(concat_ws(":", col("k"), sh))))
      .withColumn("new_shard", array_position(col("hs"), array_max(col("hs"))) - 1)
    val newWins = winners.filter(col("new_shard") >= 8).count()
    assert(hrwMoved == newWins,
      s"HRW moved $hrwMoved but new-shard wins $newWins — optimality broken")
    // mod remap: k%8 == k%12 iff k%24 < 8 — exact recount
    val modWant = keys.filter(pmod(col("k"), lit(8)) =!= pmod(col("k"), lit(12)))
      .count()
    assert(modMoved == modWant)
    assert(nKeys == keys.count())
    // md5 uniformity at fixture size keeps HRW near its 1/3 optimum and
    // mod near 2/3 — wide tolerances, this is a sanity band not a law
    assert(hrwMoved.toDouble / nKeys > 0.2 && hrwMoved.toDouble / nKeys < 0.45)
    assert(modMoved.toDouble / nKeys > 0.55)
  }

  test("HrwPack kernel equals the array-of-hashes expression tree per key") {
    graft.functions.HrwPack.register(spark, 8, 12)
    val keys = spark.read.parquet(s"$sfSmoke/orders.parquet")
      .select(col("o_orderkey").as("k"))
    val both = keys
      .withColumn("hs", transform(sequence(lit(0), lit(11)),
        sh => graft.functions.TextOps.shingleHash60(concat_ws(":", col("k"), sh))))
      .withColumn("old_t", array_position(slice(col("hs"), 1, 8),
        array_max(slice(col("hs"), 1, 8))) - 1)
      .withColumn("new_t", array_position(col("hs"), array_max(col("hs"))) - 1)
      .withColumn("packed", graft.functions.HrwPack(col("k")))
    val bad = both.filter(col("packed") =!= col("old_t") * 100 + col("new_t"))
      .count()
    assert(bad == 0, s"$bad keys disagree with the expression-tree replay")
    // interpreted eval path agrees with the codegen path
    val sample = both.select(col("k"), col("packed")).as[(Long, Long)].head(50)
    sample.foreach { case (k, p) =>
      assert(graft.functions.HrwPack.compute(k, 8, 12) == p, s"key $k")
    }
  }

  test("q151: lateness counts match a sequential replay of arrival order") {
    val rows = graft.sources.Tables.events(spark, sfSmoke)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        (unix_micros(col("ts")) + pmod(
          graft.functions.TextOps.shingleHash60(col("event_id").cast("string")),
          lit(600L)) * 1000000L).as("arr_us"))
      .as[(Long, Long, Long)].collect()
      .sortBy { case (id, _, arr) => (arr, id) }
    var runMax = Long.MinValue
    val late = scala.collection.mutable.Map(60 -> 0L, 300 -> 0L, 600 -> 0L)
    rows.foreach { case (_, ts, _) =>
      runMax = math.max(runMax, ts)
      late.keys.foreach { w =>
        if (ts < runMax - w * 1000000L) late(w) += 1
      }
    }
    val r = run("q151_watermark_planner").collect().head
    assert(r.getLong(0) == rows.length)
    assert(r.getLong(1) == late(60), "late_60s")
    assert(r.getLong(3) == late(300), "late_300s")
    assert(r.getLong(5) == late(600), "late_600s")
    // watermark monotonicity: a longer allowance never drops more
    assert(late(600) <= late(300) && late(300) <= late(60))
    assert(late(60) > 0, "the 0-599s synthetic skew must produce lateness at W=60s")
  }

  test("runningMax equals the single-window prefix max on a shuffled-free input") {
    val df = spark.range(0, 5000).toDF("i")
      .withColumn("g", (col("i") % 3).cast("int"))
      .withColumn("v", (col("i") * 2654435761L) % 10007)
    val want = df.withColumn("m", max(col("v")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
          .orderBy(col("i"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(col("i"), col("m")).as[(Long, Long)].collect().toMap
    val got = graft.operators.Ranks
      .runningMax(df, "g", Seq(col("i")), col("v"), "m")
      .select(col("i"), col("m")).as[(Long, Long)].collect().toMap
    assert(got == want)
  }
}
