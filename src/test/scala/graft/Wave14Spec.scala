package graft

import org.apache.spark.sql.functions._

/** Value invariants for the round-8 wave-14 operators (q152-q154):
  * each is recomputed brute-force on the driver from the same fixture
  * and compared field-for-field. */
class Wave14Spec extends SparkSpec {
  import spark.implicits._

  private def run(key: String) = SparkEntry.queries(key)(spark, sfSmoke)

  test("q152: k-anonymity metrics match a brute-force class census") {
    val classes = spark.read.parquet(s"$sfSmoke/customer.parquet")
      .select(col("c_mktsegment"), col("c_nationkey"),
        floor(col("c_acctbal") / 1000d).cast("bigint").as("kb"))
      .as[(String, Int, Long)].collect()
      .groupBy(identity).map(_._2.length.toLong).toSeq
    val r = run("q152_k_anonymity").collect().head
    assert(r.getLong(0) == classes.sum, "n_rows")
    assert(r.getLong(1) == classes.size, "n_classes")
    assert(r.getLong(2) == classes.min, "min_k")
    Seq(2, 5, 10).zipWithIndex.foreach { case (t, i) =>
      val below = classes.filter(_ < t)
      assert(r.getLong(3 + 3 * i) == below.size, s"classes_lt_$t")
      assert(r.getLong(4 + 3 * i) == below.sum, s"rows_lt_$t")
      val frac = BigDecimal(below.sum.toDouble / classes.sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(5 + 3 * i) == frac, s"frac_lt_$t")
    }
    // the audit must be non-degenerate on the fixture: singleton classes
    // exist (uniques at risk) but not every class is a singleton
    assert(r.getLong(3) > 0 && r.getLong(3) < classes.size)
  }

  test("q153: capped counts and sums match a sequential per-user replay") {
    val cap = graft.operators.Wave14Queries.ContributionCap
    val events = graft.sources.Tables.events(spark, sfSmoke)
      .select(col("event_id"), unix_micros(col("ts")),
        col("user_id"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)].collect()
    val kept = events.groupBy(_._3).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._2, e._1)).take(cap)
    }
    def sums(es: Seq[(Long, Long, Long, String, Double)]) =
      es.groupBy(_._4).map { case (t, rs) =>
        t -> (rs.size.toLong,
          rs.map(e => BigDecimal(e._5).setScale(2, BigDecimal.RoundingMode.HALF_UP))
            .sum.toDouble)
      }
    val rawBy = sums(events.toSeq)
    val capBy = sums(kept)
    val got = run("q153_contribution_cap").collect()
    assert(got.map(_.getString(0)).toSeq == got.map(_.getString(0)).toSeq.sorted)
    got.foreach { r =>
      val t = r.getString(0)
      assert(r.getLong(1) == rawBy(t)._1, s"n_raw($t)")
      assert(r.getDouble(4) == rawBy(t)._2, s"sum_raw($t)")
      capBy.get(t) match {
        case Some((n, sm)) =>
          assert(r.getLong(2) == n, s"n_capped($t)")
          assert(r.getDouble(5) == sm, s"sum_capped($t)")
        case None =>
          assert(r.getLong(2) == 0L, s"n_capped($t)")
          assert(r.isNullAt(5), s"sum_capped($t) must be NULL")
      }
      val frac = BigDecimal(
          capBy.get(t).map(_._1).getOrElse(0L).toDouble / rawBy(t)._1)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) == frac, s"kept_frac($t)")
    }
    assert(got.map(_.getString(0)).toSet == rawBy.keySet)
    // the cap must bind on the fixture or the audit proves nothing
    assert(kept.size < events.length)
  }

  test("q154: padding wastes match brute force; bucketing beats global") {
    val lens = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(size(split(col("text"), " ")).cast("bigint"))
      .as[Long].collect().toSeq
    val byBucket = lens.groupBy(l => java.lang.Long.toBinaryString(l).length)
    val wasteB = byBucket.values.map(ls => ls.max * ls.size - ls.sum).sum
    val wasteG = lens.max * lens.size - lens.sum
    val r = run("q154_padding_waste").collect().head
    assert(r.getLong(0) == lens.size, "n_docs")
    assert(r.getLong(1) == lens.sum, "total_tokens")
    assert(r.getLong(2) == byBucket.size, "n_buckets")
    assert(r.getLong(3) == lens.max, "max_len")
    assert(r.getLong(4) == wasteG, "waste_global")
    assert(r.getLong(5) == wasteB, "waste_bucketed")
    assert(r.getDouble(6) == BigDecimal(1.0 - wasteB.toDouble / wasteG)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, "savings_frac")
    // the structural guarantees the operator exists to demonstrate:
    // bucketing never loses, and pow-2 buckets waste <1 token per token
    assert(wasteB <= wasteG)
    assert(wasteB < lens.sum, "pow-2 bucket waste must stay below 100% of payload")
    assert(wasteB < wasteG, "fixture lengths must be diverse enough to show savings")
  }

  test("q154: degenerate equal-length corpus yields zero waste and NULL savings") {
    val dir = java.nio.file.Files.createTempDirectory("w14_pad").toString
    spark.createDataset(Seq.fill(7)("a b c")).toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("bigint"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q154_padding_waste")(spark, dir).collect().head
    assert(r.getLong(4) == 0L && r.getLong(5) == 0L)
    assert(r.isNullAt(6), "savings_frac must be NULL when there is no waste")
  }
}
