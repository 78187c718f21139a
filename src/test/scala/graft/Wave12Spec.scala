package graft

import org.apache.spark.sql.functions._

/** Value invariants for the round-7 wave-12 operators (q142-q144):
  * driver-side recomputation of the CUSUM argmax, the z statistic, and
  * the session trigram counts.
  */
class Wave12Spec extends SparkSpec {
  import spark.implicits._

  private def run(key: String) = SparkEntry.queries(key)(spark, sfSmoke)

  private def events() = graft.sources.Tables.events(spark, sfSmoke)
    .select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"), col("event_type"), col("value"))
    .as[(Long, Long, Long, String, Double)].collect()

  test("q142: CUSUM change point matches a driver-side exact computation") {
    val days = events().map(e => e._3 / 86400000000L)
      .groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    val dd = days.length.toLong
    val nn = days.map(_._2).sum
    var cx = 0L
    val sps = days.zipWithIndex.map { case ((_, x), i) =>
      cx += x; dd * cx - (i + 1) * nn
    }
    val best = sps.zipWithIndex.maxBy { case (sp, i) => (math.abs(sp), -i) }
    val r = run("q142_changepoint").collect().head
    assert(r.getInt(1) == best._2 + 1, "day index")
    assert(r.getLong(3) == nn)
    val wantC = BigDecimal(best._1.toDouble / dd)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getDouble(2) - wantC) < 1e-9)
    assert(r.getDouble(4) >= 0.0, "stat non-negative")
  }

  test("q143: z statistic matches driver-side exact proportions") {
    val conv = events().groupBy(_._1).view.mapValues(rows =>
      if (rows.exists(e => e._4 == "purchase" && e._5 > 470.0)) 1L else 0L)
      .toMap
    val (arm0, arm1) = conv.partition(_._1 % 2 == 0)
    val (n0, c0) = (arm0.size.toLong, arm0.values.sum)
    val (n1, c1) = (arm1.size.toLong, arm1.values.sum)
    val r = run("q143_ab_test").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((n0, c0, n1, c1)))
    val (p0, p1) = (c0.toDouble / n0, c1.toDouble / n1)
    val pp = (c0 + c1).toDouble / (n0 + n1)
    if (pp > 0 && pp < 1) {
      val z = (p0 - p1) / math.sqrt(pp * (1 - pp) * (1.0 / n0 + 1.0 / n1))
      val want = BigDecimal(z).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      assert(math.abs(r.getDouble(6) - want) < 1e-9)
      assert(r.getBoolean(7) == (math.abs(z) > 1.96))
    } else assert(r.isNullAt(6))
  }

  test("q144: trigram counts match a driver-side session walk") {
    val bySess = events().groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      // 30-minute-gap islands
      val sess = scala.collection.mutable.ArrayBuffer.empty[List[String]]
      var cur = List.empty[String]
      var last = Long.MinValue
      sorted.foreach { r =>
        if (last == Long.MinValue || r._3 - last > 30L * 60 * 1000000) {
          if (cur.nonEmpty) sess += cur.reverse
          cur = Nil
        }
        cur = r._4 :: cur; last = r._3
      }
      if (cur.nonEmpty) sess += cur.reverse
      sess
    }
    val want = bySess.flatMap(_.sliding(3).filter(_.length == 3))
      .map(_.mkString(">"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = run("q144_path_ngrams").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // the query returns the top-20 head of exactly this count relation
    val wantTop = want.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    assert(got.toSeq == wantTop)
  }

  test("q145: checksum is partition-invariant and flips on any row change") {
    def fp(df: org.apache.spark.sql.DataFrame) = {
      val r = df
        .select(graft.functions.TextOps.shingleHash60(
          graft.operators.Wave12Queries.lineitemCanon).as("h"))
        .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("_xor"),
          sum(col("h").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
            .as("_sum"))
        .select(col("n_rows"),
          lower(lpad(hex(col("_xor")), 16, "0")),
          lpad(col("_sum").cast("string"), 39, "0"))
        .collect().head
      (r.getLong(0), r.getString(1), r.getString(2))
    }
    val base = graft.sources.Tables.lineitem(spark, sfSmoke)
    val r = SparkEntry.queries("q145_table_checksum")(spark, sfSmoke)
      .collect().head
    val want = (r.getLong(0), r.getString(1), r.getString(2))
    // the fixed-width rendering contract (comparator-proof by shape)
    assert(r.getString(1).matches("[0-9a-f]{16}"), r.getString(1))
    assert(r.getString(2).matches("[0-9]{39}"), r.getString(2))
    // partitioning must not matter (the mergeable-combiner property)
    for (parts <- Seq(1, 7))
      assert(fp(base.repartition(parts)) == want, s"parts=$parts")
    // a one-cent perturbation of one row must flip both fingerprints
    val target = base.orderBy("l_orderkey", "l_linenumber")
      .select("l_orderkey", "l_linenumber").head()
    val tampered = fp(base.withColumn("l_tax",
      when(col("l_orderkey") === target.getLong(0)
        && col("l_linenumber") === target.getInt(1), col("l_tax") + 0.01)
        .otherwise(col("l_tax"))))
    assert(tampered._1 == want._1, "row count unchanged")
    assert(tampered._2 != want._2, "xor fingerprint must flip")
    assert(tampered._3 != want._3, "sum fingerprint must flip")
    // NULL sentinel (Canon): nulling a field must CHANGE the hash, and
    // rows differing only in WHICH field is null must hash differently —
    // the two failure modes of naive concat_ws encoding (ADVICE r7)
    val nullTax = fp(base.withColumn("l_tax",
      when(col("l_orderkey") === target.getLong(0)
        && col("l_linenumber") === target.getInt(1),
        lit(null).cast("double")).otherwise(col("l_tax"))))
    val nullDisc = fp(base.withColumn("l_discount",
      when(col("l_orderkey") === target.getLong(0)
        && col("l_linenumber") === target.getInt(1),
        lit(null).cast("double")).otherwise(col("l_discount"))))
    assert(nullTax._1 == want._1 && nullTax._2 != want._2,
      "null field must flip the checksum, not vanish from it")
    assert(nullTax._2 != nullDisc._2,
      "which-field-is-null must be distinguishable")
  }

  test("q148: diff categories match direct set arithmetic on the key space") {
    val keys = spark.read.parquet(s"$sfSmoke/orders.parquet")
      .select("o_orderkey").as[Long].collect().toSet
    val inA = keys.filter(_ % 13 != 0)
    val inB = keys.filter(_ % 17 != 0)
    val want = Map(
      "added" -> (inB -- inA).size.toLong,
      "deleted" -> (inA -- inB).size.toLong,
      // a key present in both changes iff its price was perturbed in A
      "changed" -> (inA & inB).count(_ % 11 == 0).toLong,
      "unchanged" -> (inA & inB).count(_ % 11 != 0).toLong)
    val got = run("q148_snapshot_diff").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"got $got want $want")
    assert(got.values.sum == (inA ++ inB).size)
  }
}
