package graft

import org.apache.spark.sql.functions._

/** Value invariants for the round-7 wave-7 operators (q122-q124) and the
  * MisraGries aggregate: adversarial hand-built streams with analytically
  * known answers, plus registry-level cross-checks on the smoke fixture.
  */
class Wave7Spec extends SparkSpec {
  import spark.implicits._

  private def run(key: String) = SparkEntry.queries(key)(spark, sfSmoke)

  // --- MisraGries: the mergeable-summary guarantees -------------------

  test("MisraGries: every key above n/(m+1) survives, under any partitioning") {
    // skewed stream: 'hot' 400, 'warm' 80, 60 cold keys x 5 = 300; n=780.
    // m=7 => bound n/8 = 97.5: 'hot' MUST survive; cold keys (5) must
    // never out-survive it. Repartition shuffles arbitrarily: the
    // candidate SET may vary, the guarantee may not.
    val rows = Seq.fill(400)("hot") ++ Seq.fill(80)("warm") ++
      (0 until 60).flatMap(i => Seq.fill(5)(s"cold$i"))
    for (parts <- Seq(1, 3, 16)) {
      val df = rows.toDF("k").repartition(parts)
      val mg = df.agg(graft.functions.MisraGries(7)(col("k")).as("mg"))
        .select(explode(map_keys(col("mg"))).as("k")).as[String].collect().toSet
      assert(mg.contains("hot"), s"parts=$parts lost a guaranteed heavy key")
      assert(mg.size <= 7, s"parts=$parts summary exceeded capacity")
    }
  }

  test("MisraGries: counts are lower bounds with undercount <= n/(m+1)") {
    val rows = Seq.fill(300)("a") ++ Seq.fill(150)("b") ++
      (0 until 50).flatMap(i => Seq.fill(3)(s"z$i"))
    val n = rows.length
    val m = 9
    val mg = rows.toDF("k").repartition(4)
      .agg(graft.functions.MisraGries(m)(col("k")).as("mg"))
      .select(explode(col("mg")).as(Seq("k", "cnt")))
      .as[(String, Long)].collect().toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    mg.foreach { case (k, c) =>
      assert(c <= exact(k), s"$k over-counted: $c > ${exact(k)}")
      assert(exact(k) - c <= n / (m + 1),
        s"$k undercount ${exact(k) - c} breaks the n/(m+1)=${n / (m + 1)} bound")
    }
  }

  test("q123: output is EXACTLY the brute-force heavy-hitter set") {
    val got = run("q123_heavy_hitters").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val toks = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(explode(split(col("text"), " ")).as("token"))
    val n = toks.count()
    val want = toks.groupBy("token").count()
      .filter(col("count") * 50 > n)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(t => (-t._2, t._1)).toSeq
    assert(got == want)
  }

  // --- q122: symmetric-delete blocking is exact for lev <= 2 ----------

  test("q122: pairs equal the brute-force edit-distance join") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = spark.read.parquet(s"$sfSmoke/part.parquet")
      .select("p_name").distinct().as[String].collect().sorted
    val want = (for {
      i <- names.indices; j <- (i + 1) until names.length
      d = lev(names(i), names(j)) if d <= 2
    } yield (names(i), names(j), d)).toSet
    val got = run("q122_fuzzy_join").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == want)
  }

  test("q122: planted typo cluster is fully recovered") {
    // kitten/sitten (1 sub), kitten/kitte (1 del), kitten/skitten (1 ins),
    // kitten/sittin (2) — banana is beyond distance 2 from all of them
    val parts = Seq("kitten", "sitten", "kitte", "skitten", "sittin",
      "banana").zipWithIndex.map { case (nm, i) => (i.toLong, nm) }
      .toDF("p_partkey", "p_name")
    val dir = java.nio.file.Files.createTempDirectory("w7fuzzy").toString
    parts.write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = SparkEntry.queries("q122_fuzzy_join")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.forall { case (a, b) => a != "banana" && b != "banana" })
    assert(got.contains(("kitten", "sitten")))
    assert(got.contains(("kitte", "kitten")))
    assert(got.contains(("kitten", "skitten")))
    assert(got.contains(("kitten", "sittin")))
  }

  // --- q125: the z-order layout bounds BOTH dimension spans -----------

  test("q125: zorder buckets bound both dims; linear leaves suppkey at full width") {
    val li = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
    val (pm, sm) = (li.agg(max("l_partkey")).head.getLong(0),
      li.agg(max("l_suppkey")).head.getLong(0))
    val rows = run("q125_zorder_layout").collect()
    // with 64 buckets = 3 high Morton bits per dim, a bucket spans < 1/8
    // of each normalized range (+1 normalization-grid cell of slack)
    def cap(mx: Long) = (mx + 1) / 8 + (mx + 1) / 1024 + 1
    val z = rows.filter(_.getString(0) == "zorder")
    assert(z.nonEmpty)
    z.foreach { r =>
      assert(r.getLong(4) - r.getLong(3) <= cap(pm),
        s"zorder bucket ${r.getLong(1)} p-span too wide")
      assert(r.getLong(6) - r.getLong(5) <= cap(sm),
        s"zorder bucket ${r.getLong(1)} s-span too wide")
    }
    // the partkey-linear layout bounds partkey the same way...
    val lin = rows.filter(_.getString(0) == "linear")
    lin.foreach(r => assert(r.getLong(4) - r.getLong(3) <= cap(pm) * 2))
    // ...but cannot bound suppkey: some bucket spans >half the range
    assert(lin.exists(r => r.getLong(6) - r.getLong(5) > (sm + 1) / 2))
    // both layouts partition the table
    val n = li.count()
    assert(z.map(_.getLong(2)).sum == n && lin.map(_.getLong(2)).sum == n)
  }

  // --- q126: BPE training learns the analytically-known merges --------

  private def bpeOn(text: String): Seq[(Int, String, Long)] = {
    val dir = java.nio.file.Files.createTempDirectory("w7bpe").toString
    Seq((1L, text)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("q126_bpe_train")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
  }

  test("q126: merge order and weighted counts match hand-derived BPE") {
    // 'xyz' x3 + 'xyq': pairs x-y:4 y-z:3 y-q:1 -> merge1 (x y, 4);
    // then xy-z:3 beats xy-q:1 -> merge2 (xy z, 3); 'xyz' is now one
    // symbol, leaving xy-q -> merge3 (xy q, 1)
    assert(bpeOn("xyz xyz xyz xyq") ==
      Seq((1, "x y", 4L), (2, "xy z", 3L), (3, "xy q", 1L)))
  }

  test("q126: adjacent-repeat runs merge like textbook BPE, and a fully merged corpus stops early") {
    // 'aaaa' x5: a-a appears 3x per word -> merge1 (a a, 15); the
    // left-to-right rewrite gives 'aa aa' (NOT 'aa a a') -> merge2
    // (aa aa, 5); then every word is a single symbol -> no round 3
    assert(bpeOn("aaaa aaaa aaaa aaaa aaaa") ==
      Seq((1, "a a", 15L), (2, "aa aa", 5L)))
  }

  // --- q124: fractional contamination consistency ---------------------

  test("q124: agrees with q68's binary flag and its own arithmetic") {
    val rows = run("q124_contamination_frac").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ns, shared, frac, sev) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4))
      assert(shared <= ns)
      assert(math.abs(frac - shared.toDouble / ns) < 1e-6)
      val wantSev = if (shared == 0) "clean"
        else if (shared * 10 < ns) "minor" else "major"
      assert(sev == wantSev)
    }
    // cross-query: q68's flagged set == q124's nonzero-overlap set
    val flagged = run("q68_decontaminate").collect().map(_.getLong(0)).toSet
    val nonzero = rows.filter(_.getLong(2) > 0).map(_.getLong(0)).toSet
    assert(flagged == nonzero)
  }
}
