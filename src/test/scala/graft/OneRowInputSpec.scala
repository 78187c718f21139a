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
}
