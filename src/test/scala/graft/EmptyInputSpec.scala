package graft

/** The empty-corpus lock: every registry query must ANALYZE AND RUN
  * against zero-row tables (schemas cloned from the smoke fixture) —
  * the "empty daily batch" a production pipeline feeds an engine
  * whenever a source has no new data. Round-7 sweep found exactly one
  * offender (q102's empty-seed centroid literal was a NullType array);
  * this spec keeps the count at zero.
  */
class EmptyInputSpec extends SparkSpec {

  test("every registry query tolerates an all-empty fixture") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    graft.sources.Tables.all.foreach { t =>
      graft.sources.Tables(spark, sfSmoke, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = SparkEntry.registry.flatMap { q =>
      try { q.run(spark, dir).count(); None }
      catch { case e: Throwable => Some(s"${q.key}: ${e.getClass.getSimpleName}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
