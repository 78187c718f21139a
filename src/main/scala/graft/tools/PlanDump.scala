package graft.tools

import org.apache.spark.sql.SparkSession

/** Write each registry query's formatted physical plan to a file —
  * the optimization-round evidence trail (plans/rNN/<key>_before.txt /
  * _after.txt) and a quick exchange/join census without spinning up the
  * UI. The captured plan is the static one (AdaptiveSparkPlan
  * isFinalPlan=false): Exchange placement, join strategy, PushedFilters
  * and ReadSchema are all decided there; AQE runtime rewrites are noted
  * separately in OPTIMIZATION notes where they matter.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> [suffix] [k1,k2,...]
  *   suffix: appended to the file name (default "before")
  *   keys:   comma list; default = every registry query
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r16")
    val suffix = args.lift(2).getOrElse("before")
    val keys = args.lift(3).map(_.split(",").map(_.trim).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val picked = graft.SparkEntry.registry
      .filter(q => keys.forall(_.contains(q.key)))
    picked.foreach { q =>
      try {
        val df = q.run(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${q.key}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        val nEx = plan.split("\n")
          .count(l => l.contains("Exchange") && !l.contains("Reused"))
        println(f"${q.key}%-36s exchanges=$nEx")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] ${q.key} failed: ${e.getMessage}")
      }
      graft.sources.Io.releaseTransient(spark)
    }
    spark.stop()
  }
}
