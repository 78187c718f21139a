package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_EXTRA_CONF="k=v;k=v" layers ad-hoc session confs (same
    // contract as Bench) — e.g. spark.graft.reliableCheckpoint=true for
    // the whole-registry reliable-checkpoint sweep.
    val extraConf = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        (k, v)
      }
    val spark = extraConf.foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"))(
        (b, kv) => b.config(kv._1, kv._2))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // r17 (carried advice): every unpartitioned window in the registry
    // sits over a bounded (<= k-row) relation — CI-locked by
    // PlanShapeSpec's registry-wide sweep — so WindowExec's blanket
    // "No Partition Defined" WARN is a false alarm here and only buries
    // real warnings in the verify log (same demotion as Bench).
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_VERIFY_ONLY=q66,q67 narrows the dump for local iteration
    // (prefix match); unset = the full driver contract
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSeq)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // drop this query's transient materialization blocks (its write
      // has completed; standing published artifacts are pinned and
      // survive) — without this a full-registry sweep accumulates every
      // query's checkpoint blocks for the whole session
      graft.sources.Io.releaseTransient(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Pin the oracle environment next to the dump (r7 verdict task 9): a
    // cross-version DuckDB dialect drift (the q145 class of failure) must
    // be diagnosable from the round's artifacts alone. Sibling file, NOT
    // a key inside oracle_sql.json — the comparator iterates that file's
    // keys as query names and a foreign key would fabricate a FAIL row.
    val duckdbVersion = try {
      val p = new ProcessBuilder("python3", "-c",
        "import duckdb; print(duckdb.__version__)")
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      if (p.waitFor() == 0 && out.nonEmpty) out else "unavailable"
    } catch { case _: Throwable => "unavailable" }
    Files.writeString(Paths.get(s"$outDir/oracle_env.json"),
      s"""{"duckdb_version": ${q(duckdbVersion)}, "spark_version": ${q(spark.version)}, "verified_at_utc": ${q(java.time.Instant.now().toString)}}""")
    spark.stop()
  }
}
