package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Streaming drain bench for the stateful streams' SCALING slope rows
  * (r10 verdict task 3 asked for s27 evidence; s28 joins it): stage a
  * scale dir's fixture table as an 8-file parquet source (one file per
  * micro-batch), then time ONLY the drain — source start through
  * processAllAvailable — never the input staging, and stop/teardown
  * outside the window. The measured quantity is total drain time for
  * the whole fixture — the stream analogue of the batch per-query wall
  * clock, dominated by the stateful operator's per-row update cost at
  * every scale (state itself is O(keys), constant in corpus size for
  * both streams).
  *
  * Feed order: s27's absolute-grid decay is order-independent, so its
  * files are plain repartition output; s28's admission contract is
  * scoped to time-ordered ingestion (doc_id non-decreasing across
  * micro-batches), so its files are doc_id VALUE RANGES written in
  * ascending order (ascending mtime = the file source's processing
  * order) — the bench drives the contracted state path, not an
  * out-of-contract shuffle. Temp dirs are deleted per rep.
  *
  * Usage: runMain graft.tools.StreamBench <sfDir> [reps]
  * Prints one JSON line: {"s27": sec, "s28": sec, "sf": dir}
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("graft-stream-bench").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def drain(name: String)(prep: String => Unit)(
        mk: (String, String) => org.apache.spark.sql.streaming.StreamingQuery)
        : Double = {
      val times = (1 to reps).map { i =>
        val dir = java.nio.file.Files
          .createTempDirectory(s"sbench_${name}_$i").toString
        try {
          val in = s"$dir/in"
          prep(in) // staging is NOT timed
          val t0 = System.nanoTime()
          val q = mk(in, s"$dir/out")
          try q.processAllAvailable()
          finally q.stop() // teardown outside the window
          (System.nanoTime() - t0) / 1e9
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(dir))
      }
      times.min
    }

    // move a coalesced single-file write into `dir/name.parquet` so file
    // mtimes (= maxFilesPerTrigger processing order) follow write order.
    // mtime is set EXPLICITLY, strictly increasing: FileStreamSource
    // orders at millisecond granularity, and two files landing in the
    // same millisecond could otherwise process out of doc_id order —
    // outside s28's contracted state path (ADVICE r11).
    val stageClock = new java.util.concurrent.atomic.AtomicLong(1000000000000L)
    def stageFile(df: DataFrame, dir: String, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"stage_$name").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      val dest = java.nio.file.Paths.get(s"$dir/$name.parquet")
      java.nio.file.Files.move(part.toPath, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(
          stageClock.addAndGet(1000L)))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }

    // s27: events as (event_type, ts_us); 8 micro-batches, order-free
    val evs = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val s27 = drain("s27") { in =>
      evs.repartition(8).write.parquet(in)
    } { (in, out) =>
      StreamOps.decayedCountsStream(
        spark.readStream.schema(evs.schema)
          .option("maxFilesPerTrigger", "1").parquet(in)
          .as[StreamOps.DecayEvent], 7)
        .writeStream.format("noop")
        .option("checkpointLocation", s"$out/_ckpt")
        .outputMode("update").start()
    }

    // s28: documents as (doc_id, source, n_tokens); budgets = 40% of
    // each source's token mass (the StreamingSpec fixture rule); files
    // are ascending doc_id ranges (the operator's time-ordered contract)
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val budgets = docs.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1) * 2 / 5).toMap
    val idBounds = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val (idLo, idHi) = (idBounds.getLong(0), idBounds.getLong(1))
    val span = idHi - idLo + 1
    val s28 = drain("s28") { in =>
      (0 until 8).foreach { i =>
        val lo = idLo + span * i / 8
        val hi = if (i == 7) idHi + 1 else idLo + span * (i + 1) / 8
        stageFile(docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
          in, f"f$i")
      }
    } { (in, out) =>
      StreamOps.mixRouterStream(
        spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1").parquet(in)
          .as[StreamOps.MixDoc], budgets)
        .writeStream.format("noop")
        .option("checkpointLocation", s"$out/_ckpt")
        .outputMode("update").start()
    }

    println(f"""{"s27": $s27%.3f, "s28": $s28%.3f, "sf": "$sfDir"}""")
    spark.stop()
  }
}
