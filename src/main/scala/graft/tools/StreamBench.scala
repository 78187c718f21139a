package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Streaming drain bench for the stateful streams' SCALING slope rows
  * (r10 verdict task 3 asked for s27 evidence; s28 joins it): feed a
  * scale dir's fixture table through the stream as a one-file parquet
  * source split into micro-batches, drain it, and print wall seconds.
  * The measured quantity is total drain time for the whole fixture —
  * the stream analogue of the batch per-query wall clock, dominated by
  * the stateful operator's per-row update cost at every scale (state
  * itself is O(keys), constant in corpus size for both streams).
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

    def drain(name: String)(mk: (String, String) => org.apache.spark.sql
        .streaming.StreamingQuery): Double = {
      val times = (1 to reps).map { i =>
        val dir = java.nio.file.Files
          .createTempDirectory(s"sbench_${name}_$i").toString
        val t0 = System.nanoTime()
        val q = mk(dir, s"$dir/out")
        try q.processAllAvailable() finally q.stop()
        (System.nanoTime() - t0) / 1e9
      }
      times.min
    }

    // s27: events as (event_type, ts_us); 8 micro-batches via file splits
    val evs = graft.sources.Tables.events(spark, sfDir)
      .select(col("event_type"), unix_micros(col("ts")).as("ts_us"))
    val s27 = drain("s27") { (dir, out) =>
      val in = s"$dir/in"
      evs.repartition(8).write.parquet(in)
      StreamOps.decayedCountsStream(
        spark.readStream.schema(evs.schema)
          .option("maxFilesPerTrigger", "1").parquet(in)
          .as[StreamOps.DecayEvent], 7)
        .writeStream.format("noop")
        .option("checkpointLocation", s"$out/_ckpt")
        .outputMode("update").start()
    }

    // s28: documents as (doc_id, source, n_tokens); budgets = 40% of
    // each source's token mass (the StreamingSpec fixture rule)
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val budgets = docs.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1) * 2 / 5).toMap
    val s28 = drain("s28") { (dir, out) =>
      val in = s"$dir/in"
      docs.repartition(8).write.parquet(in)
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
