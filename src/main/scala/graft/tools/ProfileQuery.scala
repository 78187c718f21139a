package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-stage profile of one registry query: run it warm (same pinned conf
  * as Bench), then once instrumented, and print every stage's wall time,
  * task count, and input/shuffle volumes — the evidence layer between
  * "the query is slow" and "THIS stage is slow" (guide §1.1/§7.1; the UI
  * is disabled in bench runs, so this is the stage page in text form).
  *
  * Usage: runMain graft.tools.ProfileQuery <key> [sfDir] [reps]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_EXTRA_CONF="k=v;k=v" — same A/B contract as Bench
    val extraConf = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    val spark = extraConf.foldLeft(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.codegen.cache.maxEntries", "5000"))(
        (b, kv) => b.config(kv._1, kv._2))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.registry.find(_.key == key).getOrElse(
      sys.error(s"unknown query $key"))
    def force(): Unit =
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
    // warmup passes: JIT + codegen cache + parquet footers
    try force() catch { case e: Throwable => throw e }
    graft.sources.Io.releaseTransient(spark)
    force(); graft.sources.Io.releaseTransient(spark)

    final case class St(name: String, submitted: Long, var completed: Long,
      var tasks: Int, var input: Long, var sread: Long, var swrite: Long,
      var cpuNs: Long)
    val stages = mutable.LinkedHashMap[Int, St]()
    val jobs = mutable.LinkedHashMap[Int, (Long, Long)]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val st = St(si.name.takeWhile(_ != '\n').take(90),
          si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L),
          si.numTasks, si.taskMetrics.inputMetrics.bytesRead,
          si.taskMetrics.shuffleReadMetrics.totalBytesRead,
          si.taskMetrics.shuffleWriteMetrics.bytesWritten,
          si.taskMetrics.executorCpuTime)
        stages(si.stageId) = st
      }
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs(j.jobId) = (j.time, 0L)
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        jobs.get(j.jobId).foreach(t => jobs(j.jobId) = (t._1, j.time))
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    (1 to reps).foreach { _ =>
      force(); graft.sources.Io.releaseTransient(spark)
    }
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // let the listener bus drain
    println(f"== $key: $reps rep(s), wall ${wall}%.3f s ==")
    println(f"${"stage"}%-7s ${"ms"}%7s ${"cpu_ms"}%8s ${"tasks"}%5s " +
      f"${"input"}%10s ${"sh_read"}%10s ${"sh_write"}%10s  name")
    var sumMs = 0L
    stages.toSeq.sortBy(_._1).foreach { case (id, s) =>
      val ms = s.completed - s.submitted
      sumMs += ms
      println(f"$id%-7d $ms%7d ${s.cpuNs / 1000000}%8d ${s.tasks}%5d " +
        f"${s.input}%10d ${s.sread}%10d ${s.swrite}%10d  ${s.name}")
    }
    val jobMs = jobs.values.map { case (a, b) => (b - a) max 0L }.sum
    println(f"stage-ms total: $sumMs, job-ms total: $jobMs, jobs: ${jobs.size}")
    spark.stop()
  }
}
