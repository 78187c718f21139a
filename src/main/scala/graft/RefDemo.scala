package graft

import graft.util.Mt19937_64
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CLI-parity demo of the reference's two programs (parallel_sort.cpp,
  * max_aggregation.cpp) on Spark: same flags (--task sort|max --workers N
  * --size S), same seeded inputs, same printed metrics (map/reduce/total
  * time, Sorted OK, Final max — README.md:50-62 of the reference), same
  * golden outputs (Final max: 2147482196 for seed 999, N=10^6).
  *
  *   sbt "runMain graft.RefDemo --task max --workers 4 --size 1000000"
  *
  * Execution-model mapping: the reference's per-chunk worker loops are
  * Spark map-phase stages; its CAS/semaphore combine and sequential merge
  * reducer are shuffle-backed final aggregation / range-partitioned
  * parallel sort (strictly better than the reference's own sequential
  * reducer — its README.md:170 limitation). Input generation mirrors the
  * reference (in-memory, single seeded stream: mt19937_64 is inherently
  * sequential) and is then parallelized; at real scale data arrives
  * partitioned from storage instead.
  */
object RefDemo {
  def main(args: Array[String]): Unit = {
    var task = "sort"; var workers = 4; var size = -1
    args.sliding(2, 2).foreach {
      case Array("--task", v) => task = v
      case Array("--workers", v) => workers = v.toInt
      case Array("--size", v) => size = v.toInt
      case other => sys.error(s"unknown args: ${other.mkString(" ")}")
    }
    if (size < 0) size = if (task == "sort") 131072 else 1000000
    val seed = if (task == "sort") 12345L else 999L

    val spark = SparkSession.builder()
      .master(s"local[$workers]")
      .config("spark.sql.shuffle.partitions", workers)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val phases = new PhaseTiming
    spark.sparkContext.addSparkListener(phases)

    val data = Mt19937_64.maskedSequence(seed, size)
    val ds = spark.sparkContext.parallelize(data.toIndexedSeq, workers).toDS()

    val t0 = System.nanoTime()
    task match {
      case "max" =>
        val m = ds.agg(max("value")).head().getInt(0)
        println(s"Final max: $m")
      case "sort" =>
        val sorted = ds.orderBy("value")
        val violations = sorted
          .withColumn("prev", lag(col("value"), 1).over(Window.orderBy(col("value"))))
          .agg(count(when(col("prev") > col("value"), 1))).head().getLong(0)
        println(s"Sorted OK: ${if (violations == 0) "yes" else "NO"}")
      case other => sys.error(s"unknown task $other")
    }
    val totalMs = (System.nanoTime() - t0) / 1000000
    Thread.sleep(500) // drain listener bus
    println(s"Phase report: ${phases.report}")
    println(s"Total time: $totalMs ms")
    // reference R14 parity: peak RSS report (parallel_sort.cpp:152)
    println(s"Peak RSS: ${graft.util.PeakRss.kb()} KB")
    spark.stop()
  }
}
