package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch sweep: run every registry query against zero-row tables
  * (schemas cloned from a real fixture) and report which ones throw —
  * the "empty daily batch" robustness probe. */
object EmptySweep {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, emptyDir) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // match the engine's load contract BEFORE any read caches a schema
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      spark.read.parquet(s"$srcDir/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$emptyDir/$t.parquet")
    var bad = 0
    graft.SparkEntry.registry.foreach { q =>
      try {
        val n = q.run(spark, emptyDir).count()
        println(s"OK    ${q.key} ($n rows)")
      } catch {
        case e: Throwable =>
          bad += 1
          println(s"THROW ${q.key}: ${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(120)}")
      }
    }
    println(s"== ${graft.SparkEntry.registry.size - bad} ok, $bad throw ==")
  }
}
