package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-machinery validation under REAL key skew (r6 verdict item 5: the
  * shipped fixtures are uniform, so q64's salted join could only ever tie
  * or lose — the rewrite pays a ×salts dim replication and buys nothing a
  * balanced shuffle didn't already have; this bench builds the workload
  * the machinery exists for and measures it).
  *
  * Fixture: a fact table whose join-key distribution is a skewed mixture
  * — the top key alone holds ~35% of all rows (share_bp 3500, the q96
  * heavy-hitter report's alarm case), two more hold 15%/8%, the rest
  * uniform over |dim| keys — written to parquet so every variant pays the
  * same real scan. The dimension is made broadcast-INELIGIBLE
  * (autoBroadcastJoinThreshold=-1), the documented scenario for manual
  * salting: with a broadcastable dim there is no shuffle to skew.
  *
  * Variants, each median-of-3 on the same fixture:
  *   plain            — sort-merge join, AQE defaults. The hot key lands
  *                      in ONE shuffle partition; with default AQE the
  *                      partition must exceed skewedPartitionThreshold
  *                      (256 MB) AND factor×median to split, so a
  *                      hot-but-under-threshold partition straggles on a
  *                      single task. This is the gap salting fills.
  *   plain_aqe_tuned  — same join with the skew-split knobs lowered
  *                      (threshold 16 MB, factor 2): AQE's own fix when
  *                      an operator KNOWS the workload is skewed.
  *   salted           — Skew.saltedJoin ×16: hot keys pre-spread over 16
  *                      (key, salt) partitions before the shuffle; works
  *                      for any join shape, no stats needed.
  *
  * Prints one JSON line with the three medians; the SCALING.md skew
  * section records the numbers. Usage:
  *   runMain graft.tools.SkewBench [nFact] [outDir]
  */
object SkewBench {
  import DataGen.{h, unit}

  def main(args: Array[String]): Unit = {
    val nFact = args.headOption.map(_.toLong).getOrElse(20000000L)
    val dir = args.lift(1).getOrElse("/tmp/graft_skewbench")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-skewbench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "24g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nKeys = 200000L
    // deterministic skewed mixture: 35% / 15% / 8% / uniform remainder
    def keyOf(id: Long): Long = {
      val u = unit(h(9, id, 0))
      if (u < 0.35) 0L
      else if (u < 0.50) 1L
      else if (u < 0.58) 2L
      else (h(9, id, 1) >>> 1) % nKeys
    }
    val factPath = s"$dir/fact.parquet"
    val dimPath = s"$dir/dim.parquet"
    if (!new java.io.File(factPath).exists()) {
      spark.range(0, nFact, 1, cpus.toInt)
        .map(id => (keyOf(id), ((h(9, id, 2) >>> 1) % 100).toDouble))
        .toDF("k", "qty")
        .write.mode(SaveMode.Overwrite).parquet(factPath)
      spark.range(0, nKeys, 1, 8)
        .map(id => (id, "p" + (id % 7)))
        .toDF("k", "attr")
        .write.mode(SaveMode.Overwrite).parquet(dimPath)
      println(s"[skewbench] wrote fixture nFact=$nFact nKeys=$nKeys")
    }

    def fact: DataFrame = spark.read.parquet(factPath)
    def dim: DataFrame = spark.read.parquet(dimPath).withColumnRenamed("k", "dk")

    def run(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.collect()
      (System.nanoTime() - t0) / 1e9
    }
    def median3(df: => DataFrame): Double =
      Seq.fill(3)(run(df)).sorted.apply(1)

    def agg(joined: DataFrame): DataFrame =
      joined.groupBy(col("attr"))
        .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("attr"))

    // the whole comparison happens in the no-broadcast regime
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    def withConf[T](kv: (String, String)*)(body: => T): T = {
      val old = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
      kv.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally old.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    // warm the scan cache once so variant order doesn't matter
    fact.agg(count(lit(1))).collect()

    val plain = median3(agg(fact.join(dim, col("k") === col("dk"))))
    val tuned = withConf(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16m",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0") {
      median3(agg(fact.join(dim, col("k") === col("dk"))))
    }
    val salted = median3(agg(
      graft.operators.Skew.saltedJoin(fact, dim.withColumnRenamed("dk", "k"), "k", 16)))

    // sanity: all three variants agree (value-identity under skew)
    val a = agg(fact.join(dim, col("k") === col("dk"))).collect().toSeq
    val c = agg(graft.operators.Skew.saltedJoin(
      fact, dim.withColumnRenamed("dk", "k"), "k", 16)).collect().toSeq
    require(a.map(_.toSeq) == c.map(_.toSeq), "salted join diverged from plain join")

    println(s"""{"bench":"skew","n_fact":$nFact,"n_keys":$nKeys,""" +
      s""""top_share":0.35,"plain_sec":$plain,"plain_aqe_tuned_sec":$tuned,""" +
      s""""salted16_sec":$salted}""")
    spark.stop()
  }
}
