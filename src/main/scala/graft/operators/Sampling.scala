package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling / dataset-curation utilities for the training-data pipeline:
  * deterministic per-stratum quotas, seeded random samples and splits.
  *
  * Scale notes: quotaPerGroup is a window rank filter — shuffle on the
  * stratum key only, and Spark's WindowGroupLimit pushes the rank-k
  * cutoff into the partial stage so only ~k rows per (task, stratum)
  * survive to the shuffle. sampleBy/randomSplit are per-row Bernoulli
  * draws seeded deterministically — map-only, reproducible across
  * retries, no coordination.
  */
object Sampling {

  /** Deterministic quota sample: at most n rows per stratum, chosen by a
    * stable order (md5 of the id rendered as a string — spreads selection
    * across the key space rather than taking the lowest ids, and is
    * reproducible in any engine with md5, so the selection itself is
    * oracle-checkable: q52 delegates here and the driver's DuckDB gate
    * diffs it row-for-row). */
  def quotaPerGroup(df: DataFrame, stratum: String, id: String, n: Int): DataFrame =
    df.withColumn("_rk", row_number().over(
        Window.partitionBy(col(stratum))
          .orderBy(md5(col(id).cast("string")), col(id))))
      .filter(col("_rk") <= n)
      .drop("_rk")

  /** Seeded stratified Bernoulli sample (fractions per stratum value). */
  def stratifiedSample(df: DataFrame, stratum: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratum, fractions, seed)

  /** DETERMINISTIC stratified sample: per-stratum percentage rates with
    * inclusion decided by a content hash of the id (md5 → 60-bit value
    * mod 100), not an RNG. Map-only — no shuffle, no state, no seed
    * bookkeeping — and the decision replays identically across engines,
    * reruns, and partitionings: the property a 100 TB curation pipeline
    * actually needs from its sampling stage (re-running a failed
    * partition must re-select the SAME rows, and the oracle can re-derive
    * the selection row-for-row, which q88 proves via DuckDB). */
  def hashStratifiedSample(df: DataFrame, stratum: String, id: String,
      ratesPct: Map[String, Int], defaultPct: Int): DataFrame = {
    require((ratesPct.values ++ Seq(defaultPct)).forall(r => r >= 0 && r <= 100))
    val u = pmod(
      conv(substring(md5(col(id).cast("string")), 1, 15), 16, 10).cast("long"),
      lit(100))
    val rate = ratesPct.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(col(stratum) === k, lit(v)).otherwise(acc)
    }
    df.filter(u < rate)
  }

  /** Seeded train/test split: complementary, exhaustive, reproducible. */
  def trainTestSplit(df: DataFrame, testFraction: Double, seed: Long): (DataFrame, DataFrame) = {
    val Array(train, test) = df.randomSplit(Array(1.0 - testFraction, testFraction), seed)
    (train, test)
  }
}
