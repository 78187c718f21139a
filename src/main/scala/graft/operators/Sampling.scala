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

  /** Seeded train/test split: complementary, exhaustive, reproducible. */
  def trainTestSplit(df: DataFrame, testFraction: Double, seed: Long): (DataFrame, DataFrame) = {
    val Array(train, test) = df.randomSplit(Array(1.0 - testFraction, testFraction), seed)
    (train, test)
  }
}
