package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries read through here so the scan path is uniform: parquet →
  * vectorized columnar reader, with Catalyst predicate pushdown and column
  * pruning. At cluster scale the same call reads a partitioned parquet
  * dataset; nothing here materializes on the driver.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else raw(spark, sfDir, name)

  private def raw(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // Fixture timestamps are parquet TIMESTAMP(isAdjustedToUTC=false) —
    // pyarrow's default — which Spark 4 would surface as TIMESTAMP_NTZ
    // (spark.sql.parquet.inferTimestampNTZ.enabled defaults true). The
    // engine standardizes on TimestampType under the pinned UTC session
    // (same instants as DuckDB's naive timestamps, and what every oracle
    // has always hashed against), so NTZ inference is off for all loads:
    // the scan yields TimestampType directly — no post-scan cast, which
    // would break filter pushdown on the time columns.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view so the engine is usable from
    * plain SQL text (spark.sql) as well as the Column API. */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def part(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "part")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "region")
  /** events.parquet stores ts as parquet TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects outright. We read nanos as long
    * (spark.sql.legacy.parquet.nanosAsLong) and convert to a microsecond
    * timestamp with exact integer arithmetic (`DIV`, not double division —
    * epoch-nanos exceed 2^53). The data's ns remainders are all zero, and
    * DuckDB likewise truncates ns→us, so both engines see identical
    * instants. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = raw(spark, sfDir, "events")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    else df
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
