package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a DataFrame program plus (when SQL-expressible) the
  * equivalent ANSI SQL the driver's DuckDB oracle runs on the same parquet
  * tables. Keys map 1:1 to SURVEY.md §2-B rows.
  *
  * Determinism contract (SURVEY.md §7): every query either ends in an
  * ORDER BY over a unique key or returns a single aggregate row, and all
  * floating-point aggregates accumulate through exact decimal (or
  * integer-valued doubles) so the driver's hash compare is stable.
  */
final case class GQuery(
    key: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** included in Bench's headline loop (driver-run per round) */
    bench: Boolean = true)
