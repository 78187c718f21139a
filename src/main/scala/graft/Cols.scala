package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Column helpers shared across query families.
  *
  * Money/float aggregation rule: a sum of doubles depends on accumulation
  * order, which differs between Spark partial aggregation and the DuckDB
  * oracle. We therefore accumulate through exact decimals — cast each term
  * to a decimal wide enough to hold it losslessly, sum exactly, and cast
  * the final total back to double (correctly rounded, hence identical in
  * both engines). Columns with 2 decimal digits cast losslessly at scale 2;
  * products of two/three such columns use scale 4/6.
  */
object Cols {
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))
  def dec6(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Exact sum of a 2-decimal money column, returned as double. */
  def dsum2(c: Column): Column = sum(dec2(c)).cast(DoubleType)
  /** Exact sum of a 4-decimal product term, returned as double. */
  def dsum4(c: Column): Column = sum(dec4(c)).cast(DoubleType)
  /** Exact sum of a 6-decimal product term, returned as double. */
  def dsum6(c: Column): Column = sum(dec6(c)).cast(DoubleType)
}
