package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge to the `private[sql]` internal-row DataFrame constructor.
  *
  * Ranks.streamPass (r17) runs its zero-shuffle slice-local pass over
  * `queryExecution.toRdd` and rebuilds the DataFrame directly from the
  * produced InternalRows. The public alternative — `Dataset.mapPartitions`
  * with `Encoders.row` — round-trips EVERY row through external objects
  * (UTF8String → String, DateType → java.sql.Date, Decimal →
  * BigDecimal, ArrayData → Seq) on both sides of the pass; the r17 sf1
  * A/B measured that conversion at 1.1–1.5× of whole-query runtime for
  * every Ranks consumer, large enough to erase the exchange the pass
  * exists to save. This shim is the same door Spark's own streaming
  * sources use; no behavior is altered, only the boxing skipped.
  */
object GraftSqlShim {
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
