package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (builder prompt: "skewed keys → salting or
  * AQE skew-join"). AQE's skew-join split handles sort-merge joins
  * automatically; explicit salting remains the tool for aggregations and
  * for joins where one hot key dominates a partition beyond what AQE
  * splitting can rebalance.
  */
object Skew {

  /** Salted equi-join of a skewed fact side against a (replicable)
    * dimension side: the fact side gets a deterministic salt derived from
    * its whole row hash, the dimension side is exploded ×salts, and the
    * join key becomes (key, salt) — hot keys spread over `salts`
    * partitions. Semantics identical to big.join(dim, key): the dimension
    * is replicated, never filtered. */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    val saltedDim = dim
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(saltedDim,
        saltedBig(key) === saltedDim(key) && saltedBig("_salt") === saltedDim("_salt"))
      .drop(saltedDim(key)).drop("_salt")
  }

  /** Two-phase (salted partial, then final) aggregation for hot grouping
    * keys: groupBy (key, salt) first, then merge the partials. `aggs`
    * must be algebraic (sum/count/min/max — anything with a merge). */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
      partial: Seq[(String, Column => Column)],
      merge: Seq[(String, Column => Column)]): DataFrame = {
    require(partial.length == merge.length && salts > 0)
    val salted = df.withColumn("_salt",
      pmod(xxhash64(struct(df.columns.map(col).toIndexedSeq: _*)), lit(salts)))
    val p = salted.groupBy(col(key), col("_salt"))
      .agg(partial.head._2(col(partial.head._1)).as(partial.head._1),
        partial.tail.map { case (n, f) => f(col(n)).as(n) }: _*)
    p.groupBy(col(key))
      .agg(merge.head._2(col(merge.head._1)).as(merge.head._1),
        merge.tail.map { case (n, f) => f(col(n)).as(n) }: _*)
  }
}
