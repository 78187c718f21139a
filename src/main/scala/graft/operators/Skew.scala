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

  /** Round-robin salt: varies within fully identical rows (the common hot-
    * key shape is many *identical* records — a row-content hash would map
    * them all to ONE salt and silently not spread them at all). The salt
    * value is not reproducible across retries, but every operator built on
    * it is salt-invariant: the dimension is replicated to all salts
    * (join), and partial aggregates merge to the same final value
    * whichever salt each row drew. */
  private def rowSalt(salts: Int): Column =
    pmod(monotonically_increasing_id(), lit(salts.toLong))

  /** Salted equi-join of a skewed fact side against a (replicable)
    * dimension side: the fact side gets a per-row salt, the dimension side
    * is exploded ×salts, and the join key becomes (key, salt) — hot keys
    * spread over `salts` partitions. Semantics identical to
    * big.join(dim, key): the dimension is replicated, never filtered. */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val saltedBig = big.withColumn("_salt", rowSalt(salts))
    // SHUFFLE_HASH on the dimension side (r17, guide §3.1): the salted
    // dim partition (|dim| / salts·shuffle-width rows) is exactly the
    // "moderately small per partition" build side the guide names, and
    // salting exists precisely because this dim was NOT broadcastable —
    // the default sort-merge paid two full sorts (fact + dim×salts) that
    // the hash build skips. Join semantics are unchanged (same keys,
    // same rows); only the physical strategy is pinned.
    val saltedDim = dim
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
      .hint("shuffle_hash")
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
    val salted = df.withColumn("_salt", rowSalt(salts))
    val p = salted.groupBy(col(key), col("_salt"))
      .agg(partial.head._2(col(partial.head._1)).as(partial.head._1),
        partial.tail.map { case (n, f) => f(col(n)).as(n) }: _*)
    p.groupBy(col(key))
      .agg(merge.head._2(col(merge.head._1)).as(merge.head._1),
        merge.tail.map { case (n, f) => f(col(n)).as(n) }: _*)
  }
}
