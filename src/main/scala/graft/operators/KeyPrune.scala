package graft.operators

import graft.functions.Bloom
import graft.util.Geometry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col, typedLit}

/** Regime-switching key semi-join: broadcast the key list while it fits
  * a broadcast budget, switch to q90's bloom-pruned shuffle once it
  * outgrows one. This is the operator behind every "filter a fact table
  * by an uploaded key list" shape (q162's deletion cascade, allow/deny
  * lists, incremental reprocess manifests).
  *
  * Why a REGIME SWITCH and not one fixed plan: a 10^4-key list is a
  * kilobyte hash relation — broadcasting it is strictly cheaper than any
  * alternative; a 10^9-key list can neither broadcast nor be collected,
  * but its bloom filter is still megabytes, so the fact side tests
  * membership inside whole-stage codegen BEFORE its shuffle and the
  * exact semi-join afterwards removes the false positives (value-
  * identical to the plain semi-join by construction — the q90 proof
  * pattern, so the oracle never changes with the regime).
  *
  * The decision statistic is the exact key count (one count job —
  * production reads it from table statistics instead); the threshold is
  * [[BroadcastKeyLimitKey]] so a cluster can align it with its actual
  * `spark.sql.autoBroadcastJoinThreshold`. Bloom sizing is ~16 bits/key
  * (fpp ≈ 0.6% at k=3) rounded to a power of two and capped at 2^27 bits
  * = 16 MB — constant-size partial state per task (bitwise-OR combine).
  */
object KeyPrune {

  /** Key-count threshold above which the semi-join abandons broadcast
    * for the bloom-pruned shuffle. Default ≈ the key count whose hash
    * relation saturates a 10 MB broadcast budget. */
  val BroadcastKeyLimitKey = "spark.graft.broadcastKeyLimit"
  val DefaultBroadcastKeyLimit = 500000L

  /** Left-semi-join `fact` to `keys` on `fact(factKey) = keys(keyCol)`,
    * picking the regime by key count. Result is value-identical across
    * regimes. */
  def semiJoin(fact: DataFrame, keys: DataFrame,
      factKey: String, keyCol: String): DataFrame = {
    val spark = fact.sparkSession
    val limit = spark.conf.getOption(BroadcastKeyLimitKey)
      .map(_.toLong).getOrElse(DefaultBroadcastKeyLimit)
    // The regime count stays LAZY (a column-pruned count aggregate is
    // far cheaper than persisting the list; production reads it from
    // table statistics). In the BLOOM regime the key list is consumed
    // twice more (bloom build + exact semi-join) and may itself be a
    // join — materialize it there so the upstream plan runs once
    // (ADVICE r10). In the broadcast regime the single extra consumer
    // is the broadcast build of a sub-budget relation; a forced eager
    // checkpoint costs more than it saves (measured on q162 at sf0.1).
    // Callers whose key list is expensive AND multi-consumer at the
    // query level (q162's hop-1 result feeds both its audit count and
    // hop 2) should Io.materialize the list themselves.
    val n = keys.count()
    if (n <= limit)
      fact.join(broadcast(keys), fact(factKey) === keys(keyCol), "left_semi")
    else {
      Bloom.register(spark)
      val keyRel = graft.sources.Io.materialize(keys)
      val numBits =
        (1L << math.min(27, math.max(14, Geometry.ceilLog2(n) + 4))).toInt
      val bits = keyRel.agg(Bloom.buildAgg(numBits)(col(keyCol)).as("bits"))
        .head.getSeq[Long](0).toArray
      fact.filter(Bloom.mightContain(typedLit(bits), fact(factKey)))
        .join(keyRel, fact(factKey) === keyRel(keyCol), "left_semi")
    }
  }
}
