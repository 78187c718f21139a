package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-8 wave 13: operational planning queries a 100 TB pipeline runs
  * against its own infrastructure — resharding cost analysis under
  * rendezvous (HRW) hashing vs naive mod-hashing (q150), and the
  * watermark planner that measures, from the data itself, how many
  * events each candidate watermark would drop (q151). Both are pure
  * map + tiny-aggregate shapes; q151 additionally exercises the Ranks
  * prefix-MAX decomposition (the global running watermark is exactly
  * the computation a naive implementation would single-task).
  */
object Wave13Queries {

  private val ShardsOld = 8
  private val ShardsNew = 12

  /** q150 — resharding audit under rendezvous (HRW) hashing: growing the
    * order-key space from 8 to 12 shards, how many keys move? Every
    * sharded store (feature stores, dedup band indexes, KV caches) pays
    * this migration; HRW assigns each key to argmax_s h(key, s), so a
    * key moves IFF one of the 4 new shards wins its argmax — expected
    * movement 4/12 = 1/3, the provable optimum — while mod-hashing
    * (key % N) remaps 2/3 of all keys (k%8 == k%12 iff k%24 < 8). The
    * query reports both measured fractions side by side plus the max
    * per-shard load factor, i.e. the full evidence a capacity plan needs.
    *
    * Determinism: h(key, s) is the md5-60 hash (TextOps.shingleHash60
    * semantics) of "key:s"; argmax positions and counts are exact
    * integers; the two fractions are one double division each, rounded.
    * Both argmaxes are computed by the fused native [[graft.functions
    * .HrwPack]] kernel (r12 verdict task 4) — one generated call per key
    * digesting the raw "key:s" bytes for all shards and returning
    * old·100 + new, bit-identical to the array-of-hashes expression
    * tree it replaced (Wave13Spec asserts equality against a literal
    * md5 replay).
    *
    * Scale notes: ONE map pass (the fused [[ShardsNew]]-hash kernel
    * per key — no explode, no join, no shuffle of anything data-sized)
    * into a [[ShardsNew]]-group aggregate with map-side combine, then a
    * 1-row reduction. The plan shape is what a 10^12-key resharding
    * dry-run wants, but note the per-key CPU cost is O(shards) md5
    * evaluations BY DESIGN: md5 is this repo's oracle-portability
    * contract (the one keyed hash both engines evaluate bit-identically),
    * not a production choice. A 1000-shard dry-run keeps the identical
    * plan and swaps the hash kernel for a cheap keyed mix
    * (xxhash64(key, shard) is built into Spark) — and at very large
    * shard counts HRW itself is typically replaced by a top-w jump/
    * anchor-hash variant so the per-key work is O(log shards), a kernel
    * swap inside the same one-map-pass shape, not a new plan. */
  private val q150 = GQuery(
    "q150_shard_rebalance",
    (s, d) => {
      graft.functions.HrwPack.register(s, ShardsOld, ShardsNew)
      val hashed = Tables.orders(s, d)
        .select(col("o_orderkey").as("k"))
        .withColumn("packed", graft.functions.HrwPack(col("k")))
        .withColumn("old_shard", expr("CAST(packed DIV 100 AS INT)"))
        .withColumn("new_shard", expr("CAST(packed % 100 AS INT)"))
        .withColumn("hrw_moved",
          when(col("old_shard") =!= col("new_shard"), 1L).otherwise(0L))
        .withColumn("mod_moved",
          when(pmod(col("k"), lit(ShardsOld)) =!= pmod(col("k"), lit(ShardsNew)),
            1L).otherwise(0L))
      hashed.groupBy(col("new_shard"))
        .agg(count(lit(1)).as("n"), sum(col("hrw_moved")).as("hm"),
          sum(col("mod_moved")).as("mm"))
        .agg(sum(col("n")).as("n_keys"), sum(col("hm")).as("hrw_moved"),
          sum(col("mm")).as("mod_moved"), max(col("n")).as("max_load"))
        .select(col("n_keys"), col("hrw_moved"),
          round(col("hrw_moved") / col("n_keys"), 6).as("hrw_frac"),
          round(lit((ShardsNew - ShardsOld).toDouble / ShardsNew), 6)
            .as("optimal_frac"),
          col("mod_moved"),
          round(col("mod_moved") / col("n_keys"), 6).as("mod_frac"),
          round(col("max_load") / (col("n_keys") / lit(ShardsNew.toDouble)), 4)
            .as("max_load_factor"))
    },
    Some(s"""WITH h AS (SELECT o_orderkey AS k,
                    [CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)
                       || ':' || CAST(s AS VARCHAR)), 1, 15)) AS BIGINT)
                     FOR s IN range(0, $ShardsNew)] AS hs
                  FROM orders),
          a AS (SELECT k,
                       CAST(list_position(hs[1:$ShardsOld],
                              list_max(hs[1:$ShardsOld])) - 1 AS INTEGER) AS old_shard,
                       CAST(list_position(hs, list_max(hs)) - 1 AS INTEGER) AS new_shard,
                       CASE WHEN k % $ShardsOld <> k % $ShardsNew
                            THEN 1 ELSE 0 END AS mod_moved
                FROM h),
          p AS (SELECT new_shard, count(*) AS n,
                       sum(CASE WHEN old_shard <> new_shard THEN 1 ELSE 0 END) AS hm,
                       sum(mod_moved) AS mm
                FROM a GROUP BY 1)
          SELECT CAST(sum(n) AS BIGINT) AS n_keys,
                 CAST(sum(hm) AS BIGINT) AS hrw_moved,
                 round(CAST(sum(hm) AS DOUBLE) / sum(n), 6) AS hrw_frac,
                 round(${(ShardsNew - ShardsOld).toDouble} / $ShardsNew, 6)
                   AS optimal_frac,
                 CAST(sum(mm) AS BIGINT) AS mod_moved,
                 round(CAST(sum(mm) AS DOUBLE) / sum(n), 6) AS mod_frac,
                 round(CAST(max(n) AS DOUBLE)
                       / (CAST(sum(n) AS DOUBLE) / $ShardsNew), 4)
                   AS max_load_factor
          FROM p""")
  )

  /** Candidate watermark grid (seconds) — the delays a deployment would
    * actually consider for the s01-family streams. */
  private val WmGrid = Seq(60, 300, 600)
  /** Deterministic per-event arrival skew: 0-599 s, keyed on event_id. */
  private val SkewModSec = 600L

  /** q151 — watermark planner: for each candidate watermark W, how many
    * events would Structured Streaming's late-data rule drop? An event is
    * late under W iff its event time < (max event time among everything
    * that ARRIVED before it) − W — so choosing W is a measurement
    * problem over the observed arrival skew, and this query IS that
    * measurement, run in batch over the log the stream already wrote.
    * The fixture has no arrival column, so arrival is synthesized
    * deterministically (ts + md5-60(event_id) mod 600 s — the q148
    * synthesized-snapshot precedent); on a real log `arr_us` is the
    * ingestion timestamp column.
    *
    * The running watermark (prefix max of event time in arrival order)
    * is THE textbook global-window trap — a naive
    * `max().over(Window.orderBy(arrival))` single-tasks the entire log.
    * It rides Ranks.runningMax instead: range-sliced local prefix
    * maxima + a k-row broadcast offset roll-forward (the q141/q65
    * decomposition family, MAX instantiation).
    *
    * Scale notes: one map pass (hash + integer arithmetic), one range
    * shuffle for the prefix max, one grouping-free aggregate computing
    * all three W counts at once. Nothing data-sized crosses a single
    * task. */
  private val q151 = GQuery(
    "q151_watermark_planner",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
        .withColumn("arr_us", col("ts_us")
          + pmod(TextOps.shingleHash60(col("event_id").cast("string")),
            lit(SkewModSec)) * 1000000L)
        .withColumn("_g", lit(0))
      val wm = Ranks.runningMax(ev, "_g",
        Seq(col("arr_us"), col("event_id")), col("ts_us"), "wm")
      val lateAggs = WmGrid.map(w =>
        sum(when(col("ts_us") < col("wm") - w * 1000000L, 1L).otherwise(0L))
          .as(s"late_${w}s"))
      wm.agg(count(lit(1)).as("n_events"), lateAggs: _*)
        .select(col("n_events") +: WmGrid.flatMap(w => Seq(
          col(s"late_${w}s"),
          round(col(s"late_${w}s") / col("n_events"), 6).as(s"frac_${w}s"))): _*)
    },
    Some(s"""WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us,
                     epoch_us(ts)
                       + (CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)),
                            1, 15)) AS BIGINT) % $SkewModSec) * 1000000 AS arr_us
                   FROM events),
          w AS (SELECT ts_us,
                       max(ts_us) OVER (ORDER BY arr_us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wm
                FROM e)
          SELECT count(*) AS n_events,
                 ${WmGrid.map(wSec =>
                   s"""CAST(sum(CASE WHEN ts_us < wm - ${wSec}000000 THEN 1 ELSE 0 END) AS BIGINT) AS late_${wSec}s,
                       round(CAST(sum(CASE WHEN ts_us < wm - ${wSec}000000 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS frac_${wSec}s""")
                   .mkString(", ")}
          FROM w""")
  )

  val all: Seq[GQuery] = Seq(q150, q151)
}
