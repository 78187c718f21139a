package graft.operators

import graft.{Cols, GQuery}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function family (generalizes the reference's per-chunk sorted
  * runs — parallel_sort.cpp:71-77 — into ranked/framed analytics, SURVEY
  * §2-B q16/q17) plus the batch forms of the streaming surface (q29/q30).
  *
  * Scale notes: every window here is partitioned (shuffle on the partition
  * key only, per-group sort inside WindowExec — spillable); no
  * unpartitioned windows in the hot path. Sessionization is the standard
  * lag→flag→cumulative-sum linear scan per user; the tumbling window uses
  * Spark's TimeWindow expression which is a pure projection (no shuffle
  * beyond the group-by).
  */
object WindowQueries {
  import Cols._

  /** q16 — ranking windows: row_number (fully tie-broken), rank and
    * dense_rank (price order, ties share a rank). */
  private val q16 = GQuery(
    "q16_window_rank",
    (s, d) => {
      val wFull = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      val wPrice = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc)
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
        .withColumn("rn", row_number().over(wFull))
        .withColumn("rk", rank().over(wPrice))
        .withColumn("drk", dense_rank().over(wPrice))
        .withColumn("prk", round(percent_rank().over(wPrice), 6))
        .withColumn("cd", round(cume_dist().over(wPrice), 6))
        .withColumn("nt", ntile(4).over(wFull))
        .filter(col("rn") <= 50)
        .select(col("l_returnflag"), col("rn"), col("rk"), col("drk"),
          col("prk"), col("cd"), col("nt"), col("l_extendedprice"))
        .orderBy(col("l_returnflag"), col("rn"))
    },
    Some("""SELECT l_returnflag, CAST(rn AS INTEGER) AS rn, CAST(rk AS INTEGER) AS rk,
                   CAST(drk AS INTEGER) AS drk, prk, cd, CAST(nt AS INTEGER) AS nt,
                   l_extendedprice FROM (
              SELECT l_returnflag, l_extendedprice,
                     row_number() OVER (PARTITION BY l_returnflag
                       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn,
                     rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC) AS rk,
                     dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC) AS drk,
                     round(percent_rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC), 6) AS prk,
                     round(cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC), 6) AS cd,
                     ntile(4) OVER (PARTITION BY l_returnflag
                       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS nt
              FROM lineitem)
            WHERE rn <= 50 ORDER BY l_returnflag, rn""")
  )

  /** q17 — analytic frames: running total (unbounded preceding) and a
    * 3-row moving average. l_quantity is integer-valued so both the
    * running double sum and the small-window average are exact. */
  private val q17 = GQuery(
    "q17_window_frame",
    (s, d) => {
      // (l_orderkey, l_linenumber) is not unique, so the window order must
      // be a total order over the remaining columns: residual ties are then
      // fully identical rows, whose relative order cannot change any frame
      // aggregate. The final sort additionally pins ties by running_qty
      // (strictly increasing within a partition since l_quantity >= 1).
      val ord = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_linestatus"))
      val w = Window.partitionBy(col("l_returnflag")).orderBy(ord: _*)
      Tables.lineitem(s, d)
        .withColumn("running_qty",
          sum(col("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("mov_avg_qty",
          avg(col("l_quantity")).over(w.rowsBetween(-2, Window.currentRow)))
        .withColumn("next_qty", lead(col("l_quantity"), 1).over(w))
        .withColumn("first_qty",
          first(col("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("running_qty"), col("mov_avg_qty"), col("next_qty"),
          col("first_qty"), col("l_shipdate"))
        .orderBy(col("l_returnflag"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"), col("running_qty"))
    },
    Some("""SELECT l_returnflag, l_orderkey, l_linenumber, running_qty, mov_avg_qty,
                   next_qty, first_qty, l_shipdate FROM (
              SELECT l_returnflag, l_orderkey, l_linenumber, l_shipdate,
                     sum(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty,
                     avg(l_quantity) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_avg_qty,
                     lead(l_quantity) OVER w AS next_qty,
                     first_value(l_quantity) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_qty
              FROM lineitem
              WINDOW w AS (PARTITION BY l_returnflag
                ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity,
                         l_extendedprice, l_discount, l_tax, l_linestatus))
            ORDER BY l_returnflag, l_shipdate, l_orderkey, l_linenumber, running_qty""")
  )

  /** q29 — sessionization (batch form): a >30-minute gap opens a new
    * session; session id = cumulative count of gap flags per user.
    * Gap arithmetic in exact epoch-microseconds on both engines. */
  private val q29 = GQuery(
    "q29_events_sessionize",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1)
            .otherwise(0))
        .withColumn("session_id",
          sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          dsum2(col("value")).as("sum_value"))
        .orderBy(col("user_id"), col("session_id"))
    },
    Some("""SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM (
              SELECT user_id, ts, value,
                     sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
              FROM (
                SELECT user_id, event_id, ts, value,
                       CASE WHEN prev_ts IS NULL
                              OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1
                            ELSE 0 END AS new_sess
                FROM (
                  SELECT user_id, event_id, ts, value,
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                  FROM events)))
            GROUP BY user_id, session_id ORDER BY user_id, session_id""")
  )

  /** q30 — tumbling-window aggregation (batch form of s01): Spark's
    * TimeWindow expression; epoch-aligned 1h windows ≡ date_trunc. */
  private val q30 = GQuery(
    "q30_events_tumbling",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum2(col("value")).as("sum_value"))
        .select(col("window.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("hour_start"), col("event_type")),
    Some("""SELECT date_trunc('hour', ts) AS hour_start, event_type,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""")
  )

  /** q50 — native session windows (SessionWindow expression): gap-merged
    * sessions per user, session end = last event + gap (half-open
    * semantics: a gap of exactly 30min starts a NEW session — mirrored in
    * the oracle with >=, unlike q29's strict->). */
  private val q50 = GQuery(
    "q50_session_window",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"), dsum2(col("value")).as("sum_value"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start")),
    Some("""SELECT user_id, min(ts) AS session_start,
                   max(ts) + INTERVAL 30 MINUTE AS session_end,
                   count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM (
              SELECT user_id, ts, value,
                     sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
              FROM (
                SELECT user_id, event_id, ts, value,
                       CASE WHEN prev_ts IS NULL
                              OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000 THEN 1
                            ELSE 0 END AS new_sess
                FROM (
                  SELECT user_id, event_id, ts, value,
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                  FROM events)))
            GROUP BY user_id, sess ORDER BY user_id, session_start""")
  )

  /** q51 — sliding (hopping) windows: 2-hour windows every hour, each
    * event lands in two windows (TimeWindow expands rows). The oracle
    * reconstructs the covering window starts arithmetically. */
  private val q51 = GQuery(
    "q51_hopping_window",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("event_type"), col("n"))
        .orderBy(col("win_start"), col("event_type")),
    Some("""SELECT make_timestamp(epoch_us(ts) - ((epoch_us(ts) - o.off) % 7200000000)) AS win_start,
                   event_type, count(*) AS n
            FROM events, (VALUES (0::BIGINT), (3600000000::BIGINT)) o(off)
            GROUP BY 1, 2 ORDER BY win_start, event_type""")
  )

  /** q65 — distributed running sum: q17's prefix aggregate computed via
    * Ranks.runningSum (local cumulative sums in bounded range slices + a
    * broadcast per-slice total offset) instead of one window task per
    * group value. Ties in the order key are fully identical rows (order
    * includes l_quantity), so the running values form the same multiset
    * and the final ORDER BY pins them — q17's own determinism recipe. */
  private val q65 = GQuery(
    "q65_distributed_cumsum",
    (s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_returnflag"),
        col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val ord = Seq(col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity"))
      Ranks.runningSum(li, "l_returnflag", ord, col("l_quantity"), "run_qty")
        .select(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber"), col("run_qty"))
        .orderBy(col("l_returnflag"), col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber"), col("run_qty"))
    },
    Some("""SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber, run_qty FROM (
              SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
                     sum(l_quantity) OVER (PARTITION BY l_returnflag
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber, l_quantity
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_qty
              FROM lineitem)
            ORDER BY l_returnflag, l_extendedprice, l_orderkey, l_linenumber, run_qty""")
  )

  val all: Seq[GQuery] = Seq(q16, q17, q29, q30, q50, q51, q65)
}
