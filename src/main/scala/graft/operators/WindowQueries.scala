package graft.operators

import graft.{Cols, GQuery}
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
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
    * dense_rank (price order, ties share a rank).
    *
    * Scale plan (round 3 — the classic `Window.partitionBy(l_returnflag)`
    * form put the whole table through 3 tasks at any cluster size):
    * - row_number via Ranks.rowNumber (range slices + broadcast offsets;
    *   the file-scan input satisfies the Ranks determinism contract);
    * - rank / cume_dist numerator are per-TIE-GROUP min/max of rn —
    *   one data-parallel hash aggregate on (flag, price), a near-unique
    *   key that spreads over every partition (unlike q71's discrete-key
    *   value relation, this one is data-sized, which is exactly why it
    *   must be an aggregate and not a window);
    * - the output is top-50 per flag, so tie groups with rank ≤ 50 form a
    *   bounded (≤50/flag) relation: dense_rank runs over THAT, and every
    *   strictly-higher price is in it by construction (its min rn is
    *   smaller), so the dense rank is globally exact;
    * - percent_rank/cume_dist/ntile close over a 3-row per-flag total.
    * Output and oracle identical to the classic formulation. */
  private val q16 = GQuery(
    "q16_window_rank",
    (s, d) => {
      val li = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"))
      // materialize: the ranked relation feeds the tie aggregate AND
      // the final probe — one evaluation of the range shuffle, not two
      val rn = graft.sources.Io.materialize(Ranks.rowNumber(li, "l_returnflag",
        Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")),
        "rn"))
      val ties = rn.groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(min(col("rn")).as("rk"), max(col("rn")).as("cdn"))
      val topTies = ties.filter(col("rk") <= 50)
        .withColumn("drk", row_number().over(
          Window.partitionBy(col("l_returnflag"))
            .orderBy(col("l_extendedprice").desc)))
      val totals = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val rem = col("n") % 4
      rn.filter(col("rn") <= 50)
        .join(broadcast(topTies), Seq("l_returnflag", "l_extendedprice"))
        .join(broadcast(totals), "l_returnflag")
        .select(col("l_returnflag"), col("rn"), col("rk").cast("int").as("rk"),
          col("drk"),
          round(when(col("n") === 1, 0.0)
            .otherwise((col("rk") - 1).cast("double") / (col("n") - 1)), 6).as("prk"),
          round(col("cdn").cast("double") / col("n"), 6).as("cd"),
          when(col("rn") <= (expr("n div 4") + 1) * rem,
            expr("(rn - 1) div (n div 4 + 1)") + 1)
            .otherwise(rem + expr("(rn - 1 - (n div 4 + 1) * (n % 4)) div (n div 4)") + 1)
            .cast("int").as("nt"),
          col("l_extendedprice"))
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
      //
      // Scale plan (round 3 — the classic partitionBy(l_returnflag) window
      // funneled the corpus through 3 tasks): the global row number and
      // running sum come from one fused Ranks decomposition (range slices
      // + broadcast offsets). The short-frame functions (3-row moving avg,
      // lead 1) become NEIGHBOR DONATION: every row donates its quantity
      // to the rank slots that need it (rn+1 and rn+2 see it as a lag,
      // rn−1 as its lead), one hash aggregate reassembles the neighbor
      // row, and an equi-join on (flag, rn) attaches it — equi-shuffles
      // only, parallel at any slice count, exact even for 1-row slices
      // (no slice-boundary row-passing with its cascade edge cases).
      // first_value(= the rn=1 row) is a 3-row broadcast.
      val ord = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_linestatus"))
      val li = Tables.lineitem(s, d).select(col("l_returnflag") +: ord: _*)
      // materialize: the ranked relation feeds three consumers (donor
      // aggregate, firsts, final join) — without it each reference
      // re-evaluates the range exchange (no exchange reuse, q69 precedent).
      // PROJECT FIRST: the last four ord columns exist only as sort
      // tie-breakers, and once rn/running_qty are computed they are dead
      // weight — dropping them here cuts every downstream byte path (the
      // checkpoint itself, the donor explode scan, the (flag, rn) join,
      // the final presentation sort). Measured at the 60M-row sf10 decade
      // this is the difference between spilling and not (r7 Ranks run).
      val ranked = graft.sources.Io.materialize(Ranks.rowNumberAndRunningSum(
        li, "l_returnflag", ord, col("l_quantity"), "rn", "running_qty")
        .select(col("l_returnflag"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"), col("l_quantity"), col("rn"), col("running_qty")))
      val donors = ranked.select(col("l_returnflag"), explode(array(
          struct((col("rn") + 1).as("trn"), lit(1).as("role"), col("l_quantity").as("q")),
          struct((col("rn") + 2).as("trn"), lit(2).as("role"), col("l_quantity").as("q")),
          struct((col("rn") - 1).as("trn"), lit(3).as("role"), col("l_quantity").as("q"))
        )).as("dn"))
        .select(col("l_returnflag"), col("dn.trn").as("rn"),
          col("dn.role").as("role"), col("dn.q").as("q"))
        .groupBy(col("l_returnflag"), col("rn"))
        .agg(min(when(col("role") === 1, col("q"))).as("lag1"),
          min(when(col("role") === 2, col("q"))).as("lag2"),
          min(when(col("role") === 3, col("q"))).as("lead1"))
      val firsts = ranked.filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("first_qty"))
      ranked
        .join(donors, Seq("l_returnflag", "rn"), "left")
        .join(broadcast(firsts), "l_returnflag")
        .withColumn("mov_avg_qty",
          (col("l_quantity") + coalesce(col("lag1"), lit(0.0))
            + coalesce(col("lag2"), lit(0.0)))
            / when(col("rn") >= 3, 3).when(col("rn") === 2, 2).otherwise(1))
        .withColumn("next_qty", col("lead1"))
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

  /** q91 — time-series gap-fill / resample (wave 4): per-user daily
    * activity grid over the corpus' full date span, missing days filled
    * by carrying the last observed daily sum forward (nulls before a
    * user's first event become 0). The feature-store resample step —
    * model features need a dense time grid, events are sparse.
    *
    * Scale notes: daily pre-aggregation shrinks events to (user × active
    * day) BEFORE any window; the grid explode is users × days (bounded by
    * the span, not event volume); the carry-forward window partitions by
    * user_id (cardinality scales with data) over day-count-bounded rows.
    * The span comes from a 1-row min/max aggregate (broadcast). */
  private val q91 = GQuery(
    "q91_gapfill",
    (s, d) => {
      val ev = Tables.events(s, d)
      val daily = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_events"), dsum2(col("value")).as("day_value"))
      val span = ev.agg(to_date(min(col("ts"))).as("d0"), to_date(max(col("ts"))).as("d1"))
      val grid = ev.select(col("user_id")).distinct()
        .crossJoin(broadcast(span))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "day"), "left")
        .select(col("user_id"), col("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(last(col("day_value"), ignoreNulls = true).over(w), lit(0.0))
            .as("carried_value"))
        .orderBy(col("user_id"), col("day"))
    },
    Some("""WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS day,
                                  count(*) AS n_events,
                                  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
                           FROM events GROUP BY 1, 2),
                 grid AS (SELECT u.user_id, CAST(g.day AS DATE) AS day
                          FROM (SELECT DISTINCT user_id FROM events) u,
                               (SELECT unnest(generate_series(CAST(min(ts) AS DATE),
                                                              CAST(max(ts) AS DATE),
                                                              INTERVAL 1 DAY)) AS day
                                FROM events) g)
            SELECT user_id, day,
                   coalesce(n_events, 0) AS n_events,
                   coalesce(last_value(day_value IGNORE NULLS) OVER (
                     PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS carried_value
            FROM grid LEFT JOIN daily USING (user_id, day)
            ORDER BY user_id, day""")
  )

  /** q92 — trailing 7-day rolling features per event (wave 4): for every
    * event, the count and exact-decimal sum of the SAME USER's events in
    * the preceding 7 days (inclusive of now) — the classic point-in-time-
    * correct feature join input. The RANGE frame is over exact epoch
    * MICROseconds on both engines, so the boundary set is bit-identical
    * (a seconds-truncated frame would disagree with the oracle's
    * microsecond timestamps on sub-second boundary gaps).
    *
    * Scale notes: one user-keyed range shuffle; the frame is time-bounded
    * so Spark's sliding-frame evaluator keeps O(window) state per
    * partition stream, and partitions scale with users. */
  private val q92 = GQuery(
    "q92_rolling_features",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-604800000000L, 0L)
      Tables.events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_7d"),
          sum(dec2(col("value"))).over(w).cast("double").as("sum_7d"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id,
                   count(*) OVER w AS n_7d,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_7d
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                         RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
            ORDER BY event_id""")
  )

  /** q93 — conversion funnel (wave 4): per user, first signup and the
    * first purchase AT OR AFTER it; converted = within 7 days. Two
    * user-keyed aggregates (first the anchor, then the conditional min
    * over the join) — no self-join of the raw stream, no window over
    * event history.
    *
    * Column-name hygiene: days_to_convert only when converted (else
    * null); all values are min()s of timestamps — deterministic. */
  private val q93 = GQuery(
    "q93_event_funnel",
    (s, d) => {
      val ev = Tables.events(s, d)
      val anchors = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
      val conv = ev.filter(col("event_type") === "purchase")
        .join(anchors, "user_id")
        .filter(col("ts") >= col("signup_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_purchase_ts"))
      anchors.join(conv, Seq("user_id"), "left")
        .select(col("user_id"), col("signup_ts"), col("first_purchase_ts"),
          (col("first_purchase_ts").isNotNull &&
            unix_micros(col("first_purchase_ts")) - unix_micros(col("signup_ts"))
              <= 604800000000L).as("converted_7d"))
        .orderBy(col("user_id"))
    },
    Some("""WITH anchors AS (SELECT user_id, min(ts) AS signup_ts FROM events
                             WHERE event_type = 'signup' GROUP BY user_id),
                 conv AS (SELECT e.user_id, min(e.ts) AS first_purchase_ts
                          FROM events e JOIN anchors a ON e.user_id = a.user_id
                          WHERE e.event_type = 'purchase' AND e.ts >= a.signup_ts
                          GROUP BY e.user_id)
            SELECT user_id, signup_ts, first_purchase_ts,
                   (first_purchase_ts IS NOT NULL AND
                    epoch_us(first_purchase_ts) - epoch_us(signup_ts) <= 604800000000)
                     AS converted_7d
            FROM anchors LEFT JOIN conv USING (user_id)
            ORDER BY user_id""")
  )

  /** q103 — behavioral Markov transition matrix (wave 5): per-user
    * event sequences (ordered by time) reduced to first-order transition
    * counts and probabilities — the session-model statistic behind
    * journey analysis, anomaly scoring, and synthetic-session generation.
    *
    * Scale notes: ONE user-keyed window (lag over ts, per-user state
    * bounded by that user's events — the q92 shape), then a ≤|types|²
    * aggregate with partial combine; the probability denominator windows
    * over the |types|²-row AGGREGATE (q70/q83 pattern), never the
    * events. Probabilities are exact integer ratios evaluated in one
    * IEEE division — identical in both engines, no rounding needed.
    * Tie-break: same-timestamp events order by event_id in BOTH engines
    * (deterministic sequence, not implementation order). */
  private val q103 = GQuery(
    "q103_markov_transitions",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("prob", col("cnt").cast("double") /
          sum(col("cnt")).over(Window.partitionBy(col("from_type"))))
        .orderBy(col("from_type"), col("to_type"))
    },
    Some("""WITH seq AS (SELECT event_type,
                                lead(event_type) OVER
                                  (PARTITION BY user_id ORDER BY ts, event_id)
                                  AS next_type
                         FROM events),
                 c AS (SELECT event_type AS from_type, next_type AS to_type,
                              count(*) AS cnt
                       FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
            SELECT from_type, to_type, cnt,
                   CAST(cnt AS DOUBLE) / sum(cnt) OVER (PARTITION BY from_type)
                     AS prob
            FROM c ORDER BY from_type, to_type""")
  )

  /** q114 — retention cohort matrix (wave 5): users bucketed by signup
    * week (ISO date_trunc, identical in both engines), activity counted
    * per whole-week offset from the cohort start — the
    * cohort × week-offset retention table every behavioral dashboard
    * draws. Offsets are exact integer day-differences `div` 7, so cell
    * membership is deterministic.
    *
    * Scale notes: anchor aggregate is user-keyed (partial combine); the
    * activity join is user-keyed fact⋈anchor (AQE picks broadcast at
    * anchor sizes that fit); the matrix aggregate is
    * |cohorts|·|offsets|-bounded. countDistinct shuffles on the
    * (cell, user) pair — scales with distinct users per cell, not
    * events. */
  private val q114 = GQuery(
    "q114_retention_cohorts",
    (s, d) => {
      val ev = Tables.events(s, d)
      val anchors = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
        .withColumn("cohort", to_date(date_trunc("week", col("signup_ts"))))
      // Filter on the RAW day difference before bucketing: `div 7`
      // truncates toward zero, so days -6..-1 would land in off = 0 and
      // wrongly survive a post-division `off >= 0` filter (the oracle
      // filters pre-division, and so must we).
      ev.join(anchors, "user_id")
        .withColumn("day_diff", expr("datediff(to_date(ts), cohort)"))
        .filter(col("day_diff") >= 0)
        .withColumn("off", expr("day_diff div 7"))
        .groupBy(col("cohort"), col("off"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort"), col("off"))
    },
    Some("""WITH a AS (SELECT user_id,
                              CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
                       FROM events WHERE event_type = 'signup'
                       GROUP BY user_id)
            SELECT cohort, date_diff('day', cohort, CAST(ts AS DATE)) // 7 AS off,
                   count(DISTINCT e.user_id) AS n_active
            FROM events e JOIN a ON e.user_id = a.user_id
            WHERE date_diff('day', cohort, CAST(ts AS DATE)) >= 0
            GROUP BY 1, 2 ORDER BY cohort, off""")
  )

  /** q115 — ordered funnel steps (wave 5): view → click → purchase in
    * TIME ORDER per user (each step's timestamp must be ≥ the previous
    * step's), with per-step survivor counts and conversion from the
    * previous step — q93's two-step funnel generalized to an ordered
    * chain. Each stage is one user-keyed conditional-min aggregate over
    * a join with the previous stage's anchors (never a self-join of the
    * raw stream, never an event-history window); the final rates come
    * from a lag window over the 3-row step relation (q70 pattern).
    * Conversion ratios are single exact-int IEEE divisions. */
  private val q115 = GQuery(
    "q115_funnel_steps",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
      def stage(evType: String, prev: DataFrame): DataFrame =
        ev.filter(col("event_type") === evType)
          .join(prev, "user_id")
          .filter(col("ts") >= col("t"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
      val s1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
      val s2 = stage("click", s1)
      val s3 = stage("purchase", s2)
      val steps = s1.agg(count(lit(1)).as("n")).select(lit("1_view").as("step"), col("n"))
        .unionAll(s2.agg(count(lit(1)).as("n")).select(lit("2_click").as("step"), col("n")))
        .unionAll(s3.agg(count(lit(1)).as("n")).select(lit("3_purchase").as("step"), col("n")))
      steps
        .withColumn("conv_from_prev", col("n").cast("double") /
          lag(col("n"), 1).over(Window.partitionBy().orderBy(col("step"))))
        .orderBy(col("step"))
    },
    Some("""WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                        WHERE event_type = 'view' GROUP BY user_id),
                 s2 AS (SELECT e.user_id, min(e.ts) AS t
                        FROM events e JOIN s1 ON e.user_id = s1.user_id
                        WHERE e.event_type = 'click' AND e.ts >= s1.t
                        GROUP BY e.user_id),
                 s3 AS (SELECT e.user_id, min(e.ts) AS t
                        FROM events e JOIN s2 ON e.user_id = s2.user_id
                        WHERE e.event_type = 'purchase' AND e.ts >= s2.t
                        GROUP BY e.user_id),
                 st AS (SELECT '1_view' AS step, count(*) AS n FROM s1
                        UNION ALL SELECT '2_click', count(*) FROM s2
                        UNION ALL SELECT '3_purchase', count(*) FROM s3)
            SELECT step, n,
                   CAST(n AS DOUBLE) / lag(n) OVER (ORDER BY step) AS conv_from_prev
            FROM st ORDER BY step""")
  )

  /** q116 — inter-event gap profile (wave 5): per event type, the
    * distribution of time gaps between a user's consecutive events of
    * that type (count, p50/p90 quantiles, max) — the arrival-process
    * statistic behind session-gap tuning (q29/q50's 30-min threshold is
    * exactly a p-quantile of this relation), bot screening, and
    * synthetic-load modeling.
    *
    * Scale notes: one (user, type)-keyed lag window (per-partition state
    * bounded by that user's events of one type), gaps carried as exact
    * epoch-microsecond longs, then type-grouped quantiles through
    * Ranks.quantileCont (parallel range slices — never a single-task
    * percentile; the gap relation is materialized first per the Ranks
    * input contract). Quantile interpolation runs on identical
    * integer-valued doubles in both engines; quantiles round to WHOLE
    * microseconds — at 1e11-microsecond magnitudes the double ulp
    * (~6e-5) sits ABOVE a 6-decimal grid, so only integer rounding
    * is stable cross-engine. */
  private val q116 = GQuery(
    "q116_gap_profile",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val gaps = graft.sources.Io.materialize(
        Tables.events(s, d)
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
          .filter(col("gap").isNotNull)
          .select(col("event_type"), col("gap")))
      val base = gaps.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"), max(col("gap")).as("max_us"))
      base
        .join(Ranks.quantilesCont(gaps, "event_type", col("gap"),
          Seq(0.5 -> "p50", 0.9 -> "p90")), "event_type")
        .select(col("event_type"), col("n_gaps"),
          round(col("p50"), 0).as("p50_us"), round(col("p90"), 0).as("p90_us"),
          col("max_us"))
        .orderBy(col("event_type"))
    },
    Some("""WITH g AS (SELECT event_type,
                              epoch_us(ts) - lag(epoch_us(ts)) OVER
                                (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) AS gap
                       FROM events),
                 gg AS (SELECT event_type, gap FROM g WHERE gap IS NOT NULL)
            SELECT event_type, count(*) AS n_gaps,
                   round(quantile_cont(gap, 0.5), 0) AS p50_us,
                   round(quantile_cont(gap, 0.9), 0) AS p90_us,
                   CAST(max(gap) AS BIGINT) AS max_us
            FROM gg GROUP BY event_type ORDER BY event_type""")
  )

  /** q119 — SCD2 (slowly-changing-dimension type 2) history build
    * (round 7): collapse each user's event stream into validity
    * intervals, one row per maximal run of a constant event_type, with
    * [valid_from, valid_to) effective bounds, is_current on the open
    * run, and the run's event count and value sum. The warehouse
    * history-table op a curation pipeline uses to track attribute
    * drift (source label, license tag, quality tier) over re-crawls —
    * state-change islands, where q29's sessionization is time-GAP
    * islands (different predicate, same decomposition).
    *
    * Mechanics: change flag on lag(event_type) ≠ event_type (null-safe:
    * the first event opens segment 1), running sum of flags = segment
    * number, aggregate per (user, segment), then lead(valid_from) over
    * the per-user SEGMENT relation closes each interval.
    *
    * Scale notes: both windows partition by user_id (cardinality scales
    * with data; per-partition state is one user's rows, the second
    * window runs over the already-aggregated segment relation); one
    * shuffle on user_id reused by both windows and the segment
    * aggregate; value sums accumulate exact decimal. */
  private val q119 = GQuery(
    "q119_scd2",
    (s, d) => {
      val we = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val ws = Window.partitionBy(col("user_id")).orderBy(col("seg_no"))
      Tables.events(s, d)
        .withColumn("chg",
          when(lag(col("event_type"), 1).over(we) === col("event_type"), 0L)
            .otherwise(1L))
        .withColumn("seg_no",
          sum(col("chg")).over(we.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("seg_no"), col("event_type"))
        .agg(min(col("ts")).as("valid_from"), count(lit(1)).as("n_events"),
          dsum2(col("value")).as("sum_value"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(ws))
        .select(col("user_id"), col("seg_no"), col("event_type"),
          col("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"), col("n_events"),
          col("sum_value"))
        .orderBy(col("user_id"), col("seg_no"))
    },
    Some("""WITH o AS (SELECT user_id, event_type, ts, event_id, value,
                         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                              THEN 1 ELSE 0 END AS chg
                       FROM events
                       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            r AS (SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id
                                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
                              AS seg_no FROM o),
            seg AS (SELECT user_id, seg_no, event_type, min(ts) AS valid_from,
                           count(*) AS n_events,
                           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
                    FROM r GROUP BY user_id, seg_no, event_type)
            SELECT user_id, seg_no, event_type, valid_from,
                   lead(valid_from) OVER ws AS valid_to,
                   (lead(valid_from) OVER ws IS NULL) AS is_current,
                   n_events, sum_value
            FROM seg
            WINDOW ws AS (PARTITION BY user_id ORDER BY seg_no)
            ORDER BY user_id, seg_no""")
  )

  val all: Seq[GQuery] = Seq(q16, q17, q29, q30, q50, q51, q65, q91, q92,
    q93, q103, q114, q115, q116, q119)
}
