package graft.operators

import graft.Cols.dsum2
import graft.GQuery
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 wave 53: q231 — first-touch vs last-touch attribution.
  *
  * The events family has funnels (q93/q115), retention cohorts (q114)
  * and as-of enrichment (q15) — but not the revenue question marketing
  * analytics actually asks: which preceding CLICK gets credit for a
  * purchase? The two standard policies disagree exactly when a user
  * clicks more than once in the lookback window: FIRST-touch credits
  * the click that opened the journey, LAST-touch the one that closed
  * it. This sheet prices both over the same 7-day lookback: per
  * policy, purchases attributed vs orphaned, attributed / orphaned
  * revenue (exact DECIMAL(18,2) sums, the q30 discipline), and the
  * total click→purchase latency — the numbers a budget-allocation
  * model reads.
  *
  * Both policies come out of ONE user-keyed window pass: a RANGE frame
  * [now − 7d, now] over event time carries max(click ts) and
  * min(click ts) simultaneously — the frame bound (not a post-filter)
  * enforces the lookback, so a click 8 days back never leaks in. Ties
  * (a click sharing the purchase's timestamp) attribute, per the ≤
  * frame bound, identically in both engines.
  *
  * Scale notes (100 TB): one shuffle by user_id (the window key —
  * user-sized partitions, never a global window), then a 2-branch
  * single-row aggregate per policy over the purchase rows, unioned.
  * Nothing joins; the lookback is frame arithmetic inside the window,
  * so the pass stays one scan + one keyed exchange at any scale. */
object Wave53Queries {

  private val LookbackUs = 7L * 86400L * 1000000L

  private val q231 = GQuery(
    "q231_attribution",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("tus"))
        .rangeBetween(-LookbackUs, 0)
      val clickT = when(col("event_type") === "click", col("tus"))
      val pur = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("tus"),
          col("event_type"), col("value"))
        .withColumn("first_click", min(clickT).over(w))
        .withColumn("last_click", max(clickT).over(w))
        .filter(col("event_type") === "purchase")
      def sheet(policy: String, c: String) = pur.agg(
        count(lit(1)).as("purchases"),
        sum(col(c).isNotNull.cast("long")).as("attributed"),
        dsum2(when(col(c).isNotNull, col("value")).otherwise(lit(0.0)))
          .as("attr_value"),
        dsum2(when(col(c).isNull, col("value")).otherwise(lit(0.0)))
          .as("orphan_value"),
        sum(when(col(c).isNotNull, col("tus") - col(c)).otherwise(lit(0L)))
          .as("lat_us_sum"))
        .select(lit(policy).as("policy"), col("purchases"),
          col("attributed"), col("attr_value"), col("orphan_value"),
          col("lat_us_sum"))
      sheet("first", "first_click").unionAll(sheet("last", "last_click"))
        .orderBy(col("policy"))
    },
    Some(s"""WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_type,
                           value
                        FROM events),
                  w AS (SELECT user_id, tus, event_type, value,
                          min(CASE WHEN event_type = 'click' THEN tus END)
                            OVER (PARTITION BY user_id ORDER BY tus
                              RANGE BETWEEN $LookbackUs PRECEDING
                              AND CURRENT ROW) AS first_click,
                          max(CASE WHEN event_type = 'click' THEN tus END)
                            OVER (PARTITION BY user_id ORDER BY tus
                              RANGE BETWEEN $LookbackUs PRECEDING
                              AND CURRENT ROW) AS last_click
                        FROM e),
                  p AS (SELECT * FROM w WHERE event_type = 'purchase')
             SELECT 'first' AS policy, CAST(count(*) AS BIGINT) AS purchases,
                    CAST(sum(CASE WHEN first_click IS NOT NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS attributed,
                    CAST(sum(CASE WHEN first_click IS NOT NULL
                      THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END)
                      AS DOUBLE) AS attr_value,
                    CAST(sum(CASE WHEN first_click IS NULL
                      THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END)
                      AS DOUBLE) AS orphan_value,
                    CAST(sum(CASE WHEN first_click IS NOT NULL
                      THEN tus - first_click ELSE 0 END) AS BIGINT)
                      AS lat_us_sum
             FROM p
             UNION ALL
             SELECT 'last', CAST(count(*) AS BIGINT),
                    CAST(sum(CASE WHEN last_click IS NOT NULL
                      THEN 1 ELSE 0 END) AS BIGINT),
                    CAST(sum(CASE WHEN last_click IS NOT NULL
                      THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END)
                      AS DOUBLE),
                    CAST(sum(CASE WHEN last_click IS NULL
                      THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END)
                      AS DOUBLE),
                    CAST(sum(CASE WHEN last_click IS NOT NULL
                      THEN tus - last_click ELSE 0 END) AS BIGINT)
             FROM p
             ORDER BY policy""")
  )

  val all: Seq[GQuery] = Seq(q231)
}
