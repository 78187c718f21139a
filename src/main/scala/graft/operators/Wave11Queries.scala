package graft.operators

import graft.GQuery
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-7 wave 11: the temporal-dimension lookup that completes the
  * SCD2 lifecycle (q139 — q119 builds the history, this consumes it),
  * and two exact distributional hypothesis tests (q140 chi-square
  * independence, q141 two-sample Kolmogorov–Smirnov) — the statistics a
  * corpus-composition audit actually runs, computed with the engine's
  * order-free determinism discipline.
  */
object Wave11Queries {

  /** The q119 SCD2 dimension (user_id, event_type, [valid_from,
    * valid_to)) — rebuilt over a caller-chosen event slice as the
    * lookup's build side. */
  private def scd2(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val we = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ws = Window.partitionBy(col("user_id")).orderBy(col("seg_no"))
    events
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(we) === col("event_type"), 0L)
          .otherwise(1L))
      .withColumn("seg_no",
        sum(col("chg")).over(we.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("seg_no"), col("event_type"))
      .agg(min(col("ts")).as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(ws))
      .select(col("user_id"), col("event_type"),
        col("valid_from"), col("valid_to"))
  }

  /** q139 — SCD2 interval LOOKUP: label every purchase with the
    * browsing regime — the q119 validity interval built over the user's
    * NON-purchase events — in effect at purchase time. The most common
    * warehouse temporal pattern (join the fact against the VERSION of
    * the dimension that was true then, not the current one), and the
    * consumer half of the q119 lifecycle. Purchases before a user's
    * first regime get 'none' (the LEFT-join contract every SCD2 lookup
    * needs for pre-history facts).
    *
    * Scale notes: the lookup is an EQUI-join on the entity key with a
    * residual interval predicate — one shuffle on user/cust key for
    * both sides, per-key interval lists are per-entity-history-sized
    * (never data-sized), and each fact matches at most one interval
    * (intervals partition the timeline by construction), so the join
    * cannot fan out. Output aggregates to |regimes| rows with map-side
    * combine; price mass accumulates exact decimal. */
  private val q139 = GQuery(
    "q139_scd2_lookup",
    (s, d) => {
      // the interval predicate rides the JOIN CONDITION (equi on the
      // entity key + residual), not a post-join filter: a left-join-
      // then-filter would drop pre-history facts instead of labeling
      // them 'none'
      val ev = Tables.events(s, d)
      val dim = scd2(ev.filter(col("event_type") =!= "purchase"))
        .withColumnRenamed("user_id", "du")
        .withColumnRenamed("event_type", "regime_type")
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("u"), col("ts"), col("value"))
        .join(dim,
          col("u") === col("du") &&
            col("ts") >= col("valid_from") &&
            (col("valid_to").isNull || col("ts") < col("valid_to")),
          "left")
        .groupBy(coalesce(col("regime_type"), lit("none")).as("regime"))
        .agg(count(lit(1)).as("n_purchases"),
          countDistinct(col("u")).as("n_users"),
          round(sum(col("value").cast(DecimalType(18, 2)))
            .cast("double"), 2).as("total_value"))
        .orderBy(col("regime"))
    },
    Some("""WITH o AS (SELECT user_id, event_type, ts, event_id,
                         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                              THEN 1 ELSE 0 END AS chg
                       FROM events WHERE event_type <> 'purchase'
                       WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            r AS (SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id
                                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
                              AS seg_no FROM o),
            seg AS (SELECT user_id, seg_no, event_type, min(ts) AS valid_from
                    FROM r GROUP BY user_id, seg_no, event_type),
            dim AS (SELECT user_id, event_type, valid_from,
                           lead(valid_from) OVER (PARTITION BY user_id
                                                  ORDER BY seg_no) AS valid_to
                    FROM seg),
            j AS (SELECT p.user_id, p.value, dim.event_type AS regime_type
                  FROM (SELECT user_id, ts, value FROM events
                        WHERE event_type = 'purchase') p
                  LEFT JOIN dim
                    ON p.user_id = dim.user_id
                   AND p.ts >= dim.valid_from
                   AND (dim.valid_to IS NULL OR p.ts < dim.valid_to))
            SELECT coalesce(regime_type, 'none') AS regime,
                   count(*) AS n_purchases,
                   count(DISTINCT user_id) AS n_users,
                   round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
                     AS total_value
            FROM j GROUP BY 1 ORDER BY regime""")
  )

  /** q140 — chi-square independence audit over the (source, lang)
    * contingency table: is language distribution independent of source?
    * The confounding check run before mixture design (q83/q95) trusts
    * per-source weights — a source that is secretly "all German" makes
    * language-balanced sampling silently source-skewed.
    *
    * Determinism: observed counts and marginals are exact integers;
    * each cell's contribution (o−e)²/e is ONE double expression rounded
    * to 6; the statistic then sums MICRO-SCALED INTEGERS
    * (round(contrib,6)·10⁶ is integer-valued and exact in a double well
    * past any real table) — an order-free exact sum, where a double SUM
    * of raw contributions would be reduction-order-dependent. The top
    * cell is a lexicographic struct max (deterministic tie-break).
    *
    * Scale notes: one |sources|×|langs| cell aggregate with map-side
    * combine, two marginal aggregates over the CELL relation (not the
    * corpus), broadcast back; everything after the first aggregate is
    * cell-table-sized. */
  private val q140 = GQuery(
    "q140_chi_square",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val cells = docs.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("o"))
      val rowM = cells.groupBy(col("source")).agg(sum(col("o")).as("rm"))
      val colM = cells.groupBy(col("lang")).agg(sum(col("o")).as("cm"))
      val n = docs.agg(count(lit(1)).as("n"))
      val contrib = cells
        .join(broadcast(rowM), "source").join(broadcast(colM), "lang")
        .crossJoin(broadcast(n))
        .withColumn("e", col("rm").cast("double") * col("cm") / col("n"))
        .withColumn("contrib",
          round((col("o") - col("e")) * (col("o") - col("e")) / col("e"), 6))
      contrib.agg(
          max(col("n")).as("n_docs"),
          ((countDistinct(col("source")) - 1)
            * (countDistinct(col("lang")) - 1)).as("df"),
          // round BEFORE the long cast: round(x,6)·10⁶ is integral in
          // value but not in bits, and Spark's cast truncates while
          // DuckDB's rounds — an explicit half-up round on both sides
          // makes the micro-unit integer identical
          (sum(round(col("contrib") * 1e6, 0).cast("long")) / 1e6).as("chi2"),
          max(struct(col("contrib"), col("source"), col("lang"))).as("top"))
        .select(col("n_docs"), col("df"), round(col("chi2"), 6).as("chi2"),
          col("top.source").as("top_source"), col("top.lang").as("top_lang"),
          col("top.contrib").as("top_contrib"))
    },
    Some("""WITH cells AS (SELECT source, lang, count(*) AS o
                           FROM documents GROUP BY 1, 2),
            rm AS (SELECT source, CAST(sum(o) AS BIGINT) AS rm FROM cells GROUP BY 1),
            cm AS (SELECT lang, CAST(sum(o) AS BIGINT) AS cm FROM cells GROUP BY 1),
            n AS (SELECT count(*) AS n FROM documents),
            c AS (SELECT cells.source, cells.lang, o,
                         round((o - CAST(rm AS DOUBLE) * cm / n)
                               * (o - CAST(rm AS DOUBLE) * cm / n)
                               / (CAST(rm AS DOUBLE) * cm / n), 6) AS contrib
                  FROM cells JOIN rm USING (source) JOIN cm USING (lang), n),
            agg AS (SELECT (count(DISTINCT source) - 1)
                             * (count(DISTINCT lang) - 1) AS df,
                           round(CAST(sum(CAST(round(contrib * 1e6, 0) AS BIGINT))
                                 AS DOUBLE) / 1e6, 6) AS chi2,
                           max(struct_pack(contrib := contrib,
                                           source := source,
                                           lang := lang)) AS top
                    FROM c)
            SELECT (SELECT n FROM n) AS n_docs, df, chi2,
                   top.source AS top_source, top.lang AS top_lang,
                   top.contrib AS top_contrib
            FROM agg""")
  )

  /** q141 — exact two-sample Kolmogorov–Smirnov test: the maximum CDF
    * gap between the 'click' and 'purchase' event-value distributions,
    * with the α=0.05 decision. The EXACT drift statistic next to q133's
    * bucketed PSI — PSI sees what the 8-bucket grid sees; KS sees every
    * value, and is the test a data-quality gate runs when two cohorts
    * (A/B arms, two crawls, two labelers) are supposed to be identically
    * distributed.
    *
    * Determinism: per-value counts are exact integers; each CDF gap is
    * one double expression on (cum_a/n_a − cum_b/n_b); the max is an
    * order-free aggregate; the achieving value is the MIN value whose
    * gap equals the max (doubles compare exactly because both engines
    * compute the identical expression on identical integers).
    *
    * Scale notes: one value-keyed count aggregate (map-side combine,
    * |distinct values| groups) — but for a CONTINUOUS value column
    * |distinct values| ≈ |rows|, so the two cumulative CDFs must NOT run
    * through one unpartitioned window over that relation (the r7 cut did,
    * single-tasking the whole relation — ADVICE r7). Both running sums
    * ride ONE Ranks.runningSums pass instead: range-sliced local prefix
    * sums + a k-row broadcast offset relation, the same decomposition as
    * q65 (the decomposition pins its own slice boundaries internally —
    * no pre-materialization needed for its single consumer). Then a
    * 1-row (n_a, n_b) broadcast and two 1-row reductions. */
  private val q141 = GQuery(
    "q141_ks_test",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
      val counts = ev.groupBy(col("value"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("ca"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("cb"))
        .withColumn("_g", lit(0))
      val perValue = Ranks.runningSums(counts, "_g", Seq(col("value")),
        Seq(col("ca") -> "cuma", col("cb") -> "cumb")).drop("_g")
      val totals = ev.agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("na"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("nb"))
      val gaps = perValue.crossJoin(broadcast(totals))
        .withColumn("gap", abs(col("cuma").cast("double") / col("na")
          - col("cumb").cast("double") / col("nb")))
      val dRel = gaps.agg(max(col("gap")).as("d"))
      gaps.crossJoin(broadcast(dRel))
        .filter(col("gap") === col("d"))
        .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
          round(max(col("d")), 6).as("ks_d"),
          min(col("value")).as("at_value"))
        .withColumn("reject_05",
          col("ks_d") > lit(1.358) * sqrt((col("n_a") + col("n_b"))
            / (col("n_a").cast("double") * col("n_b"))))
    },
    Some("""WITH e AS (SELECT event_type, value FROM events
                       WHERE event_type IN ('click', 'purchase')),
            pv AS (SELECT value,
                          count(*) FILTER (WHERE event_type = 'click') AS ca,
                          count(*) FILTER (WHERE event_type = 'purchase') AS cb
                   FROM e GROUP BY value),
            cum AS (SELECT value,
                           CAST(sum(ca) OVER w AS BIGINT) AS cuma,
                           CAST(sum(cb) OVER w AS BIGINT) AS cumb
                    FROM pv
                    WINDOW w AS (ORDER BY value
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
            t AS (SELECT count(*) FILTER (WHERE event_type = 'click') AS na,
                         count(*) FILTER (WHERE event_type = 'purchase') AS nb
                  FROM e),
            g AS (SELECT value,
                         abs(CAST(cuma AS DOUBLE) / na - CAST(cumb AS DOUBLE) / nb)
                           AS gap
                  FROM cum, t),
            dd AS (SELECT max(gap) AS d FROM g)
            SELECT max(na) AS n_a, max(nb) AS n_b,
                   round(max(d), 6) AS ks_d,
                   min(value) AS at_value,
                   round(max(d), 6) > 1.358 * sqrt((max(na) + max(nb))
                     / (CAST(max(na) AS DOUBLE) * max(nb))) AS reject_05
            FROM g, t, dd WHERE gap = d""")
  )

  val all: Seq[GQuery] = Seq(q139, q140, q141)
}
