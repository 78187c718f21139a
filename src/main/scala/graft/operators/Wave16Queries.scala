package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-8 wave 16: label/model quality control — inter-annotator
  * agreement (Cohen's kappa, q157) and classifier calibration (reliability
  * buckets + Brier score, q158). The QA queries that sit between a
  * labeling/scoring run and the decision to trust its outputs. Both are
  * one map pass + a tiny-group aggregate; annotators and outcomes are
  * synthesized deterministically from md5 (the q148/q156 synthetic-truth
  * precedent) so the fixture knows ground truth and the oracle can check
  * every field.
  */
object Wave16Queries {

  private def h(col0: org.apache.spark.sql.Column, tag: String) =
    TextOps.shingleHash60(concat(col0.cast("string"), lit(tag)))

  /** q157 — inter-annotator agreement (Cohen's kappa): two synthetic
    * annotators label each document good/bad from a shared latent signal
    * plus independent noise (signal = md5 %% 100, noise = ±10, threshold
    * 50 — so they disagree only near the boundary, like real raters).
    * Kappa corrects raw agreement for chance: po = observed agreement,
    * pe = Σ marginal products, κ = (po − pe)/(1 − pe). This is the gate
    * a labeling pipeline runs before training on the labels at all —
    * raw agreement of 0.8 can be κ ≈ 0 when the base rate is skewed,
    * which is exactly the trap the correction exists for.
    *
    * Determinism: the confusion matrix is exact longs; po/pe/κ are the
    * same fixed double formula over those longs on both engines, each
    * output rounded to 6.
    *
    * Scale notes: one map pass (two hashes + compares) into a
    * grouping-free aggregate with 4 conditional-count partials — the
    * cheapest shape in the registry; at any corpus size the shuffle
    * carries 4 longs per task. */
  private val q157 = GQuery(
    "q157_label_agreement",
    (s, d) => {
      val labeled = Tables.documents(s, d).select(
        (pmod(h(col("doc_id"), ":s"), lit(100))
          + pmod(h(col("doc_id"), ":a1"), lit(21)) - 10 >= 50).as("l1"),
        (pmod(h(col("doc_id"), ":s"), lit(100))
          + pmod(h(col("doc_id"), ":a2"), lit(21)) - 10 >= 50).as("l2"))
      labeled.agg(count(lit(1)).as("n"),
        sum(when(col("l1") && col("l2"), 1L).otherwise(0L)).as("n11"),
        sum(when(col("l1") && !col("l2"), 1L).otherwise(0L)).as("n10"),
        sum(when(!col("l1") && col("l2"), 1L).otherwise(0L)).as("n01"),
        sum(when(!col("l1") && !col("l2"), 1L).otherwise(0L)).as("n00"))
        .withColumn("po", (col("n11") + col("n00")) / col("n"))
        .withColumn("pe",
          ((col("n11") + col("n10")) / col("n"))
            * ((col("n11") + col("n01")) / col("n"))
            + ((col("n01") + col("n00")) / col("n"))
            * ((col("n10") + col("n00")) / col("n")))
        // degenerate-corpus guard (single-sided labels → pe = 1):
        // kappa is undefined, not a divide-by-zero — both engines emit
        // NULL through the same explicit CASE (the q143 z-test
        // precedent), so the hash gate cannot depend on either
        // engine's x/0 convention
        .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
          round(col("po"), 6).as("po"), round(col("pe"), 6).as("pe"),
          when(col("pe") =!= 1.0,
            round((col("po") - col("pe")) / (lit(1.0) - col("pe")), 6))
            .as("kappa"))
    },
    Some("""WITH l AS (SELECT
                  (CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':s')), 1, 15)) AS BIGINT) % 100
                   + CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':a1')), 1, 15)) AS BIGINT) % 21 - 10) >= 50 AS l1,
                  (CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':s')), 1, 15)) AS BIGINT) % 100
                   + CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':a2')), 1, 15)) AS BIGINT) % 21 - 10) >= 50 AS l2
                FROM documents),
          c AS (SELECT count(*) AS n,
                       sum(CASE WHEN l1 AND l2 THEN 1 ELSE 0 END) AS n11,
                       sum(CASE WHEN l1 AND NOT l2 THEN 1 ELSE 0 END) AS n10,
                       sum(CASE WHEN NOT l1 AND l2 THEN 1 ELSE 0 END) AS n01,
                       sum(CASE WHEN NOT l1 AND NOT l2 THEN 1 ELSE 0 END) AS n00
                FROM l),
          p AS (SELECT *,
                       (n11 + n00) / CAST(n AS DOUBLE) AS po,
                       ((n11 + n10) / CAST(n AS DOUBLE))
                         * ((n11 + n01) / CAST(n AS DOUBLE))
                       + ((n01 + n00) / CAST(n AS DOUBLE))
                         * ((n10 + n00) / CAST(n AS DOUBLE)) AS pe
                FROM c)
          SELECT CAST(n AS BIGINT) AS n, CAST(n11 AS BIGINT) AS n11,
                 CAST(n10 AS BIGINT) AS n10, CAST(n01 AS BIGINT) AS n01,
                 CAST(n00 AS BIGINT) AS n00,
                 round(po, 6) AS po, round(pe, 6) AS pe,
                 CASE WHEN pe <> 1.0
                      THEN round((po - pe) / (1.0 - pe), 6) END AS kappa
          FROM p""")
  )

  /** q158 — classifier calibration audit: reliability table + per-bucket
    * Brier score for a quality-filter model's confidence column. The
    * model's score lives on the milli grid (p = h %% 1000 / 1000) and
    * the outcome is drawn with probability p from an independent hash —
    * calibrated BY CONSTRUCTION, so the audit's job is to measure how
    * far finite-sample noise moves the observed rate from the diagonal
    * (and a real model's table reads the same way: bucket i should
    * observe rate ≈ its mean confidence; a bucket far off the diagonal
    * is where the filter lies about its certainty). Brier stays exact:
    * per-row (p − y)² on the milli grid is the INTEGER
    * (p_milli − 1000·y)², summed exactly, divided once at the end.
    *
    * Determinism: all sums are exact longs; mean_p/obs_rate/gap/brier
    * are fixed per-bucket divisions rounded to 6.
    *
    * Scale notes: one map pass into a 10-group aggregate with map-side
    * combine; nothing data-sized survives the first aggregate. */
  private val q158 = GQuery(
    "q158_score_calibration",
    (s, d) => {
      val scored = Tables.documents(s, d).select(
        pmod(h(col("doc_id"), ":p"), lit(1000)).as("p_milli"),
        when(pmod(h(col("doc_id"), ":y"), lit(1000))
          < pmod(h(col("doc_id"), ":p"), lit(1000)), 1L).otherwise(0L).as("y"))
      scored
        .groupBy((col("p_milli") / 100).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("p_milli")).as("sp"),
          sum(col("y")).as("sy"),
          sum((col("p_milli") - col("y") * 1000L)
            * (col("p_milli") - col("y") * 1000L)).as("sq"))
        .select(col("bucket"), col("n"),
          round(col("sp") / (col("n") * 1000.0), 6).as("mean_p"),
          round(col("sy") / col("n"), 6).as("obs_rate"),
          round(col("sp") / (col("n") * 1000.0) - col("sy") / col("n"), 6)
            .as("gap"),
          round(col("sq") / (col("n") * 1000000.0), 6).as("brier"))
        .orderBy(col("bucket"))
    },
    Some("""WITH s AS (SELECT
                  CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':p')), 1, 15)) AS BIGINT) % 1000 AS p_milli,
                  CASE WHEN CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':y')), 1, 15)) AS BIGINT) % 1000
                            < CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':p')), 1, 15)) AS BIGINT) % 1000
                       THEN 1 ELSE 0 END AS y
                FROM documents),
          b AS (SELECT CAST(p_milli // 100 AS INTEGER) AS bucket,
                       count(*) AS n, sum(p_milli) AS sp, sum(y) AS sy,
                       sum((p_milli - 1000 * y) * (p_milli - 1000 * y)) AS sq
                FROM s GROUP BY 1)
          SELECT bucket, CAST(n AS BIGINT) AS n,
                 round(sp / (n * 1000.0), 6) AS mean_p,
                 round(sy / CAST(n AS DOUBLE), 6) AS obs_rate,
                 round(sp / (n * 1000.0) - sy / CAST(n AS DOUBLE), 6) AS gap,
                 round(sq / (n * 1000000.0), 6) AS brier
          FROM b ORDER BY bucket""")
  )

  val all: Seq[GQuery] = Seq(q157, q158)
}
