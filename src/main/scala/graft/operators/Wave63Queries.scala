package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-15 wave 63: q241 — Krippendorff's alpha (multi-annotator,
  * missing labels).
  *
  * q157 prices Cohen's kappa — exactly TWO raters, every item labeled
  * by both. A real labeling run (RLHF preference data, quality audits)
  * looks different: a POOL of annotators, each item labeled by whatever
  * subset got assigned, coverage uneven. Krippendorff's alpha is the
  * standard reliability coefficient for that shape — it handles any
  * number of raters and missing labels by measuring disagreement over
  * PAIRABLE values (items with ≥2 labels), chance-corrected by the
  * pooled label distribution: α = 1 − Do/De.
  *
  * Synthetic annotator pool = the q157 construction widened: three
  * annotators share a latent signal (md5 % 100) plus independent ±10
  * noise at threshold 50; each annotator covers ~70% of items (a
  * second, independent hash), so m_i varies over {0..3} and the
  * missing-data machinery is actually exercised.
  *
  * Exactness: for binary labels the per-item disagreement
  * 2·n_i0·n_i1/(m_i−1) is an INTEGER for every m_i ∈ {2,3} (m=2 →
  * 2·n0·n1 ∈ {0,2}; m=3 → n0·n1 ∈ {0,2}), so Do's numerator sums
  * exactly in longs (`div` — both engines truncate identically on the
  * evenly-divisible operands), and α = 1 − Dsum·(n−1)/(2·n1·n0) needs
  * ONE double division, rounded to 6 — the q157/q143 discipline. A
  * single-sided pool (n1·n0 = 0 → De = 0) emits NULL through the same
  * explicit CASE on both engines.
  *
  * Scale notes (100 TB): a 3-way per-row fan-out (explode of a
  * 3-element literal array — map-only), one groupBy(doc_id) whose
  * groups are ≤3 rows (partial count/sum combine map-side), then a
  * single-row aggregate. The shuffle carries (doc_id, two longs);
  * nothing data-sized sits in any reduce task. */
object Wave63Queries {

  private val Annotators = 3
  private val CoverMod = 10
  private val CoverKeep = 7 // ~70% coverage per annotator

  private def h(col0: org.apache.spark.sql.Column, tag: String) =
    TextOps.shingleHash60(concat(col0.cast("string"), lit(tag)))

  private val q241 = GQuery(
    "q241_krippendorff",
    (s, d) => {
      val items = Tables.documents(s, d).select(col("doc_id"),
          explode(array((1 to Annotators).map(lit): _*)).as("a"))
        .filter(pmod(h(col("doc_id"), ":p") + col("a"), lit(CoverMod))
          < CoverKeep)
        .select(col("doc_id"),
          (pmod(h(col("doc_id"), ":s"), lit(100))
            + pmod(TextOps.shingleHash60(concat(col("doc_id").cast("string"),
              lit(":r"), col("a").cast("string"))), lit(21)) - 10
            >= 50).cast("long").as("l"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("m"), sum(col("l")).as("n1"))
        .filter(col("m") >= 2)
      items.agg(
          count(lit(1)).as("n_items"),
          sum(col("m")).as("n_vals"),
          sum(col("n1")).as("n_pos"),
          sum(expr("(2 * n1 * (m - n1)) div (m - 1)")).as("d_sum"))
        .select(col("n_items"), col("n_vals"), col("n_pos"), col("d_sum"),
          when(col("n_pos") > 0 && col("n_pos") < col("n_vals"),
            // numerator in double: a long*long product here silently
            // wraps in Spark (non-ANSI) at very large corpora where
            // DuckDB would raise — casting d_sum first keeps the one-
            // double-division discipline overflow-free on both engines
            // (exact in double at any fixture scale, < 2^53)
            round(lit(1.0) - (col("d_sum").cast("double") * (col("n_vals") - 1))
              / (lit(2.0) * col("n_pos") * (col("n_vals") - col("n_pos"))),
              6))
            .as("alpha"))
    },
    Some(s"""WITH lab AS (SELECT doc_id, a,
                    (CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':s')), 1, 15)) AS BIGINT) % 100
                     + CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':r', CAST(a AS VARCHAR))), 1, 15)) AS BIGINT) % 21 - 10
                     >= 50) AS l
                  FROM documents, unnest([1, 2, 3]) AS t(a)
                  WHERE (CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':p')), 1, 15)) AS BIGINT) + a)
                        % $CoverMod < $CoverKeep),
          it AS (SELECT doc_id, count(*) AS m,
                        sum(CASE WHEN l THEN 1 ELSE 0 END) AS n1
                 FROM lab GROUP BY doc_id HAVING count(*) >= 2),
          agg AS (SELECT count(*) AS n_items,
                         CAST(sum(m) AS BIGINT) AS n_vals,
                         CAST(sum(n1) AS BIGINT) AS n_pos,
                         CAST(sum((2 * n1 * (m - n1)) // (m - 1)) AS BIGINT)
                           AS d_sum
                  FROM it)
          SELECT n_items, n_vals, n_pos, d_sum,
                 CASE WHEN n_pos > 0 AND n_pos < n_vals
                      THEN round(1.0 - (CAST(d_sum AS DOUBLE) * (n_vals - 1))
                             / (2.0 * n_pos * (n_vals - n_pos)), 6)
                 END AS alpha
          FROM agg""")
  )

  val all: Seq[GQuery] = Seq(q241)
}
