package graft.operators

import graft.{Cols, GQuery}
import graft.functions.TextOps
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 wave 14: the privacy/efficiency audits a training-data
  * pipeline runs before release — k-anonymity risk measurement over
  * quasi-identifiers (q152), user-level contribution bounding, the
  * differential-privacy prep primitive (q153), and the padding-waste
  * audit that justifies length-bucketed batch scheduling (q154). All
  * three are map + small-aggregate shapes: nothing data-sized ever
  * crosses a single task, and every output is a fixed handful of rows.
  */
object Wave14Queries {

  /** k-anonymity risk thresholds a release review actually asks about. */
  private val KThresholds = Seq(2, 5, 10)

  /** q152 — k-anonymity audit: group the customer table by its
    * quasi-identifier tuple (market segment, nation, account-balance
    * kilobucket) and measure re-identification risk — for each threshold
    * k ∈ {2,5,10}, how many equivalence classes are smaller than k and
    * what fraction of ROWS sits in them. A class of size 1 is a unique
    * individual; the rows_lt_2 count is exactly the population a linkage
    * attack can single out. This is the audit run before any "anonymized"
    * table ships, and the generalization loop (coarsen a QI column,
    * re-run) iterates on precisely this query.
    *
    * Determinism: every metric is an integer count except the three
    * fractions, each one rounded division of two exact longs.
    *
    * Scale notes: one groupBy on the QI tuple (map-side combine; the
    * result relation is class-count-sized, not row-sized) followed by a
    * grouping-free 1-row reduction. The same two-phase shape at 10^11
    * rows — risk concentrates in the class-size DISTRIBUTION, which is
    * exactly what survives the first aggregate. */
  private val q152 = GQuery(
    "q152_k_anonymity",
    (s, d) => {
      val classes = Tables.customer(s, d)
        .groupBy(col("c_mktsegment"), col("c_nationkey"),
          floor(col("c_acctbal") / 1000d).cast("bigint").as("kb"))
        .agg(count(lit(1)).as("k"))
      val aggs = Seq(sum(col("k")).as("n_rows"),
        count(lit(1)).as("n_classes"), min(col("k")).as("min_k")) ++
        KThresholds.flatMap(t => Seq(
          sum(when(col("k") < t, 1L).otherwise(0L)).as(s"classes_lt_$t"),
          sum(when(col("k") < t, col("k")).otherwise(0L)).as(s"rows_lt_$t")))
      classes.agg(aggs.head, aggs.tail: _*)
        .select(col("n_rows") +: col("n_classes") +: col("min_k") +:
          KThresholds.flatMap(t => Seq(
            col(s"classes_lt_$t"), col(s"rows_lt_$t"),
            round(col(s"rows_lt_$t") / col("n_rows"), 6).as(s"frac_lt_$t"))): _*)
    },
    Some(s"""WITH c AS (SELECT c_mktsegment, c_nationkey,
                     CAST(floor(c_acctbal / 1000) AS BIGINT) AS kb,
                     count(*) AS k
              FROM customer GROUP BY 1, 2, 3)
          SELECT CAST(sum(k) AS BIGINT) AS n_rows,
                 CAST(count(*) AS BIGINT) AS n_classes,
                 CAST(min(k) AS BIGINT) AS min_k,
                 ${KThresholds.map(t =>
                   s"""CAST(sum(CASE WHEN k < $t THEN 1 ELSE 0 END) AS BIGINT) AS classes_lt_$t,
                       CAST(sum(CASE WHEN k < $t THEN k ELSE 0 END) AS BIGINT) AS rows_lt_$t,
                       round(CAST(sum(CASE WHEN k < $t THEN k ELSE 0 END) AS DOUBLE)
                             / sum(k), 6) AS frac_lt_$t""").mkString(", ")}
          FROM c""")
  )

  /** Per-user contribution cap — the L1-sensitivity bound. */
  val ContributionCap = 20

  /** q153 — user-level contribution bounding: keep each user's first
    * [[ContributionCap]] events (by event time, event_id tie-break) and
    * report, per event type, what the cap did to counts and value sums.
    * This is THE preprocessing step of user-level differential privacy —
    * after it, one user can change any released aggregate by at most C
    * rows, so calibrated noise has a finite sensitivity to scale to —
    * and independently the dominant-contributor guard a crawl pipeline
    * applies before per-source statistics (one bot account no longer
    * owns the distribution). The kept_frac column is the utility price
    * of the bound, read directly off the audit.
    *
    * Determinism: counts are exact longs; value sums accumulate in
    * DECIMAL(18,2) (the events fixture's value precision — Cols.dec2)
    * so they are order-free; kept_frac is one rounded division. A type
    * with no admitted rows sums to NULL on both engines (no-ELSE CASE).
    *
    * Scale notes: ONE row_number window partitioned by user_id — state
    * bounded by the per-user event count, the shape that hash-shuffles
    * clean at any user cardinality (no global window anywhere) — then a
    * type-keyed aggregate with map-side combine over a types-sized
    * result. The streaming twin (s22, StreamOps.contributionCapStream)
    * maintains the same admission rule with one counter per user. */
  private val q153 = GQuery(
    "q153_contribution_cap",
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_raw"),
          sum(when(col("rn") <= ContributionCap, 1L).otherwise(0L)).as("n_capped"),
          Cols.dsum2(col("value")).as("sum_raw"),
          sum(when(col("rn") <= ContributionCap, Cols.dec2(col("value"))))
            .cast("double").as("sum_capped"))
        .select(col("event_type"), col("n_raw"), col("n_capped"),
          round(col("n_capped") / col("n_raw"), 6).as("kept_frac"),
          col("sum_raw"), col("sum_capped"))
        .orderBy(col("event_type")),
    Some(s"""WITH e AS (SELECT event_type, value,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS rn
              FROM events)
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n_raw,
                 CAST(sum(CASE WHEN rn <= $ContributionCap THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_capped,
                 round(CAST(sum(CASE WHEN rn <= $ContributionCap THEN 1 ELSE 0 END)
                   AS DOUBLE) / count(*), 6) AS kept_frac,
                 CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_raw,
                 CAST(sum(CASE WHEN rn <= $ContributionCap
                   THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_capped
          FROM e GROUP BY 1 ORDER BY 1""")
  )

  /** q154 — padding-waste audit for length-bucketed batching: every
    * fixed-shape training batch pads each sequence to its batch's max
    * length, so the padding bill depends on how batches are FORMED.
    * Compare the two canonical strategies on the document corpus's
    * whitespace-token lengths: one global pool (every batch pads to the
    * corpus max — the worst case any random batching converges to) vs
    * power-of-two length buckets (batch only within a bucket; bucket id
    * is the token count's binary bit-length, so bucket max ≤ 2× bucket
    * min and per-token waste is bounded below 50% by construction).
    * The savings_frac column is the compute a scheduler buys by sorting
    * sequences into buckets before batching — measured on the actual
    * length distribution, which is the number that decides the batching
    * design.
    *
    * Determinism: bucket id via string length of bin(L) — INTEGER
    * bit-length on both engines (the r7 ADVICE lesson: no float log2
    * anywhere); all wastes are exact integer arithmetic; the single
    * fraction is one rounded division, NULL iff the global waste is 0
    * (degenerate equal-length corpus) on both engines.
    *
    * Scale notes: one map pass (token count + bit-length), one
    * ≤64-group aggregate with map-side combine, one 1-row reduction.
    * Products stay in long range: max_len·n_docs ≤ 2^20·2^43 at any
    * conceivable corpus. */
  private val q154 = GQuery(
    "q154_padding_waste",
    (s, d) => {
      val buckets = Tables.documents(s, d)
        .select(size(TextOps.tokens(col("text"))).cast("bigint").as("len"))
        .groupBy(length(bin(col("len"))).as("bkt"))
        .agg(count(lit(1)).as("n"), sum(col("len")).as("tok"),
          max(col("len")).as("m"))
      buckets
        .agg(sum(col("n")).as("n_docs"), sum(col("tok")).as("total_tokens"),
          count(lit(1)).as("n_buckets"), max(col("m")).as("max_len"),
          sum(col("m") * col("n") - col("tok")).as("waste_bucketed"))
        .withColumn("waste_global",
          col("max_len") * col("n_docs") - col("total_tokens"))
        .select(col("n_docs"), col("total_tokens"), col("n_buckets"),
          col("max_len"), col("waste_global"), col("waste_bucketed"),
          when(col("waste_global") === 0L, lit(null).cast("double"))
            .otherwise(round(lit(1.0)
              - col("waste_bucketed") / col("waste_global"), 6))
            .as("savings_frac"))
    },
    Some("""WITH l AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS len
                  FROM documents),
          b AS (SELECT length(bin(len)) AS bkt, count(*) AS n,
                       sum(len) AS tok, max(len) AS m
                FROM l GROUP BY 1),
          t AS (SELECT CAST(sum(n) AS BIGINT) AS n_docs,
                       CAST(sum(tok) AS BIGINT) AS total_tokens,
                       CAST(count(*) AS BIGINT) AS n_buckets,
                       CAST(max(m) AS BIGINT) AS max_len,
                       CAST(sum(m * n - tok) AS BIGINT) AS waste_bucketed
                FROM b)
          SELECT n_docs, total_tokens, n_buckets, max_len,
                 max_len * n_docs - total_tokens AS waste_global,
                 waste_bucketed,
                 CASE WHEN max_len * n_docs - total_tokens = 0 THEN NULL
                      ELSE round(1.0 - CAST(waste_bucketed AS DOUBLE)
                             / (max_len * n_docs - total_tokens), 6)
                 END AS savings_frac
          FROM t""")
  )

  val all: Seq[GQuery] = Seq(q152, q153, q154)
}
