package graft.operators

import graft.GQuery
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 wave 31: dial-pricing and behavioural census sheets —
  *
  *   - q207 SimHash threshold curve: the hamming-distance histogram of
  *     the q32 candidate pairs — the sheet that prices q32's
  *     `hamming <= 30` acceptance cut the way q146 prices MinHash
  *     bands and q173 prices IVF probes (a threshold nobody measured
  *     is a threshold somebody guessed);
  *   - q208 negative-sampling table: the word2vec unigram^0.75
  *     proposal distribution over the corpus vocabulary — head tokens'
  *     raw vs flattened sampling mass side by side (the flattening IS
  *     the point: ^0.75 lifts the tail a contrastive objective would
  *     otherwise never sample);
  *   - q209 user burstiness census: per-user inter-event-gap
  *     coefficient of variation, banded EXACTLY by cross-multiplied
  *     integers (CV² ≤ t ⟺ n·Σg² ≤ (t+1)·(Σg)²) — bot/burst detection
  *     upstream of the q153 contribution cap (a capped bot still
  *     poisons its admitted rows; a CV-flagged one is quarantined).
  */
object Wave31Queries {

  /** q207 — SimHash threshold curve: decile histogram (hamming DIV 10)
    * of the DISTINCT candidate-pair hamming distances, with cumulative
    * counts — read the acceptance volume of any threshold straight off
    * the cum column. Shares [[DedupQueries.simhashCandidatePairs]]
    * (one kernel, one band geometry) so the sheet prices EXACTLY the
    * pairs q32 sees.
    *
    * Determinism: hamming is an exact integer (codegen bit_count over
    * md5-derived signatures); deciles are integer floor division; the
    * cumulative window runs over the ≤ 13-row decile aggregate.
    *
    * Scale notes: inherits q32's shape (map-only signature, adaptive
    * band buckets, capped in-bucket pairs) plus one tiny aggregate —
    * the histogram adds nothing corpus-sized. */
  private val q207 = GQuery(
    "q207_simhash_threshold",
    (s, d) => {
      val w = Window.orderBy(col("hamming_decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      DedupQueries.simhashCandidatePairs(s, d)
        .groupBy(expr("CAST(hamming DIV 10 AS INT)").as("hamming_decile"))
        .agg(count(lit(1)).as("n_pairs"))
        .withColumn("cum_pairs", sum(col("n_pairs")).over(w))
        .orderBy(col("hamming_decile"))
    },
    Some(DedupQueries.SimhashPairsSql +
      """ SELECT hamming_decile, n_pairs,
                 CAST(sum(n_pairs) OVER (ORDER BY hamming_decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_pairs
          FROM (SELECT CAST(hamming // 10 AS INTEGER) AS hamming_decile,
                       count(*) AS n_pairs
                FROM pairs GROUP BY 1) h
          ORDER BY hamming_decile""")
  )

  private val NegTopK = 20

  /** q208 — negative-sampling proposal table: per token, the raw count
    * share vs the unigram^0.75 share (both exact integer ppm over
    * integerized weights — w = round(√(cnt·√cnt)·1000), the q169
    * integerization applied to the word2vec exponent), top-20 head
    * tokens published. The ^0.75 flattening is what a contrastive /
    * negative-sampling objective actually draws from (Mikolov 2013);
    * the sheet shows exactly how much mass the head cedes to the tail.
    *
    * Determinism: counts exact; w is one sqrt chain rounded to an
    * integer grid (IEEE-identical in both engines — the q169
    * precedent); both ppm columns are integer floor divisions over
    * exact sums.
    *
    * Scale notes: one explode → token aggregate with map-side combine
    * (the q57 shape); the two normalizers are grouping-free aggregates
    * over the vocab relation (broadcast 1-row); top-20 rides
    * TakeOrdered heaps. Nothing beyond the vocab relation shuffles. */
  private val q208 = GQuery(
    "q208_negative_sampling",
    (s, d) => {
      val c = graft.sources.Io.fanOut(Tables.documents(s, d).select(col("text")))
        .select(explode(graft.functions.TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .withColumn("w075",
          round(sqrt(col("cnt") * sqrt(col("cnt"))) * 1000, 0).cast("bigint"))
      val t = c.agg(sum(col("cnt")).as("tot"), sum(col("w075")).as("sw"))
      c.crossJoin(broadcast(t))
        .select(col("token"), col("cnt"),
          expr("cnt * 1000000 DIV tot").as("raw_ppm"), col("w075"),
          expr("w075 * 1000000 DIV sw").as("samp_ppm"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(NegTopK)
    },
    Some(s"""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
                          FROM documents),
          c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
          w AS (SELECT token, cnt,
                  CAST(round(sqrt(cnt * sqrt(cnt)) * 1000, 0) AS BIGINT) AS w075
                FROM c),
          t AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot,
                       CAST(sum(w075) AS BIGINT) AS sw FROM w)
          SELECT token, cnt,
                 CAST(cnt * 1000000 // t.tot AS BIGINT) AS raw_ppm, w075,
                 CAST(w075 * 1000000 // t.sw AS BIGINT) AS samp_ppm
          FROM w, t ORDER BY cnt DESC, token LIMIT $NegTopK""")
  )

  /** q209 — user burstiness census: per user with ≥ 2 events, the
    * inter-event-gap (floor-seconds grid) coefficient of variation,
    * banded with NO floating point in any band decision:
    * CV² = n·Σg²/(Σg)² − 1, so CV ≤ 1 ⟺ n·Σg² ≤ 2·(Σg)² and
    * CV ≤ 2 ⟺ n·Σg² ≤ 5·(Σg)² — exact cross-multiplied longs (the
    * q200/q204 rule style). CV ≈ 1 is Poisson arrival; CV ≫ 1 is
    * machine burst traffic — the behavioural flag that belongs BEFORE
    * q153's contribution cap (capping a bot bounds its volume, not its
    * poison). max_cv2 is the worst user's CV², one division + a fixed
    * literal chain (both engines identical IEEE ops).
    *
    * Determinism: gaps are exact floor-second longs; the gap MULTISET
    * per user is tie-order-independent (sorted timestamps); every band
    * count is an integer comparison. Exactness envelope: n·Σg² ≤
    * n·(Σg)² needs n·span² < 2^63 — seconds grid, fine to 10^5-second
    * spans × 10^8-event users.
    *
    * Scale notes: one lag window partitioned by user_id (key
    * cardinality scales with data — the sweep-sanctioned shape), one
    * per-user aggregate with map-side combine, one 1-row census. */
  private val q209 = GQuery(
    "q209_user_burstiness",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val gaps = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("sec", col("ts").cast("long"))
        .withColumn("prev", lag(col("sec"), 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("user_id"), (col("sec") - col("prev")).as("g"))
      val per = gaps.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("g")).as("sg"),
          sum(col("g") * col("g")).as("sg2"))
      per.agg(count(lit(1)).as("n_users"),
          sum(when(col("sg") === 0, 1L).otherwise(0L)).as("zero_span_users"),
          sum(when(col("sg") > 0
            && col("n") * col("sg2") <= lit(2) * col("sg") * col("sg"), 1L)
            .otherwise(0L)).as("cv_le_1"),
          sum(when(col("sg") > 0
            && col("n") * col("sg2") > lit(2) * col("sg") * col("sg")
            && col("n") * col("sg2") <= lit(5) * col("sg") * col("sg"), 1L)
            .otherwise(0L)).as("cv_1_2"),
          sum(when(col("sg") > 0
            && col("n") * col("sg2") > lit(5) * col("sg") * col("sg"), 1L)
            .otherwise(0L)).as("cv_gt_2"),
          max(when(col("sg") > 0,
            round((col("n") * col("sg2"))
              / (col("sg") * col("sg")).cast("double") - 1.0, 6)))
            .as("max_cv2"))
    },
    Some("""WITH e AS (SELECT user_id, epoch_us(ts) // 1000000 AS sec,
                              event_id
                       FROM events),
          g AS (SELECT user_id,
                  sec - lag(sec) OVER (PARTITION BY user_id
                                       ORDER BY sec, event_id) AS g
                FROM e),
          p AS (SELECT user_id, count(*) AS n,
                       CAST(sum(g) AS BIGINT) AS sg,
                       CAST(sum(g*g) AS BIGINT) AS sg2
                FROM g WHERE g IS NOT NULL GROUP BY user_id)
          SELECT CAST(count(*) AS BIGINT) AS n_users,
                 CAST(sum(CASE WHEN sg = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS zero_span_users,
                 CAST(sum(CASE WHEN sg > 0 AND n*sg2 <= 2*sg*sg
                   THEN 1 ELSE 0 END) AS BIGINT) AS cv_le_1,
                 CAST(sum(CASE WHEN sg > 0 AND n*sg2 > 2*sg*sg
                   AND n*sg2 <= 5*sg*sg THEN 1 ELSE 0 END) AS BIGINT)
                   AS cv_1_2,
                 CAST(sum(CASE WHEN sg > 0 AND n*sg2 > 5*sg*sg
                   THEN 1 ELSE 0 END) AS BIGINT) AS cv_gt_2,
                 max(CASE WHEN sg > 0 THEN
                   round((n*sg2) / CAST(sg*sg AS DOUBLE) - 1.0, 6) END)
                   AS max_cv2
          FROM p""")
  )

  val all: Seq[GQuery] = Seq(q207, q208, q209)
}
