package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 wave 15: mixture design — the token-budget allocator that
  * turns per-source statistics into a training mixture (q155). Like the
  * rest of the curation family it reduces the corpus to a sources-sized
  * relation FIRST and runs all planning arithmetic there.
  */
object Wave15Queries {

  /** Epoch cap: no source is repeated more than this many times. */
  val MaxEpochs = 2

  /** q155 — token-budget allocation: given a training budget of half the
    * corpus tokens, fund sources greedily in priority order (chars per
    * token — a crude lexical-density proxy; swap in any q34-style score
    * without touching the mechanics), each up to [[MaxEpochs]] epochs of
    * its own tokens. This is the mixture-design step between corpus
    * statistics and the actual sampler (q95/q113 consume its output
    * shape): upweight what you value, cap repetition, spend exactly the
    * budget. The closed form is exact because greedy funding is
    * sequential: a source gets min(cap, budget − Σ caps of everything
    * funded before it), clamped at zero once the budget is spent.
    *
    * Determinism: tokens/chars/caps/allocations are exact longs;
    * priority is ONE division of two exact longs rounded to 6 (ordering
    * uses the rounded value with a source-name tie-break, so both
    * engines rank identically even at equal densities); epochs is one
    * rounded division.
    *
    * Scale notes: one source-keyed aggregate (map-side combine) reduces
    * the corpus to a |sources|-sized relation; every window after that
    * is over the AGGREGATE (the sweep-sanctioned above-an-Aggregate
    * shape — thousands of rows at worst, never the corpus). */
  private val q155 = GQuery(
    "q155_token_budget",
    (s, d) => {
      val src = Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(TextOps.tokens(col("text"))).cast("bigint")).as("tokens"),
          sum(col("n_chars")).as("chars"))
        .withColumn("priority", round(col("chars") / col("tokens"), 6))
        .withColumn("cap", col("tokens") * MaxEpochs)
      val order = Window.orderBy(col("priority").desc, col("source"))
      val funded = src
        .withColumn("budget",
          expr("sum(tokens) OVER () DIV 2"))
        .withColumn("cum_before", coalesce(
          sum(col("cap")).over(order.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
        .withColumn("alloc_tokens",
          greatest(lit(0L), least(col("cap"), col("budget") - col("cum_before"))))
      funded.select(col("source"), col("n_docs"), col("tokens"),
        col("priority"), col("alloc_tokens"),
        round(col("alloc_tokens") / col("tokens"), 4).as("epochs"))
        .orderBy(col("priority").desc, col("source"))
    },
    Some(s"""WITH s AS (SELECT source, count(*) AS n_docs,
                     CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens,
                     CAST(sum(n_chars) AS BIGINT) AS chars
              FROM documents GROUP BY 1),
          p AS (SELECT source, n_docs, tokens,
                       round(CAST(chars AS DOUBLE) / tokens, 6) AS priority,
                       $MaxEpochs * tokens AS cap
                FROM s),
          c AS (SELECT *,
                       (sum(tokens) OVER ()) // 2 AS budget,
                       coalesce(sum(cap) OVER (ORDER BY priority DESC, source
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                         AS cum_before
                FROM p)
          SELECT source, n_docs, tokens, priority,
                 CAST(greatest(0, least(cap, budget - cum_before)) AS BIGINT)
                   AS alloc_tokens,
                 round(CAST(greatest(0, least(cap, budget - cum_before)) AS DOUBLE)
                       / tokens, 4) AS epochs
          FROM c ORDER BY priority DESC, source""")
  )

  /** FS score thresholds: above Hi → match, (Lo, Hi] → clerical-review
    * band, ≤ Lo → non-match. */
  private val ScoreHi = 5.0
  private val ScoreLo = 0.0
  /** Per-field agreement probabilities among TRUE matches — in
    * production EM-estimated; here the synthetic perturbation model's
    * ground truth (typo rate 1/10, segment loss 1/7, nation drift 1/5),
    * which is exactly what a trained model would converge to. */
  private val MName = 9.0 / 10
  private val MSeg = 6.0 / 7
  private val MNat = 4.0 / 5

  /** q156 — probabilistic record linkage (Fellegi–Sunter): link the
    * customer table against a synthesized "registration feed" replica of
    * itself whose fields are deterministically dirtied (md5-keyed: 1/10
    * name typos, 1/7 segments lost to UNKNOWN, 1/5 nations drifted —
    * the q148 synthesized-snapshot precedent), WITHOUT using the key.
    * Candidates come from conjunctive blocking (name suffix-4 digits +
    * account-balance kilobucket, both typo-stable); each candidate pair
    * scores Σ_field ln(m/u) on agreement, ln((1−m)/(1−u)) on
    * disagreement — agreement on a RARE value (u_name ≈ 1/n) is worth
    * ln(0.9·n), agreement on a 5-value segment almost nothing, which is
    * the entire insight of the FS model. u-probabilities are measured
    * from the data (Σ count²/n² per field — exact integer arithmetic
    * until one division). The output is the linkage quality sheet:
    * match/review/non-match counts at the (5, 0] thresholds plus
    * key-verified precision and recall — readable only because the
    * fixture knows ground truth; production reads the same sheet from a
    * labeled sample. Complements q122: edit-distance similarity vs
    * field-evidence probability are different operators.
    *
    * Determinism: all counts are exact longs; scores are a fixed sum of
    * three ln terms over identical doubles on both engines (the
    * q101/q133 ln-parity precedent); precision/recall are single
    * rounded divisions.
    *
    * Scale notes: candidate generation is one equi-join on the blocking
    * key — never a cross join; per-block cost |A_b|·|B_b| is the knob
    * conjunctive blocking controls, and the suffix width IS
    * corpus-adaptive: right-k where 10^k ∝ n at constant expected
    * block occupancy [[BlkOcc]] (Geometry.adaptiveDigits, the same
    * statistics-driven-geometry discipline as q41's LSH band bits —
    * driver-side parquet-metadata count, exact integer arithmetic,
    * SQL-mirrored so both engines always pick the same width; the
    * floor pins every corpus ≤ 10^4·occ rows to the historical
    * right-4 fixture geometry). The three u-statistics and the row
    * count are 1-row broadcast relations. */
  private val BlkOcc = 10L
  private val BlkFloor = 4
  private val BlkCap = 9
  private val q156 = GQuery(
    "q156_record_linkage",
    (s, d) => {
      val cust = Tables.customer(s, d)
      val n = cust.count() // parquet metadata scalar
      val bw = graft.util.Geometry.adaptiveDigits(n, BlkOcc, BlkFloor, BlkCap)
      val clean = cust.select(col("c_custkey").as("key_a"),
        col("c_name").as("name_a"), col("c_mktsegment").as("seg_a"),
        col("c_nationkey").as("nat_a"),
        floor(col("c_acctbal") / 1000d).cast("bigint").as("kb"),
        expr(s"right(c_name, $bw)").as("blk"))
      val dirty = cust
        .withColumn("h", TextOps.shingleHash60(
          concat(col("c_custkey").cast("string"), lit(":lk"))))
        .select(col("c_custkey").as("key_b"),
          when(pmod(col("h"), lit(10)) === 0,
            concat(lit("Custmoer"), expr("substring(c_name, 9)")))
            .otherwise(col("c_name")).as("name_b"),
          when(pmod(col("h"), lit(7)) === 0, lit("UNKNOWN"))
            .otherwise(col("c_mktsegment")).as("seg_b"),
          when(pmod(col("h"), lit(5)) === 0, pmod(col("c_nationkey") + 1, lit(25)))
            .otherwise(col("c_nationkey")).as("nat_b"),
          floor(col("c_acctbal") / 1000d).cast("bigint").as("kb"),
          expr(s"right(c_name, $bw)").as("blk"))
      def uStat(c: String, out: String) = clean
        .groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .agg((sum(col("cnt") * col("cnt")).cast("double")
          / (sum(col("cnt")) * sum(col("cnt")))).as(out))
      def w(agree: org.apache.spark.sql.Column, m: Double,
          u: org.apache.spark.sql.Column) =
        when(agree, log(lit(m) / u)).otherwise(log(lit(1 - m) / (lit(1.0) - u)))
      val cand = clean.join(dirty, Seq("blk", "kb"))
        .crossJoin(broadcast(uStat("name_a", "u_name")))
        .crossJoin(broadcast(uStat("seg_a", "u_seg")))
        .crossJoin(broadcast(uStat("nat_a", "u_nat")))
        .withColumn("score",
          w(col("name_a") === col("name_b"), MName, col("u_name"))
            + w(col("seg_a") === col("seg_b"), MSeg, col("u_seg"))
            + w(col("nat_a") === col("nat_b"), MNat, col("u_nat")))
      cand
        .agg(count(lit(1)).as("n_cand"),
          sum(when(col("score") > ScoreHi, 1L).otherwise(0L)).as("n_match"),
          sum(when(col("score") > ScoreLo && col("score") <= ScoreHi, 1L)
            .otherwise(0L)).as("n_review"),
          sum(when(col("score") <= ScoreLo, 1L).otherwise(0L)).as("n_nonmatch"),
          sum(when(col("key_a") === col("key_b"), 1L).otherwise(0L))
            .as("true_in_cand"),
          sum(when(col("key_a") === col("key_b") && col("score") > ScoreHi, 1L)
            .otherwise(0L)).as("true_matched"))
        .crossJoin(broadcast(clean.agg(count(lit(1)).as("n_clean"))))
        // degenerate-corpus guard (no pair scored above ScoreHi →
        // n_match = 0): precision is undefined, not a divide-by-zero —
        // both engines emit NULL through the same explicit CASE (the
        // q143 z-test precedent), so the hash gate cannot depend on
        // either engine's x/0 convention
        .select(col("n_clean"), col("n_cand"), col("n_match"), col("n_review"),
          col("n_nonmatch"), col("true_in_cand"), col("true_matched"),
          when(col("n_match") > 0,
            round(col("true_matched") / col("n_match"), 6)).as("precision"),
          round(col("true_matched") / col("n_clean"), 6).as("recall"))
    },
    Some(s"""WITH bc AS (SELECT ${graft.util.Geometry.adaptiveDigitsSql(
                     "count(*)", BlkOcc, BlkFloor, BlkCap)} AS w
              FROM customer),
          clean AS (SELECT c_custkey AS key_a, c_name AS name_a,
                     c_mktsegment AS seg_a, c_nationkey AS nat_a,
                     CAST(floor(c_acctbal / 1000) AS BIGINT) AS kb,
                     right(c_name, bc.w) AS blk
              FROM customer, bc),
          dirty AS (SELECT c_custkey AS key_b,
                       CASE WHEN h % 10 = 0
                            THEN concat('Custmoer', substring(c_name, 9))
                            ELSE c_name END AS name_b,
                       CASE WHEN h % 7 = 0 THEN 'UNKNOWN'
                            ELSE c_mktsegment END AS seg_b,
                       CASE WHEN h % 5 = 0 THEN (c_nationkey + 1) % 25
                            ELSE c_nationkey END AS nat_b,
                       CAST(floor(c_acctbal / 1000) AS BIGINT) AS kb,
                       right(c_name, bc.w) AS blk
                FROM (SELECT *, CAST(concat('0x', substr(md5(
                         concat(CAST(c_custkey AS VARCHAR), ':lk')), 1, 15))
                         AS BIGINT) AS h
                      FROM customer), bc),
          un AS (SELECT CAST(sum(cnt * cnt) AS DOUBLE)
                        / (sum(cnt) * sum(cnt)) AS u_name
                 FROM (SELECT count(*) AS cnt FROM clean GROUP BY name_a)),
          us AS (SELECT CAST(sum(cnt * cnt) AS DOUBLE)
                        / (sum(cnt) * sum(cnt)) AS u_seg
                 FROM (SELECT count(*) AS cnt FROM clean GROUP BY seg_a)),
          ut AS (SELECT CAST(sum(cnt * cnt) AS DOUBLE)
                        / (sum(cnt) * sum(cnt)) AS u_nat
                 FROM (SELECT count(*) AS cnt FROM clean GROUP BY nat_a)),
          cand AS (SELECT key_a, key_b,
                      (CASE WHEN name_a = name_b THEN ln(($MName) / u_name)
                            ELSE ln((1 - $MName) / (1 - u_name)) END
                     + CASE WHEN seg_a = seg_b THEN ln(($MSeg) / u_seg)
                            ELSE ln((1 - $MSeg) / (1 - u_seg)) END
                     + CASE WHEN nat_a = nat_b THEN ln(($MNat) / u_nat)
                            ELSE ln((1 - $MNat) / (1 - u_nat)) END) AS score
                   FROM clean JOIN dirty USING (blk, kb)
                   CROSS JOIN un CROSS JOIN us CROSS JOIN ut),
          n AS (SELECT count(*) AS n_clean FROM clean)
          SELECT CAST(n_clean AS BIGINT) AS n_clean,
                 CAST(count(*) AS BIGINT) AS n_cand,
                 CAST(sum(CASE WHEN score > $ScoreHi THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_match,
                 CAST(sum(CASE WHEN score > $ScoreLo AND score <= $ScoreHi
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_review,
                 CAST(sum(CASE WHEN score <= $ScoreLo THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_nonmatch,
                 CAST(sum(CASE WHEN key_a = key_b THEN 1 ELSE 0 END)
                   AS BIGINT) AS true_in_cand,
                 CAST(sum(CASE WHEN key_a = key_b AND score > $ScoreHi
                   THEN 1 ELSE 0 END) AS BIGINT) AS true_matched,
                 CASE WHEN sum(CASE WHEN score > $ScoreHi THEN 1 ELSE 0 END) > 0
                   THEN round(CAST(sum(CASE WHEN key_a = key_b AND score > $ScoreHi
                     THEN 1 ELSE 0 END) AS DOUBLE)
                     / sum(CASE WHEN score > $ScoreHi THEN 1 ELSE 0 END), 6)
                   END AS precision,
                 round(CAST(sum(CASE WHEN key_a = key_b AND score > $ScoreHi
                   THEN 1 ELSE 0 END) AS DOUBLE) / n_clean, 6) AS recall
          FROM cand CROSS JOIN n GROUP BY n_clean""")
  )

  val all: Seq[GQuery] = Seq(q155, q156)
}
