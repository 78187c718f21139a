package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Round-9 wave 21: ingest-safety and sampling-policy audits — the
  * blocklist safety filter sheet (q175), duplication-inflation weighting
  * policies (q176), freshness half-life decay profile (q177), and
  * tokenizer-vocabulary OOV coverage (q178). Shapes: map pass →
  * doc-/cluster-/type-keyed reduce → |sources|-or-1-row sheet; the only
  * broadcasts are 1-row globals and a top-V vocabulary; no windows.
  */
object Wave21Queries {

  /** Blocklist selectivity — a token is "blocked" when its keyed PRF
    * lands in residue 0 mod [[BlockMod]] (a 1/16 hash-sampled denylist
    * standing in for an external safety list; deterministic, so the
    * oracle can check every count). Production swaps the md5 PRF for a
    * broadcast Aho–Corasick automaton over the real list — the audit
    * shape (per-occurrence flag, no vocabulary join) is unchanged. */
  private val BlockMod = 16

  /** q175 — blocklist safety-filter audit: per source, how much a
    * denylist would remove — documents hit (≥1 blocked token), blocked
    * occurrences, and the exact-ppm blocked-token rate, with the corpus
    * blocked-vocabulary size alongside. This is the pre-flight sheet a
    * safety filter runs before anyone deletes data: a source whose hit
    * fraction is 50× the corpus rate is a takedown candidate; a list
    * that hits every source uniformly is (statistically) a no-op.
    *
    * Determinism: the flag is the md5-keyed PRF (TextOps.shingleHash60,
    * the q161/q170 convention); counts are exact integers; ppm is
    * integer floor division; one rounded division per row.
    *
    * Scale notes: the per-document blocked count is a HIGHER-ORDER
    * filter over the token array (TextOps.blockedTokens — per-row,
    * codegen-composed), so the main path is one map pass straight into
    * the |sources|-row aggregate: no explode, no doc-keyed shuffle, no
    * vocabulary join. Only the blocked-VOCABULARY side explodes — and
    * only the flagged 1/[[BlockMod]] minority — into a DISTINCT reduced
    * to one broadcast row. */
  private val q175 = GQuery(
    "q175_blocklist_audit",
    (s, d) => {
      val doc = Tables.documents(s, d)
        .select(col("source"),
          size(TextOps.tokens(col("text"))).cast("bigint").as("nt"),
          size(TextOps.blockedTokens(col("text"), BlockMod)).cast("bigint")
            .as("nb"))
      val vocab = Tables.documents(s, d)
        .select(explode(TextOps.blockedTokens(col("text"), BlockMod))
          .as("tok"))
        .agg(count_distinct(col("tok")).as("blocked_vocab"))
      doc.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("nb") > 0, 1L).otherwise(0L)).as("docs_hit"),
          sum(col("nt")).as("n_tokens"), sum(col("nb")).as("occ_blocked"))
        .crossJoin(broadcast(vocab))
        .select(col("source"), col("n_docs"), col("docs_hit"),
          round(col("docs_hit") / col("n_docs").cast("double"), 6)
            .as("frac_docs_hit"),
          col("n_tokens"), col("occ_blocked"),
          when(col("n_tokens") > 0,
            expr("occ_blocked * 1000000 DIV n_tokens")).as("blocked_ppm"),
          col("blocked_vocab"))
        .orderBy(col("source"))
    },
    Some(s"""WITH tk AS (SELECT doc_id, source,
                    unnest(string_split(text, ' ')) AS tok
                 FROM documents),
          f AS (SELECT doc_id, source, tok,
                   CASE WHEN CAST(concat('0x', substr(md5(tok || ':bl'), 1, 15))
                          AS BIGINT) % $BlockMod = 0 THEN 1 ELSE 0 END AS b
                FROM tk),
          doc AS (SELECT doc_id, source, count(*) AS nt,
                     CAST(sum(b) AS BIGINT) AS nb, max(b) AS hit
                  FROM f GROUP BY 1, 2),
          v AS (SELECT count(DISTINCT tok) AS blocked_vocab FROM f WHERE b = 1),
          src AS (SELECT source, count(*) AS n_docs,
                     CAST(sum(hit) AS BIGINT) AS docs_hit,
                     CAST(sum(nt) AS BIGINT) AS n_tokens,
                     CAST(sum(nb) AS BIGINT) AS occ_blocked
                  FROM doc GROUP BY 1)
          SELECT source, n_docs, docs_hit,
                 round(docs_hit / CAST(n_docs AS DOUBLE), 6) AS frac_docs_hit,
                 n_tokens, occ_blocked,
                 CASE WHEN n_tokens > 0 THEN occ_blocked * 1000000 // n_tokens
                 END AS blocked_ppm,
                 blocked_vocab
          FROM src, v ORDER BY source""")
  )

  /** q176 — duplication-inflation weighting sheet: group exact
    * duplicates (md5(text), the q24 key), then price three sampling
    * policies against each other — raw (every copy trains: Σ v·c
    * tokens), dedup-to-one (Σ v), and sqrt-damped (Σ v·√c, the
    * compromise that keeps popular content over-represented without
    * letting a 1000× boilerplate cluster dominate an epoch). The
    * inflation ratio raw/dedup is the single number that says how much
    * of the corpus' apparent size is duplication.
    *
    * Determinism: cluster token masses are exact integers; the √c mass
    * is integerized per cluster at 10⁶ (the q169 sqrt-chain contract —
    * one IEEE sqrt, one multiply, one round, then exact BIGINT sums);
    * two guarded rounded divisions in the 1-row sheet.
    *
    * Scale notes: one md5-keyed aggregate (map-side combine; the q24
    * shuffle) → cluster-sized relation → grouping-free 1-row reduce.
    * Nothing data-sized crosses a single task; no window. */
  private val q176 = GQuery(
    "q176_dup_inflation",
    (s, d) => {
      val cl = Tables.documents(s, d)
        .select(md5(col("text")).as("h"),
          size(TextOps.tokens(col("text"))).cast("bigint").as("v0"))
        .groupBy(col("h"))
        .agg(count(lit(1)).as("c"), min(col("v0")).as("v"))
      cl.agg(sum(col("c")).as("n_docs"), count(lit(1)).as("n_clusters"),
          sum(col("c") - 1).as("dup_docs"),
          sum(col("v") * col("c")).as("raw_tokens"),
          sum(col("v")).as("dedup_tokens"),
          sum(round(col("v").cast("double")
            * sqrt(col("c").cast("double")) * 1000000.0).cast("bigint"))
            .as("sqrt_mass_micro"))
        .select(col("n_docs"), col("n_clusters"), col("dup_docs"),
          col("raw_tokens"), col("dedup_tokens"),
          when(col("dedup_tokens") > 0,
            round(col("raw_tokens") / col("dedup_tokens").cast("double"), 6))
            .as("inflation"),
          col("sqrt_mass_micro"),
          when(col("dedup_tokens") > 0,
            round(col("sqrt_mass_micro")
              / (col("dedup_tokens").cast("double") * 1000000.0), 6))
            .as("sqrt_ratio"))
    },
    Some("""WITH cl AS (SELECT md5(text) AS h, count(*) AS c,
                   CAST(min(len(string_split(text, ' '))) AS BIGINT) AS v
              FROM documents GROUP BY 1),
          a AS (SELECT CAST(sum(c) AS BIGINT) AS n_docs,
                       count(*) AS n_clusters,
                       CAST(sum(c - 1) AS BIGINT) AS dup_docs,
                       CAST(sum(v * c) AS BIGINT) AS raw_tokens,
                       CAST(sum(v) AS BIGINT) AS dedup_tokens,
                       CAST(sum(CAST(round(CAST(v AS DOUBLE)
                         * sqrt(CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT))
                         AS BIGINT) AS sqrt_mass_micro
                FROM cl)
          SELECT n_docs, n_clusters, dup_docs, raw_tokens, dedup_tokens,
                 CASE WHEN dedup_tokens > 0 THEN
                   round(raw_tokens / CAST(dedup_tokens AS DOUBLE), 6)
                 END AS inflation,
                 sqrt_mass_micro,
                 CASE WHEN dedup_tokens > 0 THEN
                   round(sqrt_mass_micro
                     / (CAST(dedup_tokens AS DOUBLE) * 1000000.0), 6)
                 END AS sqrt_ratio
          FROM a""")
  )

  /** Half-life grid (days) for q177 — the freshness dials a recency-
    * weighted sampler would choose between. */
  private val DecayGridDays = Seq(7, 30, 90)
  /** Weight scale exponent: per-event weight is the exact power of two
    * 2^(ScaleBits − k), k = age in half-lives capped at ScaleBits, so
    * every weight and every per-type sum is EXACT BIGINT arithmetic and
    * the only doubles are two rounded scalings per column. At 2^40 the
    * exact sum holds ~8.4M events per type per 2^63; production drops
    * the scale to 2^20 (precision 1e-6 of a half-life step is far below
    * any sampling decision), which bounds ~8.8e12 events/type. */
  private val DecayScaleBits = 40

  /** q177 — freshness decay profile: per event type, the corpus mass
    * that survives exponential time-decay at half-lives of 7/30/90 days
    * (age measured back from the corpus' max timestamp). decayed_n is
    * the effective sample size a recency-weighted job sees; fresh_frac
    * = decayed/raw is the dial sheet — a type whose 7-day mass is ≈0
    * is archival, one whose 90-day fraction is ≈1 is evergreen. This is
    * the batch twin of every streaming recency knob: it prices the
    * half-life before anyone bakes it into a sampler.
    *
    * Determinism: weights are exact powers of two summed as BIGINT
    * (see [[DecayScaleBits]]); age buckets are integer floor divisions
    * of microsecond arithmetic; each output double is one rounded
    * division of exact integers.
    *
    * Scale notes: 1-row max-timestamp broadcast → one map pass
    * computing all three weights (no ×grid row fan-out) → |types|-row
    * aggregate with map-side combine. */
  private val q177 = GQuery(
    "q177_decay_profile",
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), unix_micros(col("ts")).as("ts_us"))
      val mx = ev.agg(max(col("ts_us")).as("mx_us"))
      val scale = (1L << DecayScaleBits).toDouble
      val wCols = DecayGridDays.map { h =>
        val per = h * 86400000000L
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $DecayScaleBits - " +
          s"CAST(least((mx_us - ts_us) DIV ${per}L, " +
          s"$DecayScaleBits) AS INT))")).as(s"w${h}d")
      }
      val outCols = DecayGridDays.flatMap { h =>
        Seq(col(s"w${h}d"),
          round(col(s"w${h}d") / scale, 6).as(s"decayed_n_${h}d"),
          round(col(s"w${h}d") / (col("n").cast("double") * scale), 6)
            .as(s"fresh_frac_${h}d"))
      }
      ev.crossJoin(broadcast(mx))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), wCols: _*)
        .select(col("event_type") +: col("n") +: outCols: _*)
        .orderBy(col("event_type"))
    },
    Some {
      val scale = s"${1L << DecayScaleBits}.0"
      val w = DecayGridDays.map { h =>
        val per = h * 86400000000L
        s"""CAST(sum(1::BIGINT << CAST($DecayScaleBits -
              least((mx_us - ts_us) // $per, $DecayScaleBits) AS INTEGER))
              AS BIGINT) AS w${h}d"""
      }.mkString(", ")
      val out = DecayGridDays.map { h =>
        s"""w${h}d, round(w${h}d / $scale, 6) AS decayed_n_${h}d,
            round(w${h}d / (CAST(n AS DOUBLE) * $scale), 6)
              AS fresh_frac_${h}d"""
      }.mkString(", ")
      s"""WITH e AS (SELECT event_type, epoch_us(ts) AS ts_us FROM events),
           m AS (SELECT max(ts_us) AS mx_us FROM e),
           a AS (SELECT event_type, count(*) AS n, $w
                 FROM e, m GROUP BY event_type)
           SELECT event_type, n, $out FROM a ORDER BY event_type"""
    }
  )

  /** Vocabulary size for q178 — the top-V head a fixed tokenizer
    * vocabulary covers (a dial; the fixture's generator vocabulary makes
    * the head/tail split sharp at 16). */
  private val VocabTopV = 16

  /** q178 — vocabulary-coverage / OOV audit: build the top-[[VocabTopV]]
    * token vocabulary (by corpus frequency, token-lexicographic
    * tie-break) and measure, per source, the out-of-vocabulary token
    * rate (exact ppm) and the fraction of documents that are fully
    * in-vocabulary. The tokenizer-coverage twin of q168's fertility
    * sheet: fertility prices tokens per byte, this prices what the
    * vocabulary misses — a source with 100× the corpus OOV rate needs
    * its own vocabulary extension (or is junk, and q34 already said so).
    *
    * Determinism: the vocabulary is a total-order top-V (count DESC,
    * token ASC); counts exact integers; ppm integer floor division; one
    * rounded division per row.
    *
    * Scale notes: vocabulary = token-keyed count aggregate (map-side
    * combine) → TakeOrderedAndProject top-V (parallel partial top-V per
    * partition, V-row driver merge — never a single-task global sort)
    * → V-row BROADCAST hash join against occurrences (no shuffle of
    * the corpus side) → doc-keyed reduce → |sources|-row sheet. */
  private val q178 = GQuery(
    "q178_vocab_coverage",
    (s, d) => {
      val tk = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(TextOps.tokens(col("text"))).as("tok"))
      val vocab = tk.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok").asc)
        .limit(VocabTopV)
        .select(col("tok"), lit(1).as("in_v"))
      val doc = tk.join(broadcast(vocab), Seq("tok"), "left")
        .groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("nt"),
          sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("oov"))
      doc.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nt")).as("n_tokens"),
          sum(col("oov")).as("oov_tokens"),
          sum(when(col("oov") === 0, 1L).otherwise(0L)).as("clean_docs"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("oov_tokens"),
          when(col("n_tokens") > 0,
            expr("oov_tokens * 1000000 DIV n_tokens")).as("oov_ppm"),
          round(col("clean_docs") / col("n_docs").cast("double"), 6)
            .as("frac_clean_docs"))
        .orderBy(col("source"))
    },
    Some(s"""WITH tk AS (SELECT doc_id, source,
                    unnest(string_split(text, ' ')) AS tok
                 FROM documents),
          vocab AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM tk
                      GROUP BY 1 ORDER BY c DESC, tok ASC LIMIT $VocabTopV)),
          doc AS (SELECT doc_id, source, count(*) AS nt,
                     CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                       AS BIGINT) AS oov
                  FROM tk LEFT JOIN vocab v USING (tok)
                  GROUP BY doc_id, source),
          src AS (SELECT source, count(*) AS n_docs,
                     CAST(sum(nt) AS BIGINT) AS n_tokens,
                     CAST(sum(oov) AS BIGINT) AS oov_tokens,
                     CAST(sum(CASE WHEN oov = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS clean_docs
                  FROM doc GROUP BY 1)
          SELECT source, n_docs, n_tokens, oov_tokens,
                 CASE WHEN n_tokens > 0 THEN oov_tokens * 1000000 // n_tokens
                 END AS oov_ppm,
                 round(clean_docs / CAST(n_docs AS DOUBLE), 6)
                   AS frac_clean_docs
          FROM src ORDER BY source""")
  )

  val all: Seq[GQuery] = Seq(q175, q176, q177, q178)
}
