package graft.operators

import graft.GQuery
import graft.functions.TextOps
import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis family for the training-data pipeline: term statistics,
  * language ID, quality scoring, token counting, fingerprinting,
  * normalization, profiling. Absent from the reference (SURVEY §2-A
  * absence audit: no string functions of any kind); mandated by the north
  * star. All pure Catalyst expression trees (codegen'd, no UDFs), each
  * mirrored in DuckDB.
  *
  * Scale notes: q27 is explode→groupBy (shuffle keyed on token — the
  * classic wordcount with map-side partial aggregation); everything else is
  * a pure per-row projection — embarrassingly parallel, no shuffle at all
  * beyond the final presentation sort.
  */
object TextQueries {

  /** documents rebalanced for per-doc text kernels (Io.fanOut — identity
    * when the scan is already wide; one-file fixture scans would run the
    * tokenize/regex/entropy kernels on one core without it). */
  private def fdocs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    graft.sources.Io.fanOut(Tables.documents(s, d))

  import TextOps._

  /** q27 — tokenize → explode → term frequency, top-20. */
  private val q27 = GQuery(
    "q27_text_analysis",
    (s, d) =>
      fdocs(s, d)
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token"))
        .limit(20),
    Some("""SELECT token, count(*) AS cnt
            FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
            GROUP BY token ORDER BY cnt DESC, token LIMIT 20""")
  )

  /** Marker sets for the n-gram-free language-ID heuristic. Real language
    * ID would use per-language stopword/character statistics; the corpus
    * here is synthetic (one shared 31-word vocabulary), so the marker sets
    * partition that vocabulary — the operator shape (per-language marker
    * hit counts → argmax with deterministic tie-break) is the real thing.
    */
  private val MARKERS: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("order", "sort", "merge"),
    "en" -> Seq("the", "a", "value"),
    "es" -> Seq("data", "table", "row"),
    "fr" -> Seq("query", "filter", "join"),
    "zh" -> Seq("spark", "stream", "batch"))

  private def markerSqlList(ms: Seq[String]): String =
    ms.map(m => s"'$m'").mkString("(", ", ", ")")

  /** q33 — language ID: marker-hit scores per language, argmax with
    * first-alphabetical tie-break (scores listed in tie-break order). */
  private val q33 = GQuery(
    "q33_lang_id",
    (s, d) => {
      val toks = tokens(col("text"))
      val scored = fdocs(s, d).select(
        (col("doc_id") +: col("lang").as("labeled_lang") +:
          MARKERS.map { case (l, ms) => markerHits(toks, ms).as(s"s_$l") }): _*)
      val pred = MARKERS.map(_._1).foldRight(lit("und"): Column) { (l, rest) =>
        val others = MARKERS.map(_._1).filter(_ != l)
        when(others.map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _) &&
          col(s"s_$l") > 0, lit(l)).otherwise(rest)
      }
      val outCols = Seq(col("doc_id"), col("pred_lang"), col("labeled_lang")) ++
        MARKERS.map { case (l, _) => col(s"s_$l").cast("bigint").as(s"s_$l") }
      scored.withColumn("pred_lang", pred)
        .select(outCols: _*)
        .orderBy(col("doc_id"))
    },
    Some {
      val scores = MARKERS.map { case (l, ms) =>
        s"CAST(len(list_filter(string_split(text, ' '), t -> t IN ${markerSqlList(ms)})) AS BIGINT) AS s_$l"
      }.mkString(", ")
      val langs = MARKERS.map(_._1)
      val cases = langs.map { l =>
        val conds = langs.filter(_ != l).map(o => s"s_$l >= s_$o") :+ s"s_$l > 0"
        s"WHEN ${conds.mkString(" AND ")} THEN '$l'"
      }.mkString(" ")
      s"""SELECT doc_id, CASE $cases ELSE 'und' END AS pred_lang, labeled_lang,
                 ${langs.map(l => s"s_$l").mkString(", ")}
          FROM (SELECT doc_id, lang AS labeled_lang, $scores FROM documents)
          ORDER BY doc_id"""
    }
  )

  /** Stopword-ish set for quality scoring (high-frequency glue words of
    * the corpus). */
  private val STOPWORDS = Seq("the", "a", "value", "data", "row")

  /** q34 — quality scoring: length, lexical diversity, stopword ratio,
    * composite score. All ratios derive from exact integers, so the double
    * arithmetic is deterministic; the composite is rounded to 6 digits. */
  private val q34 = GQuery(
    "q34_quality_score",
    (s, d) => {
      val t = tokens(col("text"))
      fdocs(s, d).select(
        col("doc_id"),
        size(t).cast("bigint").as("n_tokens"),
        length(col("text")).cast("bigint").as("n_chars"),
        (size(array_distinct(t)).cast("double") / size(t)).as("distinct_ratio"),
        (markerHits(t, STOPWORDS).cast("double") / size(t)).as("stopword_ratio"))
        .withColumn("quality_score", round(
          lit(0.4) * col("distinct_ratio") +
            lit(0.3) * (lit(1.0) - col("stopword_ratio")) +
            lit(0.3) * least(col("n_tokens") / lit(100.0), lit(1.0)), 6))
        .orderBy(col("doc_id"))
    },
    Some(s"""SELECT doc_id, n_tokens, n_chars, distinct_ratio, stopword_ratio,
                    round(0.4 * distinct_ratio + 0.3 * (1.0 - stopword_ratio)
                          + 0.3 * least(n_tokens / 100.0, 1.0), 6) AS quality_score
             FROM (SELECT doc_id,
                          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                          CAST(length(text) AS BIGINT) AS n_chars,
                          CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                            / len(string_split(text, ' ')) AS distinct_ratio,
                          CAST(len(list_filter(string_split(text, ' '),
                                t -> t IN ${markerSqlList(STOPWORDS)})) AS DOUBLE)
                            / len(string_split(text, ' ')) AS stopword_ratio
                   FROM documents)
             ORDER BY doc_id""")
  )

  /** q35 — token counting: whitespace tokens, regex word tokens, and the
    * chars/4 BPE-count heuristic. */
  private val q35 = GQuery(
    "q35_token_count",
    (s, d) =>
      fdocs(s, d).select(
        col("doc_id"),
        size(tokens(col("text"))).cast("bigint").as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).cast("bigint").as("re_tokens"),
        ceil(length(col("text")) / lit(4.0)).cast("bigint").as("est_bpe_tokens"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
                   CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS re_tokens,
                   CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
            FROM documents ORDER BY doc_id""")
  )

  /** q36 — document fingerprint (md5 over sorted distinct tokens) plus a
    * 16-bit shard bucket parsed from the fingerprint's leading hex. */
  private val q36 = GQuery(
    "q36_fingerprint",
    (s, d) =>
      fdocs(s, d)
        .select(col("doc_id"), fingerprint(tokens(col("text"))).as("fingerprint"))
        .withColumn("shard",
          pmod(conv(substring(col("fingerprint"), 1, 4), 16, 10).cast("long"), lit(64)))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id, fingerprint,
                   CAST(concat('0x', substr(fingerprint, 1, 4)) AS BIGINT) % 64 AS shard
            FROM (SELECT doc_id,
                         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint
                  FROM documents)
            ORDER BY doc_id""")
  )

  /** q42 — TF-IDF: per-document top term by tf·ln(N/df), via the generic
    * CorpusOps.tfidfTopTerm. Document frequency is a vocabulary-sized
    * relation computed straight from the distinct-token arrays (map-side
    * explode + groupBy(token) with partial aggregation) joined back onto
    * the tf relation — no window over token partitions, whose hot
    * stop-token groups would funnel at scale (VERDICT r1 #7). The df join
    * strategy is "auto" (round-2 watch item): no forced broadcast —
    * Catalyst/AQE pick broadcast vs shuffle from the MEASURED df size, so
    * a web-scale vocabulary larger than the broadcast budget degrades to
    * a shuffle join instead of an OOM. The corpus size N broadcasts as a
    * one-row scalar. Ranking uses the rounded score (+ token tie-break)
    * so 1-ulp libm differences between engines cannot flip the top term. */
  private val q42 = GQuery(
    "q42_tfidf",
    (s, d) =>
      CorpusOps.tfidfTopTerm(fdocs(s, d), "doc_id", "text")
        .orderBy(col("doc_id")),
    Some("""WITH tf AS (SELECT doc_id, token, count(*) AS tf
                        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
                        GROUP BY doc_id, token),
                 wf AS (SELECT doc_id, token, tf,
                               count(*) OVER (PARTITION BY token) AS df FROM tf),
                 n AS (SELECT count(*) AS n_docs FROM documents),
                 sc AS (SELECT doc_id, token,
                               round(tf * ln(n_docs / df), 6) AS score FROM wf, n),
                 r AS (SELECT doc_id, token, score,
                              row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, token) AS rn FROM sc)
            SELECT doc_id, token AS top_token, score FROM r WHERE rn = 1
            ORDER BY doc_id""")
  )

  /** q52 — deterministic per-stratum quota sample (dataset curation):
    * 20 documents per language via the generic Sampling.quotaPerGroup,
    * whose order key is md5(id-as-string) — identical in both engines, so
    * the generic operator's SELECTION (not just its shape) is proven by
    * the driver's DuckDB gate through this entry. */
  private val q52 = GQuery(
    "q52_quota_sample",
    (s, d) =>
      Sampling.quotaPerGroup(
          Tables.documents(s, d).select(col("doc_id"), col("lang")),
          "lang", "doc_id", 20)
        .orderBy(col("lang"), col("doc_id")),
    Some("""SELECT doc_id, lang FROM (
              SELECT doc_id, lang,
                     row_number() OVER (PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
              FROM documents)
            WHERE rk <= 20 ORDER BY lang, doc_id""")
  )

  /** q85 — per-language document-length quartiles (wave 3): the length
    * distribution report a curation pipeline reads before picking
    * truncation/chunking thresholds. Exact interpolated quartiles via
    * the Ranks decomposition (parallel local sorts in range slices +
    * k-row final interpolation — q63's scale path; quantilesCont ranks
    * ONCE for all three quartiles), never a single-task-per-group
    * percentile. The inputs are
    * deterministic file-scan projections, satisfying the Ranks input
    * contract; values are integer-valued doubles so interpolation is
    * exact in both engines. */
  private val q85 = GQuery(
    "q85_length_quartiles",
    (s, d) => {
      val lens = fdocs(s, d)
        .select(col("lang"), size(tokens(col("text"))).cast("double").as("nt"))
      Ranks.quantilesCont(lens, "lang", col("nt"),
          Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75"))
        .select(col("lang"), round(col("p25"), 6).as("p25"),
          round(col("p50"), 6).as("p50"), round(col("p75"), 6).as("p75"))
        .orderBy(col("lang"))
    },
    Some("""SELECT lang,
                   round(quantile_cont(nt, 0.25), 6) AS p25,
                   round(quantile_cont(nt, 0.5), 6) AS p50,
                   round(quantile_cont(nt, 0.75), 6) AS p75
            FROM (SELECT lang, CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt
                  FROM documents)
            GROUP BY lang ORDER BY lang""")
  )

  /** q53 — positional explode (Generate with ordinality): leading trigram
    * of every document with 0-based positions. */
  private val q53 = GQuery(
    "q53_posexplode",
    (s, d) =>
      fdocs(s, d)
        .select(col("doc_id"), posexplode(tokens(col("text"))))
        .filter(col("pos") < 3)
        .select(col("doc_id"), col("pos").cast("bigint").as("pos"), col("col").as("token"))
        .orderBy(col("doc_id"), col("pos")),
    Some("""SELECT doc_id, i - 1 AS pos, t[i] AS token
            FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents), range(1, 4) r(i)
            WHERE i <= len(t) ORDER BY doc_id, pos""")
  )

  /** q54 — text normalization / redaction (cleaning stage of a training
    * pipeline): whitespace collapse, case fold, alphanumeric-only strip,
    * digit redaction. Pure per-row projection through the fused native
    * NormalizeText kernel (one byte-level pass instead of four java.regex
    * passes — the composed form was ~2.5 s of q54's 4.5 s at sf1;
    * semantics identical to the built-in composition, locked by
    * NormalizeTextSpec on both the ASCII fast path and the fallback). */
  private val q54 = GQuery(
    "q54_normalize",
    (s, d) => {
      graft.functions.NormalizeText.register(s)
      fdocs(s, d)
        .select(col("doc_id"),
          graft.functions.NormalizeText(col("text")).as("nt"))
        .select(col("doc_id"), col("nt.norm_text").as("norm_text"),
          col("nt.alnum_only").as("alnum_only"),
          col("nt.redacted").as("redacted"), col("nt.n_alpha").as("n_alpha"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
                   trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm_text,
                   regexp_replace(text, '[^a-z0-9 ]', '', 'g') AS alnum_only,
                   regexp_replace(text, '[0-9]', '#', 'g') AS redacted,
                   CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha
            FROM documents ORDER BY doc_id""")
  )

  /** q55 — dataset profiling (the audit stage before training): row and
    * null counts, cardinalities, ranges, token totals — one aggregation
    * pass over the corpus. */
  private val q55 = GQuery(
    "q55_profile",
    (s, d) =>
      fdocs(s, d).agg(
        count(lit(1)).as("n_rows"),
        count(col("text")).as("n_text"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        sum(col("n_chars")).as("total_chars"),
        sum(size(tokens(col("text"))).cast("bigint")).as("total_tokens"),
        countDistinct(md5(col("text"))).as("n_distinct_texts")),
    Some("""SELECT count(*) AS n_rows,
                   count(text) AS n_text,
                   count(DISTINCT lang) AS n_langs,
                   count(DISTINCT source) AS n_sources,
                   min(n_chars) AS min_chars,
                   max(n_chars) AS max_chars,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
                   count(DISTINCT md5(text)) AS n_distinct_texts
            FROM documents""")
  )

  /** q88 — deterministic hash-stratified sample (wave 4): per-language
    * sampling rates (es 50%, de 30%, everything else 10%) with inclusion
    * decided by md5(doc_id) mod 100 via Sampling.hashStratifiedSample —
    * the mixture-rebalancing step of corpus curation as a map-only,
    * replay-stable operator. The driver's DuckDB gate re-derives the
    * SELECTION itself (not just counts), proving the hash decision is
    * engine-portable. */
  private val q88 = GQuery(
    "q88_stratified_sample",
    (s, d) =>
      Sampling.hashStratifiedSample(
          Tables.documents(s, d).select(col("doc_id"), col("lang")),
          "lang", "doc_id", Map("es" -> 50, "de" -> 30), defaultPct = 10)
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id, lang FROM documents
            WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100
                  < (CASE lang WHEN 'es' THEN 50 WHEN 'de' THEN 30 ELSE 10 END)
            ORDER BY doc_id""")
  )

  /** q89 — PII redaction (wave 4): scrub email addresses and IPv4
    * literals with compiled-regex replacement, reporting per-document
    * redaction counts. The fixture corpus is synthetic-clean, so the PII
    * surface is INJECTED deterministically from doc_id (a contact line
    * appended to the text) — the operator's regexes, counting, and
    * map-only shape are what's under test, and the oracle applies the
    * same injection so the redaction is diffed row-for-row.
    *
    * Regex dialect note: patterns stay in the Java∩RE2 common subset
    * (character classes, +, bounded repetition — no backrefs, no
    * lookaround) so Spark (java.util.regex) and DuckDB (RE2) agree.
    * Scale notes: map-only (regexp_replace + regexp_count are row-local,
    * codegen'd); no shuffle at all before the presentation sort. */
  private val q89 = {
    val emailRe = "[a-z0-9._%-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    GQuery(
      "q89_pii_redact",
      (s, d) =>
        fdocs(s, d)
          .select(col("doc_id"),
            concat(col("text"), lit(" contact user"), col("doc_id"),
              lit("@mail.example.com from 10."), pmod(col("doc_id"), lit(200)),
              lit(".0."), pmod(col("doc_id"), lit(250))).as("body"))
          .select(col("doc_id"),
            (regexp_count(col("body"), lit(emailRe)) +
              regexp_count(col("body"), lit(ipRe))).as("n_pii"),
            regexp_replace(regexp_replace(col("body"), emailRe, "<EMAIL>"),
              ipRe, "<IP>").as("redacted"))
          .orderBy(col("doc_id")),
      // "full"/"body" naming: FULL is a DuckDB reserved word
      Some(s"""WITH pii AS (SELECT doc_id,
                      text || ' contact user' || doc_id || '@mail.example.com from 10.'
                           || (doc_id % 200) || '.0.' || (doc_id % 250) AS body
                    FROM documents)
           SELECT doc_id,
                  CAST(len(regexp_extract_all(body, '$emailRe')) +
                       len(regexp_extract_all(body, '$ipRe')) AS INT) AS n_pii,
                  regexp_replace(regexp_replace(body, '$emailRe', '<EMAIL>', 'g'),
                                 '$ipRe', '<IP>', 'g') AS redacted
           FROM pii ORDER BY doc_id""")
    )
  }

  /** q98 — character-entropy quality filter (wave 5): per-document
    * Shannon entropy of the character distribution plus alphabet size.
    * Low-entropy documents are machine-generated repetition / encoding
    * junk — this is the cheapest content-quality signal a curation
    * pipeline has, run before anything tokenizer-shaped.
    *
    * Scale notes: MAP-ONLY — the whole codepoint histogram + entropy is
    * one fused native kernel per row (graft.functions.CharEntropy, the
    * SimHash64 pattern), so the only exchange is the presentation sort.
    * The first cut exploded one row per character into a (doc, ch)-keyed
    * shuffle — a corpus-sized exchange for a per-row-computable quantity
    * (measured 2.1-2.7 s at sf0.1; the kernel removes both shuffles).
    * The kernel sums the histogram in ascending-codepoint order
    * (canonical → bit-reproducible across partitionings); cross-engine
    * ulp drift vs DuckDB's own sum order is ~1e-14, five orders below
    * the 4-decimal rounding grid. */
  private val q98 = GQuery(
    "q98_char_entropy",
    (s, d) => {
      graft.functions.CharEntropy.register(s)
      fdocs(s, d)
        .select(col("doc_id"), graft.functions.CharEntropy(col("text")).as("e"))
        .select(col("doc_id"), col("e.n_distinct_chars").as("n_distinct_chars"),
          round(col("e.entropy"), 4).as("entropy"))
        .orderBy(col("doc_id"))
    },
    // LEFT JOIN back to documents so an empty text yields (doc_id, 0, 0.0)
    // exactly like the kernel ("empty -> defined as 0"); a bare unnest over
    // an empty char list would silently drop the document from the oracle.
    Some("""WITH ch AS (SELECT doc_id, len(text) AS n,
                               unnest(list_transform(range(1, len(text) + 1),
                                 i -> substr(text, i, 1))) AS ch
                        FROM documents),
                 c AS (SELECT doc_id, n, ch, count(*) AS c
                       FROM ch GROUP BY doc_id, n, ch),
                 e AS (SELECT doc_id, count(*) AS n_distinct_chars,
                              round(-sum((CAST(c AS DOUBLE) / n)
                                * log2(CAST(c AS DOUBLE) / n)), 4) AS entropy
                       FROM c GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(e.n_distinct_chars, 0) AS n_distinct_chars,
                   coalesce(e.entropy, 0.0) AS entropy
            FROM documents d LEFT JOIN e ON d.doc_id = e.doc_id
            ORDER BY d.doc_id""")
  )

  val all: Seq[GQuery] = Seq(q27, q33, q34, q35, q36, q42, q52, q53, q54,
    q55, q85, q88, q89, q98)
}
