package graft.operators

import graft.GQuery
import graft.functions.TextOps.tokens
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Corpus-construction family: the index/statistics/split operators a
  * training-data pipeline runs after cleaning and dedup. Like the rest of
  * the engine these derive from the reference's map/shuffle/reduce shape
  * (parallel_sort.cpp / max_aggregation.cpp generalized): explode → one
  * shuffle on the token key with map-side partial aggregation → bounded
  * per-key state.
  */
object CorpusQueries {

  /** documents rebalanced for tokenize/explode kernels (Io.fanOut —
    * identity when the scan is already wide; at fixture scale the
    * one-file scan would run every per-token kernel on one core). */
  private def fdocs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    graft.sources.Io.fanOut(Tables.documents(s, d))


  /** q56 — inverted-index build: token → document frequency + the first
    * 20 postings (sorted doc ids). The classic search/index workload.
    *
    * Scale notes: one explode of per-doc DISTINCT tokens (array_distinct
    * is map-side), one shuffle on token with partial counts combining
    * before it. Posting lists are the unbounded part at 100 TB — stop
    * tokens would accumulate corpus-sized lists — so the emitted list is
    * capped (production shards postings into fixed-size segments keyed by
    * (token, shard); the cap is the first segment). df stays exact: it is
    * counted from the rows, not from the capped list. The posting list is
    * emitted as a canonical comma-joined string — the driver's pandas
    * comparison layer cannot hash array cells, and a fixed-order string
    * is the same information with an engine-portable compare. */
  private val q56 = GQuery(
    "q56_inverted_index",
    (s, d) =>
      fdocs(s, d)
        .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("df"),
          concat_ws(",", transform(
            slice(sort_array(collect_list(col("doc_id"))), 1, 20),
            x => x.cast("string"))).as("postings"))
        .filter(col("df") >= 10)
        .orderBy(col("token")),
    Some("""SELECT token, count(*) AS df,
                   array_to_string((list_sort(list(doc_id)))[1:20], ',') AS postings
            FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
                  FROM documents)
            GROUP BY token HAVING count(*) >= 10
            ORDER BY token""")
  )

  /** q57 — corpus bigram counts with a min-count cutoff and top-100 head:
    * the n-gram language-model statistics workload. Occurrences (not
    * per-doc sets) are counted, so repeated bigrams within a document all
    * contribute.
    *
    * Scale notes: bigram generation is a per-row projection; the single
    * shuffle carries (bigram, partial count) after map-side combine; the
    * head is TakeOrderedAndProject (per-partition 100-row heaps), never a
    * global sort. */
  private val q57 = GQuery(
    "q57_ngram_counts",
    (s, d) => {
      // r17: native positional-bigram kernel replaces the interpreted
      // higher-order transform (identical strings; explode drops the
      // null-vs-empty difference on null toks)
      graft.functions.ShingleStrings.register(s, 2)
      fdocs(s, d)
        .select(tokens(col("text")).as("toks"))
        .select(explode(graft.functions.ShingleStrings(col("toks"), 2))
          .as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 5)
        .orderBy(col("cnt").desc, col("bigram"))
        .limit(100)
    },
    Some("""WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
                 b AS (SELECT unnest(list_transform(range(1, len(toks)),
                              i -> toks[i] || ' ' || toks[i + 1])) AS bigram
                       FROM t WHERE len(toks) >= 2)
            SELECT bigram, count(*) AS cnt FROM b
            GROUP BY bigram HAVING count(*) >= 5
            ORDER BY cnt DESC, bigram LIMIT 100""")
  )

  /** q58 — deterministic train/val/test split (80/10/10) with per-split
    * stats. The split key is the md5-60bit of the document CONTENT, so
    * assignment is reproducible across runs, engines, and repartitioning,
    * and exact duplicates land in the same split (no train/test leakage
    * from dups — the property curation pipelines actually need).
    *
    * Scale notes: map-only assignment (one projection), then a 3-group
    * aggregate with partial combine. Nothing here depends on data volume
    * except the exact sums. */
  private val q58 = GQuery(
    "q58_corpus_split",
    (s, d) => {
      CorpusOps.withSplit(fdocs(s, d), "text")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          countDistinct(col("lang")).as("n_langs"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("split"))
    },
    Some("""SELECT CASE WHEN h < 80 THEN 'train' WHEN h < 90 THEN 'val'
                        ELSE 'test' END AS split,
                   count(*) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   count(DISTINCT lang) AS n_langs,
                   min(doc_id) AS min_doc, max(doc_id) AS max_doc
            FROM (SELECT *, CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 100 AS h
                  FROM documents)
            GROUP BY 1 ORDER BY split""")
  )

  /** The (doc_id, w1, bg) bigram-occurrence relation shared by q75/q82:
    * one map-only projection (explode of the per-row bigram array), w1
    * split back out of the bigram string map-side. */
  private def bigramOccurrences(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    // r17: native positional-bigram kernel (see q57)
    graft.functions.ShingleStrings.register(s, 2)
    fdocs(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        explode(graft.functions.ShingleStrings(col("toks"), 2)).as("bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
  }

  /** q75 — bigram-LM coherence score (wave 3): the n-gram quality filter
    * a curation pipeline runs with a corpus-trained LM. Per document:
    * Σ C(w1 w2) / Σ C(w1 ·) over its bigram occurrences — the doc-level
    * aggregate of the conditional bigram frequency P(w2|w1), high for
    * documents whose continuations are common in the corpus, low for
    * shuffled/garbled text. Both sums are INTEGER (exact, order-free);
    * the single final division is IEEE-identical cross-engine, so the
    * rounded score is oracle-exact — no log/exp whose libm ulps differ.
    *
    * Scale notes: the count relations are observed-bigram/vocabulary-
    * sized with map-side partial aggregation; their joins back onto the
    * occurrence relation are UNHINTED — Catalyst/AQE broadcast them when
    * measured-small (the q42 policy). Final per-doc aggregate shuffles
    * (doc_id, two longs). */
  private val q75 = GQuery(
    "q75_bigram_coherence",
    (s, d) => {
      val b = bigramOccurrences(s, d)
      val cb = b.groupBy(col("bg")).agg(count(lit(1)).as("cb"))
      val cw = b.groupBy(col("w1")).agg(count(lit(1)).as("cw"))
      b.join(cb, "bg").join(cw, "w1")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum(col("cb")) / sum(col("cw")), 6).as("coherence"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
                 b AS (SELECT doc_id,
                              unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
                              unnest(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1])) AS bg
                       FROM t WHERE len(toks) >= 2),
                 cb AS (SELECT bg, count(*) AS cb FROM b GROUP BY bg),
                 cw AS (SELECT w1, count(*) AS cw FROM b GROUP BY w1)
            SELECT b.doc_id, count(*) AS n_bigrams,
                   round(sum(cb.cb) * 1.0 / sum(cw.cw), 6) AS coherence
            FROM b JOIN cb USING (bg) JOIN cw USING (w1)
            GROUP BY b.doc_id ORDER BY doc_id""")
  )

  /** q77 — Zipf magnitude histogram of token occurrence counts (wave 3):
    * the corpus-statistics audit that shows whether a token distribution
    * is Zipf-shaped (head of stop tokens, long tail of rare ones).
    * Magnitude = decimal-digit count of the occurrence count — an exact
    * integer bucket in both engines (string length), immune to the libm
    * log10 ulp at bucket boundaries.
    *
    * Scale notes: one token shuffle with map-side combine (the count),
    * then a ≤20-group aggregate. Nothing data-sized past the first
    * aggregate. */
  private val q77 = GQuery(
    "q77_token_zipf",
    (s, d) =>
      fdocs(s, d)
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .groupBy(length(col("cnt").cast("string")).as("magnitude"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("cnt")).as("total_occurrences"),
          min(col("cnt")).as("min_count"),
          max(col("cnt")).as("max_count"))
        .orderBy(col("magnitude")),
    Some("""WITH c AS (SELECT token, count(*) AS cnt
                       FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
                       GROUP BY token)
            SELECT CAST(len(CAST(cnt AS VARCHAR)) AS INTEGER) AS magnitude,
                   count(*) AS n_tokens,
                   CAST(sum(cnt) AS BIGINT) AS total_occurrences,
                   min(cnt) AS min_count, max(cnt) AS max_count
            FROM c GROUP BY 1 ORDER BY magnitude""")
  )

  /** The fixed conjunctive query for q81 — mirrors a user's AND query
    * against the q56 inverted index. */
  private val PhraseTokens = Seq("spark", "join", "vector", "stream")

  /** q81 — conjunctive index probe (wave 3): documents containing ALL
    * query tokens — the retrieval twin of the q56 index build (posting-
    * list intersection expressed relationally).
    *
    * Scale notes: the `token IN (...)` filter applies DURING the map-side
    * explode, so the shuffle carries at most |query| rows per document —
    * the plan is the postings intersection, never a corpus scan shuffle.
    * A production engine would probe the MATERIALIZED q56 index instead
    * of the raw corpus; the relational shape (filter → group → count =
    * |query|) is identical either way. */
  private val q81 = GQuery(
    "q81_index_probe",
    (s, d) =>
      fdocs(s, d)
        .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("token"))
        .filter(col("token").isin(PhraseTokens: _*))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_matched"))
        .filter(col("n_matched") === PhraseTokens.length)
        .select(col("doc_id"))
        .orderBy(col("doc_id")),
    Some(s"""SELECT doc_id
             FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
                   FROM documents)
             WHERE token IN (${PhraseTokens.map(t => s"'$t'").mkString(", ")})
             GROUP BY doc_id HAVING count(*) = ${PhraseTokens.length}
             ORDER BY doc_id""")
  )

  /** q82 — bigram novelty ratio (wave 3): per document, the share of its
    * DISTINCT bigrams that occur in no other document — the memorization/
    * novelty audit run before adding a source to a training mix (near-1
    * means genuinely new text; near-0 means the corpus already covers
    * it). Integer counts + one final division: oracle-exact.
    *
    * Scale notes: per-doc distinct bigrams are deduped map-side
    * (array_distinct); one bigram-key shuffle builds the df relation,
    * whose join back is unhinted (AQE broadcast when measured-small, the
    * q42 policy); final aggregate shuffles (doc_id, two longs). */
  private val q82 = GQuery(
    "q82_bigram_novelty",
    (s, d) => {
      graft.functions.ShingleStrings.register(s, 2)
      val db = fdocs(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          explode(array_distinct(
            graft.functions.ShingleStrings(col("toks"), 2))).as("bg"))
      val dfRel = db.groupBy(col("bg")).agg(count(lit(1)).as("df"))
      db.join(dfRel, "bg")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
        .withColumn("novelty", round(col("n_novel") / col("n_bigrams"), 6))
        .orderBy(col("doc_id"))
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
                 b AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks)),
                              i -> toks[i] || ' ' || toks[i + 1]))) AS bg
                       FROM t WHERE len(toks) >= 2),
                 f AS (SELECT bg, count(*) AS df FROM b GROUP BY bg)
            SELECT doc_id, count(*) AS n_bigrams,
                   CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
                   round(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS novelty
            FROM b JOIN f USING (bg) GROUP BY doc_id ORDER BY doc_id""")
  )

  /** q84 — token co-occurrence lift over a FIXED analysis vocabulary
    * (wave 3): for the top-50 tokens by document frequency, pairs that
    * co-occur in ≥20 documents, scored by lift
    * = P(a,b) / (P(a)·P(b)) = c_ab·N / (df_a·df_b) — the corpus
    * association-mining audit (collocations, topic structure). Lift stays
    * a ratio of exact integers (one IEEE division, round 6) — no log/PMI
    * whose libm ulps differ across engines.
    *
    * Scale notes: THE pair-blowup guard is the fixed vocabulary — the
    * top-V relation is V rows, broadcast; per-doc intersections are ≤ V
    * tokens, so pair fan-out is ≤ V²/2 per doc, a CONSTANT bound
    * (unlike df-threshold filters, which are data-dependent at web
    * scale). At fixture scale c_ab·N and df_a·df_b fit comfortably in
    * longs; at corpus scale cast to double before the multiply (the
    * ratio, not the products, is the signal). Head via
    * TakeOrderedAndProject. */
  private val q84 = GQuery(
    "q84_cooccurrence_lift",
    (s, d) => {
      val docs = fdocs(s, d)
      val dt = docs.select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("token"))
      val dfRel = dt.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val top = dfRel.orderBy(col("df").desc, col("token")).limit(50)
      val pairs = dt.join(broadcast(top), "token")
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("token"), col("df")))).as("ts"))
        .select(explode(graft.functions.TextOps.orderedPairs(col("ts"))).as("p"))
        .select(col("p.d1.token").as("t1"), col("p.d1.df").as("df1"),
          col("p.d2.token").as("t2"), col("p.d2.df").as("df2"))
        .groupBy(col("t1"), col("df1"), col("t2"), col("df2"))
        .agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 20)
      pairs.crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
        .withColumn("lift",
          round((col("c_ab") * col("n_docs")) / (col("df1") * col("df2")), 6))
        .select(col("t1"), col("t2"), col("c_ab"), col("lift"))
        .orderBy(col("lift").desc, col("t1"), col("t2"))
        .limit(100)
    },
    Some("""WITH dt AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
                        FROM documents),
                 f AS (SELECT token, count(*) AS df FROM dt GROUP BY token),
                 top AS (SELECT token, df FROM f ORDER BY df DESC, token LIMIT 50),
                 ft AS (SELECT dt.doc_id, dt.token, top.df FROM dt JOIN top USING (token)),
                 pr AS (SELECT a.token AS t1, a.df AS df1, b.token AS t2, b.df AS df2,
                               count(*) AS c_ab
                        FROM ft a JOIN ft b
                          ON a.doc_id = b.doc_id AND a.token < b.token
                        GROUP BY 1, 2, 3, 4 HAVING count(*) >= 20),
                 n AS (SELECT count(*) AS n_docs FROM documents)
            SELECT t1, t2, c_ab,
                   round((c_ab * n_docs) * 1.0 / (df1 * df2), 6) AS lift
            FROM pr, n
            ORDER BY lift DESC, t1, t2 LIMIT 100""")
  )

  /** q87 — BM25 retrieval scoring (wave 4): every document scored against
    * a fixed 3-term query with Okapi BM25 (k1=1.2, b=0.75), the standard
    * lexical ranking function — the retrieval step of a RAG / data-mining
    * pipeline run IN the engine instead of an external search service.
    *
    * Determinism: the per-document score is a FIXED-ORDER sum of the
    * three per-term components (pivoted to columns and added left-to-
    * right), never a SQL SUM over rows whose order the shuffle owns —
    * the same reasoning as q42's rounded-rank tie-break. ln() may differ
    * from DuckDB's libm by 1 ulp; round(6) absorbs it (q42 precedent).
    *
    * Scale notes (100 TB): tokens are filtered to the query terms BEFORE
    * the tf aggregate, so the shuffled relation is (docs containing a
    * term) × 3 rows max, not the corpus token stream; df is a 3-row
    * aggregate of that same relation (broadcast); doc length is a map-
    * side size(); the pivot is 3 fixed columns, no wide-pivot hazard. */
  private val BM25_TERMS = Seq("spark", "merge", "window")
  private val q87 = GQuery(
    "q87_bm25",
    (s, d) => {
      val docs = fdocs(s, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(col("doc_id"), size(col("toks")).cast("long").as("len"), col("toks"))
      val stats = docs.agg(count(lit(1)).as("n"), sum(col("len")).as("sumlen"))
      val tf = docs
        .select(col("doc_id"), col("len"), explode(col("toks")).as("token"))
        .filter(col("token").isin(BM25_TERMS: _*))
        .groupBy(col("doc_id"), col("len"), col("token"))
        .agg(count(lit(1)).as("tf"))
      val dfr = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val comp = tf
        .join(broadcast(dfr), "token")
        .crossJoin(broadcast(stats))
        .withColumn("c",
          log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
            * (col("tf") * lit(2.2))
            / (col("tf") + lit(1.2) *
               (lit(0.25) + lit(0.75) * col("len") / (col("sumlen") / col("n")))))
      comp.groupBy(col("doc_id"))
        .pivot("token", BM25_TERMS)
        .agg(first(col("c")))
        .select(col("doc_id"),
          round(coalesce(col(BM25_TERMS(0)), lit(0.0))
            + coalesce(col(BM25_TERMS(1)), lit(0.0))
            + coalesce(col(BM25_TERMS(2)), lit(0.0)), 6).as("score"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH dl AS (SELECT doc_id, len(string_split(text, ' ')) AS len FROM documents),
                 st AS (SELECT count(*) AS n, sum(len) AS sumlen FROM dl),
                 tf AS (SELECT doc_id, token, count(*) AS tf
                        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
                        WHERE token IN ('spark', 'merge', 'window')
                        GROUP BY doc_id, token),
                 dfr AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
                 comp AS (SELECT tf.doc_id, tf.token,
                                 ln(1.0 + (st.n - dfr.df + 0.5) / (dfr.df + 0.5))
                                 * (tf.tf * 2.2)
                                 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.len / (st.sumlen * 1.0 / st.n))) AS c
                          FROM tf JOIN dfr USING (token) JOIN dl USING (doc_id) CROSS JOIN st)
            SELECT doc_id,
                   round(coalesce(max(CASE WHEN token = 'spark' THEN c END), 0)
                       + coalesce(max(CASE WHEN token = 'merge' THEN c END), 0)
                       + coalesce(max(CASE WHEN token = 'window' THEN c END), 0), 6) AS score
            FROM comp GROUP BY doc_id ORDER BY doc_id""")
  )

  /** q99 — BPE merge statistics (wave 5): corpus-wide adjacent
    * character-pair counts within words — the count table a byte-pair-
    * encoding tokenizer trainer builds every merge round (the top pair
    * IS the next merge). One round is the representative kernel: the
    * full trainer loops count→merge with the merged symbol re-entering
    * the pair alphabet, and every round is this same job shape.
    *
    * Scale notes: two chained map-side explodes (words, then the char
    * index range — no per-row pair array materialized), one shuffle
    * carrying (pair, partial count) after map-side combine — the
    * reference's wordcount shape at character granularity; the head is
    * TakeOrderedAndProject 30-row heaps. */
  private val q99 = GQuery(
    "q99_bpe_pair_stats",
    (s, d) =>
      fdocs(s, d)
        .select(explode(tokens(col("text"))).as("w"))
        .filter(length(col("w")) >= 2)
        .select(explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => col("w").substr(i, lit(2)))).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair")).limit(30),
    Some("""WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
                 p AS (SELECT unnest(list_transform(range(1, len(w)),
                              i -> substr(w, i, 2))) AS pair
                       FROM w WHERE len(w) >= 2)
            SELECT pair, count(*) AS cnt FROM p
            GROUP BY pair ORDER BY cnt DESC, pair LIMIT 30""")
  )

  /** q101 — perplexity bucketing (wave 5): score every document by its
    * average negative log-likelihood under an add-one-smoothed corpus
    * bigram LM, then split the corpus into head/middle/tail NLL terciles
    * — the CCNet recipe (Wenzek et al. 2020) that decides which slice of
    * a crawl is worth training on, with the corpus's own bigram stats
    * standing in for the external LM (the job shape is identical; a real
    * LM plugs into q72's batch-inference plumbing).
    *
    * Scale notes: the model relations (bigram counts, left-context
    * totals, vocabulary) are aggregate-sized and AQE-broadcast at
    * measured size (the q42 pattern — shuffle-join fallback at web
    * scale); the occurrence relation is materialized once and feeds
    * build and probe sides; tercile boundaries come from
    * Ranks.quantileCont (parallel range sort, never a single-task
    * percentile) and join back as a 1-row broadcast. Per-doc NLL is
    * rounded to 6 BEFORE the quantile so both engines rank identical
    * doubles — boundary comparisons are then decided identically (an
    * interpolated boundary can only equal a score when the straddling
    * order stats tie, in which case it is exact in both engines). */
  private val q101 = GQuery(
    "q101_perplexity_bucket",
    (s, d) => {
      graft.functions.ShingleStrings.register(s, 2)
      val occ = graft.sources.Io.materialize(
        fdocs(s, d)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            explode(graft.functions.ShingleStrings(col("toks"), 2)).as("bg")))
      val bc = occ.groupBy(col("bg")).agg(count(lit(1)).as("cbg"))
      val wc = bc
        .withColumn("w1", element_at(split(col("bg"), " "), 1))
        .groupBy(col("w1")).agg(sum(col("cbg")).as("cw1"))
      val vocab = fdocs(s, d)
        .select(explode(tokens(col("text"))).as("tok"))
        .agg(countDistinct(col("tok")).as("vv"))
      // r16 (guide §3.2): pre-join the MODEL relations — bc ⋈ wc ⋈ vocab
      // are all aggregate-sized, so the per-bigram log-likelihood term
      // collapses to one bg→term lookup BEFORE the corpus-sized join.
      // The old form joined occ twice (bg, then w1) and re-split the
      // bigram string PER OCCURRENCE ROW; now the string split and the
      // log2 run once per DISTINCT bigram and occ does a single
      // AQE-broadcast join. Per-row doubles are identical (same
      // cbg/cw1/vv inputs), so the round-6 NLL is unchanged.
      val model = bc
        .withColumn("w1", element_at(split(col("bg"), " "), 1))
        .join(wc, "w1")
        .crossJoin(broadcast(vocab))
        .select(col("bg"),
          log2((col("cbg") + lit(1.0)) / (col("cw1") + col("vv"))).as("term"))
      // materialized: three consumers (two quantile boundaries + the
      // bucket pass) would otherwise re-evaluate the model joins
      val scores = graft.sources.Io.materialize(occ
        .join(model, "bg")
        .groupBy(col("doc_id"))
        .agg(round(-avg(col("term")), 6).as("nll")))
      // both tercile boundaries from ONE rank pass (quantilesCont —
      // value-identical to two single-p calls, half the Ranks stages)
      val b = Ranks.quantilesCont(scores.withColumn("g", lit(1)), "g",
        col("nll"), Seq(1.0 / 3 -> "b1", 2.0 / 3 -> "b2")).drop("g")
      scores.crossJoin(broadcast(b))
        .select(col("doc_id"), col("nll"),
          when(col("nll") <= col("b1"), lit("head"))
            .when(col("nll") <= col("b2"), lit("middle"))
            .otherwise(lit("tail")).as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), round(avg(col("nll")), 4).as("avg_nll"))
        .orderBy(col("bucket"))
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
                 occ AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                                i -> toks[i] || ' ' || toks[i + 1])) AS bg
                         FROM t WHERE len(toks) >= 2),
                 bc AS (SELECT bg, count(*) AS cbg FROM occ GROUP BY bg),
                 wc AS (SELECT string_split(bg, ' ')[1] AS w1,
                               CAST(sum(cbg) AS BIGINT) AS cw1
                        FROM bc GROUP BY 1),
                 v AS (SELECT count(DISTINCT tok) AS vv
                       FROM (SELECT unnest(toks) AS tok FROM t)),
                 sc AS (SELECT doc_id,
                               round(-avg(log2((cbg + 1.0) / (cw1 + vv))), 6) AS nll
                        FROM occ JOIN bc USING (bg)
                             JOIN wc ON string_split(bg, ' ')[1] = wc.w1, v
                        GROUP BY doc_id),
                 q AS (SELECT quantile_cont(nll, 1.0/3) AS b1,
                              quantile_cont(nll, 2.0/3) AS b2 FROM sc)
            SELECT CASE WHEN nll <= b1 THEN 'head'
                        WHEN nll <= b2 THEN 'middle'
                        ELSE 'tail' END AS bucket,
                   count(*) AS n_docs, round(avg(nll), 4) AS avg_nll
            FROM sc, q GROUP BY 1 ORDER BY bucket""")
  )

  /** q109 — KMV distinct-count sketch audit (wave 5): per-source
    * vocabulary cardinality estimated from the k minimum md5-60bit token
    * hashes, next to the exact count and the relative error. KMV is the
    * mergeable sketch HLL families approximate — but DETERMINISTIC and
    * engine-portable (integer hashes, integer k-th minimum), so unlike
    * approx_count_distinct the whole sketch pipeline is oracle-checkable.
    * At 100 TB this is how per-segment cardinalities roll up: each
    * segment keeps its k-head, merge is the k-smallest of the union —
    * the BoundedHead aggregate again (s11's merge kernel), every partial
    * state ≤ k longs.
    *
    * Scale notes: one (source, hash)-distinct shuffle (the same shape as
    * countDistinct's Expand-free plan), then a |sources|-group aggregate
    * whose state is k-bounded by construction. The estimate
    * (k−1)·2⁶⁰∕h_k runs on identical long→double conversions in both
    * engines. Sources with < k distinct hashes report exactly. */
  private val KmvK = 256
  private val q109 = GQuery(
    "q109_kmv_distinct",
    (s, d) => {
      val H = 1.152921504606846976e18 // 2^60 — the hash space size
      val hashes = fdocs(s, d)
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
        .select(col("source"),
          graft.functions.TextOps.shingleHash60(col("tok")).as("h"))
        .distinct()
      hashes.groupBy(col("source"))
        .agg(count(lit(1)).as("n_exact"),
          graft.functions.BoundedHead.head(KmvK)(array(col("h"))).as("heads"))
        .select(col("source"), col("n_exact"),
          round(when(size(col("heads")) < KmvK, col("n_exact").cast("double"))
            .otherwise(lit((KmvK - 1).toDouble) * H /
              element_at(col("heads"), KmvK)), 2).as("n_est"))
        .withColumn("rel_err",
          round(abs(col("n_est") - col("n_exact")) / col("n_exact"), 4))
        .orderBy(col("source"))
    },
    Some(s"""WITH h AS (SELECT DISTINCT source,
                    CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h
                 FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
                       FROM documents)),
           a AS (SELECT source, count(*) AS n_exact,
                        (list_sort(list(h)))[1:$KmvK] AS heads
                 FROM h GROUP BY source),
           e AS (SELECT source, n_exact,
                        round(CASE WHEN len(heads) < $KmvK
                              THEN CAST(n_exact AS DOUBLE)
                              ELSE ${(KmvK - 1).toDouble} * 1.152921504606846976e18
                                   / CAST(heads[$KmvK] AS DOUBLE) END, 2) AS n_est
                 FROM a)
           SELECT source, n_exact, n_est,
                  round(abs(n_est - n_exact) / n_exact, 4) AS rel_err
           FROM e ORDER BY source""")
  )

  /** q123 — EXACT heavy hitters over the token stream via the classic
    * two-pass sketch-then-recount algorithm (round 7): tokens whose
    * frequency exceeds n/50 of the corpus, with exact counts and
    * basis-point share. The vocabulary-scale question q77 answers in
    * aggregate (Zipf magnitudes) answered at the KEY level — and the
    * shape every "top terms / stopword list / hot key" audit takes when
    * the key space is too large to groupBy outright.
    *
    * Pass 1 is graft.functions.MisraGries (capacity 64): one bounded
    * O(m)-state summary per partition, merged under the Agarwal
    * mergeable-summaries rule inside a single aggregate — guarantees
    * every key with true share > 1/65 survives as a candidate, for ANY
    * input order or partitioning. Pass 2 recounts ONLY the <= 64
    * candidates exactly (broadcast semi-join probe + partial-combine
    * count) and applies the n/50 threshold in exact integer arithmetic —
    * so the output is the exact heavy-hitter set even though the sketch
    * pass is order-sensitive; the oracle brute-forces GROUP BY + HAVING.
    *
    * Scale notes: pass 1 shuffles m-entry summaries (one per partition),
    * pass 2 shuffles <= 64 candidate groups after map-side combine —
    * neither is vocabulary-sized. The full groupBy the oracle runs would
    * shuffle |vocab| groups; the two-pass plan replaces that with O(m)
    * state, the point of the algorithm at 10^9-key spaces. */
  private val q123 = GQuery(
    "q123_heavy_hitters",
    (s, d) => {
      val toks = fdocs(s, d).select(explode(tokens(col("text"))).as("token"))
      // ONE sketch pass yields both the candidates and the stream length
      // (n_total rides the same aggregate) — a literal two-pass plan:
      // sketch+count, then candidate recount
      val sketch = graft.sources.Io.materialize(toks
        .agg(graft.functions.MisraGries(64)(col("token")).as("mg"),
          count(lit(1)).as("n_total")))
      val cand = sketch.select(explode(map_keys(col("mg"))).as("token"))
      toks.join(broadcast(cand), "token")
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(sketch.select(col("n_total"))))
        .filter(col("cnt") * 50 > col("n_total"))
        .select(col("token"), col("cnt"),
          expr("(cnt * 10000) div n_total").as("share_bp"))
        .orderBy(col("cnt").desc, col("token"))
    },
    Some("""WITH t AS (SELECT unnest(string_split(text, ' ')) AS token
                       FROM documents),
            n AS (SELECT count(*) AS n_total FROM t),
            c AS (SELECT token, count(*) AS cnt FROM t GROUP BY 1)
            SELECT token, cnt,
                   CAST((cnt * 10000) // n_total AS BIGINT) AS share_bp
            FROM c, n WHERE cnt * 50 > n_total
            ORDER BY cnt DESC, token""")
  )

  /** The BPE merge-application rewrite, applied `n` times — shared
    * verbatim between the engine and the oracle so both sides run the
    * SAME algorithm: `replace` merges non-overlapping occurrences
    * left-to-right, and because a replaced occurrence consumes its
    * trailing boundary space, immediately-adjacent repeats of the pair
    * need another pass; three passes merge every run up to length 2^3,
    * far beyond any natural word. %s is the column expression. Shared
    * with q127's encode pass (Wave8Queries), which applies the SAME
    * rewrite to per-document symbol streams. */
  private[graft] def bpeRewriteSql(pair: String, n: Int): String = {
    val merged = pair.replace(" ", "")
    (1 to n).foldLeft("%s")((acc, _) => s"replace($acc, ' $pair ', ' $merged ')")
  }

  /** The q126 training loop, extracted so q127 (tokenizer APPLY) learns
    * the identical merge table: `rounds` argmax rounds over the
    * DISTINCT-word frequency relation, each a 1-row collect (driver
    * state = `rounds` merge strings — the q102 bounded-scalar pattern).
    * Returns (merge_no, pair, weighted count) in learned order; shorter
    * than `rounds` iff the corpus merges to single symbols first. */
  private[graft] def trainBpeMerges(s: org.apache.spark.sql.SparkSession,
      d: String, rounds: Int): Seq[(Int, String, Long)] = {
    val words = fdocs(s, d)
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(concat(lit(" "), concat_ws(" ", split(col("w"), "")), lit(" "))
        .as("sym"), col("freq"))
    var cur = graft.sources.Io.materialize(words)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      r += 1
      val top = cur
        .select(col("freq"), split(expr("trim(sym)"), " ").as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(a) - 1), i -> concat(a[i-1], ' ', a[i]))"))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true // fully merged corpus: the
      // oracle's mN CTE is likewise empty, so both sides stop short
      else {
        val (pair, cnt) = (top(0).getString(0), top(0).getLong(1))
        // fixture alphabet is alphanumeric; the rewrite interpolates the
        // pair into SQL text, so fail fast on anything exotic
        require(pair.matches("[A-Za-z0-9 ]+"), s"unexpected pair alphabet: '$pair'")
        merges += ((r, pair, cnt))
        cur = graft.sources.Io.materialize(
          cur.withColumn("sym", expr(bpeRewriteSql(pair, 3).format("sym"))))
      }
    }
    merges.toSeq
  }

  /** q126 — BPE tokenizer TRAINING, three merge rounds end to end
    * (round 7 wave 7): the Sennrich et al. 2016 loop that q99 showed one
    * static round of — weighted adjacent-pair counts over the
    * word-frequency relation, argmax becomes the next merge rule, the
    * rule rewrites every word's symbol sequence, and the merged symbol
    * re-enters the pair alphabet for the next round. Output: the three
    * learned merges with their winning weighted counts — the artifact a
    * tokenizer ships.
    *
    * Scale notes: the corpus collapses to the DISTINCT-word frequency
    * relation up front (pair counting is freq-weighted — all downstream
    * cost tracks vocabulary, not corpus size); each round is one
    * map-side pair explode + partial-combine sum + a 1-ROW argmax
    * collect (driver state = k merge-rule strings, the q102 bounded-
    * scalar pattern), and merge application is a map-only string
    * rewrite. Rounds materialize (Io.materialize) so round r+1 scans
    * round r's relation instead of re-deriving the chain.
    *
    * Determinism: counts are exact integers; the argmax tie-breaks
    * (cnt DESC, pair ASC); both engines apply the IDENTICAL
    * triple-replace rewrite (bpeRewriteSql), so symbol sequences stay
    * bit-equal round for round. */
  private val q126 = GQuery(
    "q126_bpe_train",
    (s, d) => {
      import s.implicits._
      trainBpeMerges(s, d, 3).toDF("merge_no", "pair", "cnt")
        .orderBy(col("merge_no"))
    },
    {
      // unrolled 3-round oracle: sN applies mN's merge to sN-1 with the
      // SAME triple-replace; DuckDB's 1-based list slicing splits chars
      def round(i: Int): String = {
        val prev = s"s${i - 1}"
        s"""p$i AS (SELECT unnest([a[i] || ' ' || a[i + 1] FOR i IN range(1, len(a))]) AS pair,
                           freq
                    FROM (SELECT string_split(trim(sym), ' ') AS a, freq FROM $prev)),
            m$i AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM p$i
                    GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1),
            s$i AS (SELECT ${"replace(" * 3}sym,
                             ' ' || pair || ' ', ' ' || replace(pair, ' ', '') || ' '),
                             ' ' || pair || ' ', ' ' || replace(pair, ' ', '') || ' '),
                             ' ' || pair || ' ', ' ' || replace(pair, ' ', '') || ' ') AS sym,
                           freq
                    FROM $prev, m$i)"""
      }
      Some(s"""WITH wf AS (SELECT w, count(*) AS freq
                           FROM (SELECT unnest(string_split(text, ' ')) AS w
                                 FROM documents) GROUP BY w),
               s0 AS (SELECT ' ' || array_to_string([w[i:i] FOR i IN range(1, len(w) + 1)], ' ')
                               || ' ' AS sym, freq
                      FROM wf),
               ${round(1)}, ${round(2)}, ${round(3)}
               SELECT CAST(1 AS INTEGER) AS merge_no, pair, cnt FROM m1
               UNION ALL SELECT CAST(2 AS INTEGER), pair, cnt FROM m2
               UNION ALL SELECT CAST(3 AS INTEGER), pair, cnt FROM m3
               ORDER BY merge_no""")
    }
  )

  val all: Seq[GQuery] = Seq(q56, q57, q58, q75, q77, q81, q82, q84, q87,
    q99, q101, q109, q123, q126)
}
