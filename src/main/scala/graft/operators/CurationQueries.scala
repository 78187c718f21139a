package graft.operators

import graft.GQuery
import graft.functions.TextOps.{contentSplitHash, shingles, tokens}
import graft.sources.{Io, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Curation family (round 2, second wave): the operators that turn a
  * cleaned corpus into training data — chunking for a context window,
  * repetition-based quality scoring, benchmark decontamination, sequence
  * packing, and the filter-funnel audit report. Like the rest of the
  * engine these generalize the reference's map/shuffle/reduce shape
  * (parallel_sort.cpp / max_aggregation.cpp): per-row projections stay
  * map-only; anything cross-row is one bounded shuffle.
  */
object CurationQueries {

  private val ChunkLen = 32  // tokens per chunk
  private val Stride   = 24  // chunk start distance (overlap = 8)
  private val SeqLen   = 512 // tokens per packed training sequence

  /** doc_id + token array as ATTRIBUTES (lambda bodies re-evaluate
    * non-attribute expressions per element — the split must be
    * materialized before any transform references it). */
  private[operators] def withToks(s: SparkSession, d: String): DataFrame =
    // fanOut before tokenize: every consumer runs a per-token kernel next
    graft.sources.Io.fanOut(
      Tables.documents(s, d).select(col("doc_id"), col("text")))
      .select(col("doc_id"), tokens(col("text")).as("toks"))

  /** Non-distinct token trigrams (repetition counting needs occurrences,
    * unlike TextOps.shingles which dedups for set semantics). r17: the
    * interpreted transform is now the ShingleStrings kernel (identical
    * strings); the coalesce preserves the old empty-array-on-null-toks
    * total semantics (kernel nulls on null input). Callers must
    * ShingleStrings.register(s, 3) once. */
  private[operators] def trigrams(toks: Column): Column =
    coalesce(graft.functions.ShingleStrings(toks, 3),
      array().cast("array<string>"))

  /** Shared by q67/q70: doc_id, n_tokens, diversity (distinct/total
    * tokens), rep (duplicate-trigram fraction). All map-only — three
    * narrow projections, no shuffle. */
  private[operators] def repetitionFeatures(s: SparkSession, d: String): DataFrame = {
    graft.functions.ShingleStrings.register(s, 3)
    withToks(s, d)
      .select(col("doc_id"), col("toks"), trigrams(col("toks")).as("tri"))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        (size(array_distinct(col("toks"))).cast("double") / size(col("toks")))
          .as("diversity"),
        when(size(col("tri")) > 0,
          lit(1.0) - size(array_distinct(col("tri"))).cast("double")
            / size(col("tri")))
          .otherwise(lit(0.0)).as("rep"))
  }

  /** q66 — fixed-size overlapping chunking (32-token chunks, stride 24):
    * the context-window preparation step for training / RAG indexing.
    * Chunk k covers tokens [24k+1, 24k+32]; every token is covered and
    * consecutive chunks overlap by 8 tokens.
    *
    * Scale notes: pure 1:N map-only fan-out (explode of a per-row index
    * range) — no shuffle at all except the presentation sort. The emitted
    * chunk is hashed (md5) rather than carried as text, so the output
    * relation stays narrow no matter the chunk size. */
  private val q66 = GQuery(
    "q66_doc_chunking",
    (s, d) =>
      CorpusOps.chunk(Io.fanOut(Tables.documents(s, d)), "doc_id", "text", ChunkLen, Stride)
        .select(col("doc_id"), col("chunk_id"),
          size(col("chunk")).as("n_tokens"),
          md5(concat_ws(" ", col("chunk"))).as("chunk_hash"))
        .orderBy(col("doc_id"), col("chunk_id")),
    Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             c AS (SELECT doc_id, toks,
                          unnest(range(0, ((len(toks) - 1) // $Stride) + 1)) AS chunk_id
                   FROM t)
             SELECT doc_id, chunk_id,
                    CAST(len(toks[chunk_id * $Stride + 1 : chunk_id * $Stride + $ChunkLen]) AS INT) AS n_tokens,
                    md5(array_to_string(toks[chunk_id * $Stride + 1 : chunk_id * $Stride + $ChunkLen], ' ')) AS chunk_hash
             FROM c ORDER BY doc_id, chunk_id""")
  )

  /** q67 — repetition / diversity quality scores (Gopher-style filters):
    * duplicate-token fraction and duplicate-trigram fraction per document.
    *
    * Scale notes: entirely map-only (three narrow projections inside one
    * WholeStageCodegen span); the only exchange is the presentation sort.
    * Scores are rounded to 6 places so the oracle hash is stable. */
  private val q67 = GQuery(
    "q67_repetition_score",
    (s, d) =>
      repetitionFeatures(s, d)
        .select(col("doc_id"), col("n_tokens"),
          round(lit(1.0) - col("diversity"), 6).as("dup_token_frac"),
          round(col("rep"), 6).as("dup_trigram_frac"))
        .orderBy(col("doc_id")),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            g AS (SELECT doc_id, toks,
                         CASE WHEN len(toks) >= 3
                              THEN list_transform(range(1, len(toks) - 1),
                                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                              ELSE [] END AS tri
                  FROM t)
            SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
                   round(1.0 - len(list_distinct(toks)) * 1.0 / len(toks), 6) AS dup_token_frac,
                   CASE WHEN len(tri) > 0
                        THEN round(1.0 - len(list_distinct(tri)) * 1.0 / len(tri), 6)
                        ELSE 0.0 END AS dup_trigram_frac
            FROM g ORDER BY doc_id""")
  )

  /** q68 — benchmark decontamination: training documents that share at
    * least one 5-token shingle with the held-out test split (q58's
    * content-hash split: test = bucket >= 90, train = bucket < 80).
    * The step every serious pretraining pipeline runs before training.
    *
    * Scale notes: the join key is the md5-60bit of the shingle (8-byte
    * longs through the shuffle, never the shingle text). The test side
    * collapses to its DISTINCT shingle set first — benchmark-sized, i.e.
    * tiny relative to the corpus — and is broadcast, so the train side
    * is a map-side hash semi-join probe: one pass over the training
    * shingles, no corpus-sized shuffle. Per-doc shingles are already
    * distinct (TextOps.shingles), so count(1) IS the distinct overlap
    * count. */
  private val q68 = GQuery(
    "q68_decontaminate",
    (s, d) => {
      val docs = CorpusOps.withSplit(Io.fanOut(Tables.documents(s, d)), "text")
      CorpusOps.decontaminate(
        docs.filter(col("split") === "train"),
        docs.filter(col("split") === "test"),
        "doc_id", "text", n = 5)
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
                              CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 100 AS h
                       FROM documents),
            sh AS (SELECT doc_id, h,
                          CAST(concat('0x', substr(md5(sg), 1, 15)) AS BIGINT) AS sgh
                   FROM (SELECT doc_id, h,
                                unnest(list_distinct(list_transform(range(1, len(toks) - 3),
                                       i -> array_to_string(toks[i : i + 4], ' ')))) AS sg
                         FROM d WHERE len(toks) >= 5)),
            test AS (SELECT DISTINCT sgh FROM sh WHERE h >= 90)
            SELECT s.doc_id, count(*) AS n_shared
            FROM sh s JOIN test t USING (sgh)
            WHERE s.h < 80
            GROUP BY s.doc_id ORDER BY doc_id""")
  )

  /** q69 — sequence packing (concat-and-cut): lay all documents out in a
    * deterministic content-hash order, cut the token stream every 512
    * tokens, and assign each document to the sequence where its first
    * token lands. Reports per-sequence document count and token load —
    * the packing audit for a fixed-context training run.
    *
    * Scale notes: the global prefix sum is Ranks.runningSum (bounded
    * range slices + broadcast per-slice offsets), NOT a single-partition
    * window — the same decomposition as q61/q63/q65, so the layout step
    * parallelizes at any corpus size. Everything after it is one small
    * aggregate keyed by seq_id. */
  private val q69 = GQuery(
    "q69_sequence_pack",
    (s, d) =>
      CorpusOps.pack(Io.fanOut(Tables.documents(s, d)), "doc_id", "text", SeqLen)
        .groupBy(col("seq_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          min(col("doc_id")).as("min_doc"),
          max(col("doc_id")).as("max_doc"))
        .orderBy(col("seq_id")),
    Some(s"""WITH t AS (SELECT doc_id, md5(text) AS k,
                               len(string_split(text, ' ')) AS nt
                        FROM documents),
             c AS (SELECT doc_id, nt,
                          sum(nt) OVER (ORDER BY k, doc_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            - nt AS prior
                   FROM t)
             SELECT CAST(prior // $SeqLen AS BIGINT) AS seq_id,
                    count(*) AS n_docs,
                    CAST(sum(nt) AS BIGINT) AS total_tokens,
                    min(doc_id) AS min_doc, max(doc_id) AS max_doc
             FROM c GROUP BY 1 ORDER BY seq_id""")
  )

  /** q70 — curation filter funnel: classify every document by the FIRST
    * failing quality rule (length bounds → lexical diversity → trigram
    * repetition), then report the rejection breakdown — the audit table a
    * data-curation run publishes alongside its output.
    *
    * Scale notes: classification is map-only on top of q67's features;
    * the aggregate has ≤5 groups. The percentage denominator is a window
    * over the 5-row aggregate, not the corpus. */
  private val q70 = GQuery(
    "q70_filter_funnel",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      repetitionFeatures(s, d)
        .withColumn("reason",
          when(col("n_tokens") < 20, "too_short")
            .when(col("n_tokens") > 90, "too_long")
            .when(col("diversity") < 0.35, "low_diversity")
            .when(col("rep") > 0.01, "repetitive")
            .otherwise("pass"))
        .groupBy(col("reason"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"))
        .withColumn("pct",
          round(col("n_docs") * 100.0 / sum(col("n_docs")).over(Window.partitionBy()), 6))
        .select(col("reason"), col("n_docs"), col("pct"),
          round(col("sum_tokens") / col("n_docs"), 4).as("avg_tokens"))
        .orderBy(col("reason"))
    },
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            g AS (SELECT doc_id, len(toks) AS nt,
                         len(list_distinct(toks)) * 1.0 / len(toks) AS div,
                         CASE WHEN len(toks) >= 3
                              THEN 1.0 - len(list_distinct(list_transform(range(1, len(toks) - 1),
                                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                                   * 1.0 / (len(toks) - 2)
                              ELSE 0.0 END AS rep
                  FROM t),
            c AS (SELECT CASE WHEN nt < 20 THEN 'too_short'
                              WHEN nt > 90 THEN 'too_long'
                              WHEN div < 0.35 THEN 'low_diversity'
                              WHEN rep > 0.01 THEN 'repetitive'
                              ELSE 'pass' END AS reason, nt
                  FROM g),
            a AS (SELECT reason, count(*) AS n_docs, sum(nt) AS sum_nt FROM c GROUP BY 1)
            SELECT reason, n_docs,
                   round(n_docs * 100.0 / (SELECT count(*) FROM c), 6) AS pct,
                   round(sum_nt * 1.0 / n_docs, 4) AS avg_tokens
            FROM a ORDER BY reason""")
  )

  /** q72 — batched model inference: the scoring step every curation
    * pipeline runs (quality / toxicity / educational-value classifiers).
    * The plumbing is the real thing — typed mapPartitions so the model
    * loads ONCE per task (not per row), rows flow through fixed-size
    * micro-batches (how a real forward pass wants its input), and the
    * output is a narrow (id, features, score) relation.
    *
    * Scale notes: map-only — zero shuffle before the presentation sort;
    * model weights ride task binaries/broadcast, state is one model per
    * partition. Batching bounds peak memory per task regardless of
    * partition size. */
  private val q72 = GQuery(
    "q72_batch_inference",
    (s, d) => {
      import s.implicits._
      CorpusOps.scoreDocs(Io.fanOut(Tables.documents(s, d))
        .select(col("doc_id"), col("text"))
        .as[(Long, String)])
        .orderBy(col("doc_id"))
    },
    Some("""WITH f AS (SELECT doc_id, len(string_split(text, ' ')) AS nt,
                              len(list_distinct(string_split(text, ' '))) AS nd,
                              length(text) AS lc
                       FROM documents),
            z AS (SELECT doc_id, nt,
                         -1.5e0 + 2e-2 * nt + 2e0 * (nd * 1e0 / nt)
                                - 1e-1 * ((lc - (nt - 1)) * 1e0 / nt) AS zv
                  FROM f)
            SELECT doc_id, CAST(nt AS INTEGER) AS n_tokens,
                   round(5e-1 + 5e-1 * zv / (1e0 + abs(zv)), 6) AS score
            FROM z ORDER BY doc_id""")
  )

  /** q73 — MERGE / upsert (incremental corpus refresh): apply an incoming
    * crawl batch to the current snapshot — latest version wins per key,
    * new keys insert, untouched keys keep, and incoming tombstones delete.
    * The standard incremental-ingestion operator, expressed as a
    * full-outer join (what MERGE INTO lowers to on any engine).
    *
    * Fixture mapping: snapshot = q58 train split, incoming = test split,
    * merge key = doc_id mod 500 (forces key overlap between the splits);
    * within each side the LATEST version per key is chosen by max_by on
    * doc_id — an argmax AGGREGATE, not a window (one shuffle per side, no
    * per-key sort task). Tombstones are incoming docs with lang = 'de'.
    *
    * Scale notes: two key-partial-aggregated shuffles + one join on the
    * merge key; in production the incoming batch is crawl-sized (small vs
    * the snapshot) and broadcasts, making the merge one snapshot pass. */
  private val q73 = GQuery(
    "q73_merge_upsert",
    (s, d) => {
      val docs = Tables.documents(s, d).withColumn("k", col("doc_id") % 500)
        .withColumn("h", contentSplitHash(col("text")))
      def latest(side: DataFrame, p: String) = side
        .groupBy(col("k"))
        .agg(max(col("doc_id")).as(s"${p}_id"),
          max_by(col("n_chars"), col("doc_id")).as(s"${p}_chars"),
          max_by(col("lang"), col("doc_id")).as(s"${p}_lang"))
      val base = latest(docs.filter(col("h") < 80), "b")
      val inc  = latest(docs.filter(col("h") >= 90), "i")
      base.join(inc, Seq("k"), "full_outer")
        .withColumn("action",
          // null-safe tombstone test: a NULL i_lang must NOT delete (and
          // must agree with the oracle's IS NOT DISTINCT FROM)
          when(col("i_id").isNotNull && (col("i_lang") <=> "de"), "delete")
            .when(col("i_id").isNotNull && col("b_id").isNotNull, "update")
            .when(col("i_id").isNotNull, "insert")
            .otherwise("keep"))
        .filter(col("action") =!= "delete")
        .select(col("k"), col("action"),
          coalesce(col("i_id"), col("b_id")).as("doc_id"),
          coalesce(col("i_chars"), col("b_chars")).as("n_chars"),
          coalesce(col("i_lang"), col("b_lang")).as("lang"))
        .orderBy(col("k"))
    },
    Some("""WITH d AS (SELECT *, doc_id % 500 AS k,
                              CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 100 AS h
                       FROM documents),
            base AS (SELECT k, max(doc_id) AS b_id,
                            arg_max(n_chars, doc_id) AS b_chars,
                            arg_max(lang, doc_id) AS b_lang
                     FROM d WHERE h < 80 GROUP BY k),
            inc AS (SELECT k, max(doc_id) AS i_id,
                           arg_max(n_chars, doc_id) AS i_chars,
                           arg_max(lang, doc_id) AS i_lang
                    FROM d WHERE h >= 90 GROUP BY k),
            m AS (SELECT coalesce(base.k, inc.k) AS k, b_id, b_chars, b_lang,
                         i_id, i_chars, i_lang
                  FROM base FULL OUTER JOIN inc ON base.k = inc.k)
            SELECT k,
                   CASE WHEN i_id IS NOT NULL AND i_lang IS NOT DISTINCT FROM 'de' THEN 'delete'
                        WHEN i_id IS NOT NULL AND b_id IS NOT NULL THEN 'update'
                        WHEN i_id IS NOT NULL THEN 'insert'
                        ELSE 'keep' END AS action,
                   coalesce(i_id, b_id) AS doc_id,
                   coalesce(i_chars, b_chars) AS n_chars,
                   coalesce(i_lang, b_lang) AS lang
            FROM m
            WHERE NOT (i_id IS NOT NULL AND i_lang IS NOT DISTINCT FROM 'de')
            ORDER BY k""")
  )

  /** q74 — passage-level exact-substring dedup detection: 20-token spans
    * that appear in >= 2 documents (the repeated boilerplate/quotation/
    * template passages that whole-document dedup cannot see — the
    * "deduplicate exact substrings" pipeline op). Emits the passage hash,
    * its document frequency, and a capped sample of carrying docs; the
    * removal/clipping step consumes this relation.
    *
    * Scale notes: one explode of per-doc DISTINCT 20-shingles → one
    * shuffle keyed on the md5-60bit passage hash (8 bytes, never passage
    * text) with map-side partial counts; the sample list is capped so no
    * reducer materializes a corpus-sized posting. Unlike the q25/q31
    * candidate families there is NO stop cap — oversized buckets are not
    * noise here, they ARE the signal (heavily repeated passages).
    * The doc sample is flattened to a comma-joined string (sorted, so
    * canonical) — the generic CorpusOps.repeatedPassages keeps the typed
    * array; only this driver-facing registry entry reshapes it, because
    * the oracle harness cannot hash array cells. */
  private val q74 = GQuery(
    "q74_passage_dedup",
    (s, d) =>
      CorpusOps.repeatedPassages(Io.fanOut(Tables.documents(s, d)), "doc_id", "text",
        n = 20, minDocs = 2, sampleCap = 10)
        .withColumn("sample_docs",
          concat_ws(",", transform(col("sample_docs"), x => x.cast("string"))))
        .orderBy(col("psh")),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
            p AS (SELECT doc_id,
                         unnest(list_distinct(list_transform(range(1, len(toks) - 18),
                                i -> array_to_string(toks[i : i + 19], ' ')))) AS ps
                  FROM t WHERE len(toks) >= 20),
            h AS (SELECT doc_id,
                         CAST(concat('0x', substr(md5(ps), 1, 15)) AS BIGINT) AS psh
                  FROM p)
            SELECT psh, count(*) AS n_docs,
                   array_to_string((list_sort(list(doc_id)))[1:10], ',') AS sample_docs
            FROM h GROUP BY psh HAVING count(*) >= 2
            ORDER BY psh""")
  )

  /** q80 — cross-split NEAR-duplicate leakage audit (wave 3): the q58
    * content-hash split guarantees exact duplicates land in one split,
    * but near-duplicates can still straddle the boundary (train/test
    * contamination that exact-match decontamination like q68 cannot
    * see). This query counts MinHash candidate pairs whose endpoints sit
    * in different splits — the leakage matrix a curation pipeline
    * publishes before a dataset ships.
    *
    * Scale notes: the pair relation is the LSH-reduced q31 candidate set
    * (duplicate-sized, never all-pairs); split assignment is the map-only
    * q58 projection joined on doc_id; output is a ≤3-row aggregate with
    * canonical (least, greatest) pair ordering. */
  private val q80 = GQuery(
    "q80_split_leakage",
    (s, d) => {
      val splits = CorpusOps.withSplit(Io.fanOut(Tables.documents(s, d)), "text")
        .select(col("doc_id"), col("split"))
      CorpusOps.minhashCandidates(Io.fanOut(Tables.documents(s, d)), "doc_id", "text",
          shingleN = 5, stopCap = 1000, k = 8, bands = 2)
        .join(splits.toDF("doc1", "split1"), "doc1")
        .join(splits.toDF("doc2", "split2"), "doc2")
        .filter(col("split1") =!= col("split2"))
        .groupBy(least(col("split1"), col("split2")).as("split_a"),
          greatest(col("split1"), col("split2")).as("split_b"))
        .agg(count(lit(1)).as("n_leaky_pairs"),
          min(least(col("doc1"), col("doc2"))).as("min_doc"))
        .orderBy(col("split_a"), col("split_b"))
    },
    Some("""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        sh0 AS (SELECT doc_id,
                       CAST(concat('0x', substr(md5(sg), 1, 15)) AS BIGINT) AS sgh
                FROM (SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+4], ' ')
                        FOR i IN range(1, len(t) - 3)])) AS sg
                      FROM toks WHERE len(t) >= 5)),
        sh AS (SELECT doc_id, sgh FROM sh0
               WHERE sgh IN (SELECT sgh FROM sh0 GROUP BY sgh HAVING count(*) <= 1000)),
        sig AS (SELECT doc_id,
                    min(CAST(concat('0x', substr(md5('0|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h0,
                    min(CAST(concat('0x', substr(md5('1|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h1,
                    min(CAST(concat('0x', substr(md5('2|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h2,
                    min(CAST(concat('0x', substr(md5('3|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h3,
                    min(CAST(concat('0x', substr(md5('4|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h4,
                    min(CAST(concat('0x', substr(md5('5|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h5,
                    min(CAST(concat('0x', substr(md5('6|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h6,
                    min(CAST(concat('0x', substr(md5('7|' || CAST(sgh AS VARCHAR)), 1, 15)) AS BIGINT)) AS h7
                  FROM sh GROUP BY doc_id),
         band AS (SELECT doc_id, 0 AS band,
                         md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS bh FROM sig
                  UNION ALL
                  SELECT doc_id, 1 AS band,
                         md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) AS bh FROM sig),
         cand AS (SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
                  FROM band a JOIN band b
                    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         sp AS (SELECT doc_id,
                       CASE WHEN CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
                            WHEN CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
                            ELSE 'test' END AS split
                FROM documents),
         leaks AS (SELECT c.doc1, c.doc2, s1.split AS split1, s2.split AS split2
                   FROM cand c
                   JOIN sp s1 ON c.doc1 = s1.doc_id
                   JOIN sp s2 ON c.doc2 = s2.doc_id
                   WHERE s1.split <> s2.split)
         SELECT least(split1, split2) AS split_a,
                greatest(split1, split2) AS split_b,
                count(*) AS n_leaky_pairs,
                min(least(doc1, doc2)) AS min_doc
         FROM leaks GROUP BY 1, 2 ORDER BY split_a, split_b""")
  )

  /** q83 — training-mixture report (wave 3): per-source corpus shares —
    * the dataset card every training run publishes (how much of the mix
    * each source contributes, in documents and tokens, over how many
    * languages).
    *
    * Scale notes: map-only token-count feature, one ≤|sources|-group
    * aggregate with partial combine; the share denominators window over
    * the source-sized AGGREGATE relation (never the corpus), the q70
    * funnel pattern. */
  private val q83 = GQuery(
    "q83_source_mix",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      Tables.documents(s, d)
        .select(col("source"), col("lang"), size(tokens(col("text"))).as("nt"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nt")).as("total_tokens"),
          countDistinct(col("lang")).as("n_langs"))
        .withColumn("pct_tokens", round(col("total_tokens") * 100.0 /
          sum(col("total_tokens")).over(Window.partitionBy()), 6))
        .orderBy(col("source"))
    },
    Some("""WITH f AS (SELECT source, lang, len(string_split(text, ' ')) AS nt FROM documents),
                 a AS (SELECT source, count(*) AS n_docs,
                              CAST(sum(nt) AS BIGINT) AS total_tokens,
                              count(DISTINCT lang) AS n_langs
                       FROM f GROUP BY source)
            SELECT source, n_docs, total_tokens, n_langs,
                   round(total_tokens * 100.0 / sum(total_tokens) OVER (), 6) AS pct_tokens
            FROM a ORDER BY source""")
  )

  /** q95 — mixture quota rebalance (wave 4): shrink the corpus to a
    * fixed training budget (200 docs) with per-source quotas apportioned
    * PROPORTIONALLY in exact integer arithmetic — quota_s = (T·c_s) div N
    * — and each source's quota filled in the md5(doc_id) selection order
    * (the q52 key, so the SELECTION is oracle-checkable row-for-row).
    * This is the mixture-weighting step of corpus assembly: q83 reports
    * the mix, q95 enforces a target one. Floor apportionment
    * under-allocates by < |sources| docs (the standard largest-remainder
    * refinement would consume the slack; kept floor-simple and
    * documented).
    *
    * Scale notes: quotas are a |sources|-row broadcast; the per-source
    * rank window carries a LITERAL rank cap (the global budget) as its
    * first filter conjunct so WindowGroupLimit keeps map-side per-source
    * heaps of ≤T rows — the variable per-source quota then filters on the
    * broadcast column. Without the literal conjunct the rank filter is
    * column-vs-column and the pushdown cannot fire (plan-audited). */
  private val MixTarget = 200
  private val q95 = GQuery(
    "q95_mixture_quota",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val quotas = docs.groupBy(col("source")).agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(docs.agg(count(lit(1)).as("n"))))
        .select(col("source"), expr(s"($MixTarget * c) div n").as("quota"))
      docs.select(col("doc_id"), col("source"))
        .withColumn("_rk", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
        .filter(col("_rk") <= MixTarget)
        .join(broadcast(quotas), "source")
        .filter(col("_rk") <= col("quota"))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH c AS (SELECT source, count(*) AS c FROM documents GROUP BY source),
             q AS (SELECT source,
                          ($MixTarget * c) // (SELECT count(*) FROM documents) AS quota
                   FROM c),
             r AS (SELECT doc_id, source,
                          row_number() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
                   FROM documents)
             SELECT doc_id, source FROM r JOIN q USING (source)
             WHERE rk <= quota ORDER BY doc_id""")
  )

  /** q108 — curriculum packing (wave 5): order the corpus easiest-first
    * by a difficulty score (lexical diversity + length, exact-integer
    * ratios rounded to 6) and cut it into training phases of a fixed
    * token budget — the curriculum-learning preparation step; each phase
    * is what one training stage consumes. Phase = the bucket the doc's
    * STARTING token offset falls in, so a doc straddling a boundary
    * belongs to the phase it began in (the q69 packing rule).
    *
    * Scale notes: features are map-only; the global prefix sum runs
    * through Ranks.runningSum (bounded range slices + broadcast offsets
    * — never a single-task window; the decomposition pins its own slice
    * boundaries internally, so the single-consumer feature relation
    * needs no pre-materialization); the phase aggregate is
    * budget-bounded. Descending score order is encoded as an ascending
    * sort on the negated score (range partitioning samples ascending
    * bounds). */
  private val PhaseBudget = 10000L
  private val q108 = GQuery(
    "q108_curriculum_pack",
    (s, d) => {
      val t = tokens(col("text"))
      val feats = Io.fanOut(Tables.documents(s, d)).select(
        col("doc_id"),
        size(t).cast("bigint").as("n_tokens"),
        round(lit(0.5) * (size(array_distinct(t)).cast("double") / size(t)) +
          lit(0.5) * least(size(t) / lit(200.0), lit(1.0)), 6).as("score"))
        .withColumn("neg_score", -col("score"))
        .withColumn("g", lit("all"))
      Ranks.runningSum(feats, "g", Seq(col("neg_score"), col("doc_id")),
          col("n_tokens"), "cum_tokens")
        .select(col("doc_id"), col("n_tokens"), col("score"),
          expr(s"(cum_tokens - n_tokens) div $PhaseBudget").as("phase"))
        .groupBy(col("phase"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("phase_tokens"),
          round(avg(col("score")), 6).as("avg_score"),
          min(col("doc_id")).as("min_doc"))
        .orderBy(col("phase"))
    },
    Some(s"""WITH f AS (SELECT doc_id,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                    round(0.5 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                            / len(string_split(text, ' ')))
                        + 0.5 * least(len(string_split(text, ' ')) / 200.0, 1.0), 6) AS score
                 FROM documents),
           c AS (SELECT doc_id, n_tokens, score,
                        CAST(sum(n_tokens) OVER (ORDER BY -score, doc_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
                 FROM f)
           SELECT CAST((cum_tokens - n_tokens) // $PhaseBudget AS BIGINT) AS phase,
                  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS phase_tokens,
                  round(avg(score), 6) AS avg_score, min(doc_id) AS min_doc
           FROM c GROUP BY 1 ORDER BY phase""")
  )

  /** q113 — weighted systematic sample (wave 5): ~50 documents drawn with
    * probability proportional to length (n_chars), deterministically —
    * the weighted counterpart of q88's uniform hash sample. Docs are laid
    * on a line in md5(doc_id) order (content-independent, reproducible
    * shuffle), each covering an interval of its weight; a pick lands at
    * every multiple of step = total_weight div 50, and a doc is selected
    * iff its interval contains a pick. All arithmetic is exact integers
    * (`div` ≡ DuckDB `//` on our non-negative operands), so selection is
    * bit-reproducible across engines, runs, and partitionings — the
    * property priority/A-ExpJ sampling (float pow of hashes) cannot give
    * an oracle.
    *
    * Scale notes: the weight prefix sum runs through Ranks.runningSum
    * (materialized input, bounded range slices + broadcast offsets); the
    * step denominator is a 1-row broadcast; selection is then a map-only
    * predicate. A doc heavier than step is selected once (sampling
    * without replacement — multiplicity would double-count it). */
  private val WSampleN = 50
  private val q113 = GQuery(
    "q113_weighted_sample",
    (s, d) => {
      val feats = Io.materialize(Io.fanOut(Tables.documents(s, d))
        .select(col("doc_id"), col("n_chars").cast("long").as("w"))
        .withColumn("mkey", md5(col("doc_id").cast("string")))
        .withColumn("g", lit("all")))
      val cum = Ranks.runningSum(feats, "g", Seq(col("mkey"), col("doc_id")),
        col("w"), "cum_w")
      val step = feats.agg(expr(s"sum(w) div $WSampleN").as("step"))
      cum.crossJoin(broadcast(step))
        .filter(expr("((cum_w - 1) div step) > ((cum_w - w - 1) div step)"))
        .select(col("doc_id"), col("w"), col("cum_w"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH f AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
                               md5(CAST(doc_id AS VARCHAR)) AS mkey
                        FROM documents),
           c AS (SELECT doc_id, w,
                        CAST(sum(w) OVER (ORDER BY mkey, doc_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_w
                 FROM f),
           st AS (SELECT CAST(sum(w) // $WSampleN AS BIGINT) AS step FROM f)
           SELECT doc_id, w, cum_w FROM c, st
           WHERE ((cum_w - 1) // step) > ((cum_w - w - 1) // step)
           ORDER BY doc_id""")
  )

  /** q121 — temporal leave-last-k holdout split (round 7): per user, the
    * 2 most recent events become the holdout set, everything earlier is
    * train — the time-respecting evaluation split for behavioral /
    * sequential data, where q58's content-hash split would leak the
    * future into training (a model must never train on events later
    * than its test point). Output is the split audit: per (split,
    * event_type) event counts, distinct users, and exact value mass.
    *
    * Scale notes: one user-partitioned row_number window (per-partition
    * state = one user's events), then a ~10-group aggregate with
    * map-side partial combine; distinct-user counts expand per group
    * before partial aggregation (Spark's two-phase count-distinct).
    * Descending (ts, event_id) order fully tie-breaks, so the split is
    * deterministic and reproducible across runs and engines. */
  private val q121 = GQuery(
    "q121_user_holdout",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("split", when(col("rn") <= 2, "holdout").otherwise("train"))
        .groupBy(col("split"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          graft.Cols.dsum2(col("value")).as("sum_value"))
        .orderBy(col("split"), col("event_type"))
    },
    Some("""WITH rk AS (SELECT user_id, event_type, value,
                          row_number() OVER (PARTITION BY user_id
                                             ORDER BY ts DESC, event_id DESC) AS rn
                        FROM events)
            SELECT CASE WHEN rn <= 2 THEN 'holdout' ELSE 'train' END AS split,
                   event_type, count(*) AS n_events,
                   count(DISTINCT user_id) AS n_users,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM rk GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  /** q124 — FRACTIONAL benchmark contamination (round 7): per training
    * document, what fraction of its distinct 5-token shingles appears in
    * the held-out test split, with a severity bucket. q68 answers the
    * binary question (>= 1 shared shingle — the removal list); real
    * decontamination policies (n-gram-overlap thresholds à la GPT-3
    * appendix / Dolma) act on the OVERLAP FRACTION: a 1-shingle graze on
    * a 500-shingle document is noise, a 30% containment is a leak. This
    * is the relation such a thresholded policy consumes.
    *
    * Determinism: frac = n_shared/n_shingles as one int64/int64 double
    * division (identical cross-engine) rounded to 6; severity thresholds
    * compare in exact integer arithmetic (n_shared*10 < n_shingles), so
    * no float ever gates a row.
    *
    * Scale notes: rides exactly q68's plan shape — distinct test-side
    * shingle set broadcast, train side one map-side 8-byte-key probe —
    * plus one per-doc total (partial-combine count) and a doc-keyed left
    * join; nothing new shuffles at corpus scale. */
  private val q124 = GQuery(
    "q124_contamination_frac",
    (s, d) => {
      val docs = CorpusOps.withSplit(Io.fanOut(Tables.documents(s, d)), "text")
      val sh = CorpusOps.shingleHashes(
        docs.filter(col("split") === "train"), "doc_id", "text", n = 5)
      val totals = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
      val bench = CorpusOps.benchmarkShingleSet(
        docs.filter(col("split") === "test"), "doc_id", "text", n = 5)
      val shared = sh.join(broadcast(bench), "sgh")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      totals.join(shared, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_shared"))
        .select(col("doc_id"), col("n_shingles"), col("n_shared"),
          round(col("n_shared") / col("n_shingles"), 6).as("frac"),
          when(col("n_shared") === 0, "clean")
            .when(col("n_shared") * 10 < col("n_shingles"), "minor")
            .otherwise("major").as("severity"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks,
                              CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 100 AS h
                       FROM documents),
            sh AS (SELECT doc_id, h,
                          CAST(concat('0x', substr(md5(sg), 1, 15)) AS BIGINT) AS sgh
                   FROM (SELECT doc_id, h,
                                unnest(list_distinct(list_transform(range(1, len(toks) - 3),
                                       i -> array_to_string(toks[i : i + 4], ' ')))) AS sg
                         FROM d WHERE len(toks) >= 5)),
            test AS (SELECT DISTINCT sgh FROM sh WHERE h >= 90),
            tot AS (SELECT doc_id, count(*) AS n_shingles
                    FROM sh WHERE h < 80 GROUP BY 1),
            shr AS (SELECT s.doc_id, count(*) AS n_shared
                    FROM sh s JOIN test t USING (sgh)
                    WHERE s.h < 80 GROUP BY 1)
            SELECT tot.doc_id, n_shingles,
                   coalesce(n_shared, 0) AS n_shared,
                   round(CAST(coalesce(n_shared, 0) AS DOUBLE) / n_shingles, 6) AS frac,
                   CASE WHEN coalesce(n_shared, 0) = 0 THEN 'clean'
                        WHEN coalesce(n_shared, 0) * 10 < n_shingles THEN 'minor'
                        ELSE 'major' END AS severity
            FROM tot LEFT JOIN shr USING (doc_id)
            ORDER BY doc_id""")
  )

  val all: Seq[GQuery] = Seq(q66, q67, q68, q69, q70, q72, q73, q74, q80,
    q83, q95, q108, q113, q121, q124)
}
