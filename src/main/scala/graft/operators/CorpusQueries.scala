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
      Tables.documents(s, d)
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
    (s, d) =>
      Tables.documents(s, d)
        // toks must be an attribute before the lambda references it —
        // lambda bodies re-evaluate non-attribute expressions per element
        .select(tokens(col("text")).as("toks"))
        .select(explode(when(size(col("toks")) >= 2,
          transform(sequence(lit(1), size(col("toks")) - 1),
            i => concat_ws(" ",
              element_at(col("toks"), i),
              element_at(col("toks"), i + 1))))
          .otherwise(array().cast("array<string>"))).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 5)
        .orderBy(col("cnt").desc, col("bigram"))
        .limit(100),
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
      CorpusOps.withSplit(Tables.documents(s, d), "text")
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

  val all: Seq[GQuery] = Seq(q56, q57, q58)
}
