package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline building blocks shared by the dedup / text-analysis
  * operators. Everything here is a pure Catalyst expression tree (no UDFs)
  * so it stays inside whole-stage codegen and can be mirrored exactly in
  * the DuckDB oracle SQL.
  */
object TextOps {

  /** Whitespace tokens; the corpus is clean space-separated lowercase. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct n-token shingles (1-based slices). Documents shorter than n
    * contribute no shingles. Determinism: array_distinct preserves set
    * membership; downstream use is order-insensitive (explode + group).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** All bigram occurrences "w1 w2" in document order, repeats kept
    * (unlike `shingles`, which dedups) — the n-gram LM statistics base:
    * occurrence counts are what language-model estimates need. Docs with
    * fewer than 2 tokens contribute none. SQL twin:
    * `unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]))`. */
  def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** MinHash of a shingle set for a given seed: min over 60-bit integers
    * parsed from the leading 15 hex digits of md5. md5 produces identical
    * output in DuckDB, so the signature is oracle-checkable — a
    * cross-engine deterministic stand-in for the usual (a*x+b) mod p
    * permutations, with md5 uniformity giving classic MinHash behavior.
    * Integer (not hex-string) form so the aggregation takes
    * HashAggregate's fast fixed-width path instead of SortAggregate.
    * The element may be any type with a stable string form (shingle text
    * or its 60-bit hash — the decimal digits cast identically in DuckDB). */
  def minhash(shingle: Column, seed: Int): Column =
    min(conv(substring(md5(concat(lit(s"$seed|"), shingle.cast("string"))), 1, 15), 16, 10)
      .cast("long"))

  /** Canonical document fingerprint: md5 over the sorted distinct token
    * set — a locality-insensitive content key for exact bag-of-words
    * dedup, identical in both engines. */
  def fingerprint(toks: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(toks))))

  /** Count of tokens that appear in a fixed marker set (exact, duplicate-
    * counting — unlike array_intersect which dedups). */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers: _*)))

  /** Content-hash split bucket in [0, 100): the md5-60bit of the document
    * text mod 100. ONE definition shared by the batch split (q58) and the
    * streaming router (s06) — the batch/streaming twin contract depends
    * on these staying bit-identical. SQL twin:
    * `CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 100`. */
  def contentSplitHash(text: Column): Column =
    pmod(conv(substring(md5(text), 1, 15), 16, 10).cast("long"), lit(100))

  /** md5-60bit hash of a shingle (or any string) as a signed long — the
    * 8-byte join/shuffle key the dedup and decontamination families carry
    * instead of shingle text. ONE definition shared by batch q68 and the
    * s08 streaming twin (their equivalence test depends on bit-identity).
    * SQL twin: `CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)`. */
  def shingleHash60(x: Column): Column =
    conv(substring(md5(x), 1, 15), 16, 10).cast("long")

  /** Blocked tokens of a document under the hash-sampled denylist: the
    * tokens whose keyed PRF (md5-60bit of token + ":bl") lands in residue
    * 0 mod `mod`. ONE definition shared by batch q175 and the s26
    * streaming gate (their equivalence test depends on bit-identity).
    * Evaluates as a higher-order filter over the token array — per-row,
    * codegen-composed, NO explode and no token-keyed shuffle. SQL twin of
    * the predicate: `CAST(concat('0x', substr(md5(tok || ':bl'), 1, 15))
    * AS BIGINT) % mod = 0`. */
  def blockedTokens(text: Column, mod: Int): Column =
    filter(tokens(text),
      t => pmod(shingleHash60(concat(t, lit(":bl"))), lit(mod)) === 0)

  /** All ordered pairs (d1 < d2) from a sorted array — in-bucket candidate
    * generation without a self-join (shared by the LSH dedup families:
    * shingle buckets, MinHash/SimHash bands, hyperplane buckets). */
  def orderedPairs(docs: Column): Column =
    flatten(transform(docs, (x, i) =>
      transform(slice(docs, i + 2, size(docs)),
        y => struct(x.as("d1"), y.as("d2")))))
}
