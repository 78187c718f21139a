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

  /** MinHash of a shingle set for a given seed, as a min over md5 hex
    * strings. Using md5 (available with identical output in DuckDB) makes
    * the signature oracle-checkable — a cross-engine deterministic stand-in
    * for the usual (a*x+b) mod p permutations. Uniformity of md5 makes the
    * min-hex-string estimator behave like classic MinHash. */
  def minhash(shingle: Column, seed: Int): Column =
    min(md5(concat(lit(s"$seed|"), shingle)))

  /** Canonical document fingerprint: md5 over the sorted distinct token
    * set — a locality-insensitive content key for exact bag-of-words
    * dedup, identical in both engines. */
  def fingerprint(toks: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(toks))))

  /** Count of tokens that appear in a fixed marker set (exact, duplicate-
    * counting — unlike array_intersect which dedups). */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers: _*)))
}
