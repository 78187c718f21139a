package graft.util

/** Statistics-driven index geometry, shared by every operator whose bucket
  * or codebook space must GROW with the corpus (q41 hyperplane-LSH band
  * bits, q32 SimHash band bits, the q37/q76/q94 IVF codebook size).
  *
  * Why this exists: a fixed bucket space is quadratic in disguise —
  * candidate pairs grow as n²/buckets, and the r6 sf1 slope run measured
  * exactly that on q41 (10× data → 17× time from a fixed 1536-bucket
  * space). The fix that cleared it (bucket count ∝ n at constant expected
  * occupancy, driven by one driver-side scalar count from parquet
  * row-group metadata) is a pattern, not a one-off; this object is that
  * pattern as ONE tested function with exact SQL mirrors, so the engine
  * and the DuckDB oracle can never disagree about the geometry.
  *
  * Everything here is INTEGER arithmetic on purpose. The r6 formulation
  * computed `ceil(log(n/8)/log(2))` in Scala against `ceil(log2(n/8.0))`
  * in SQL; when n/8 lands on an exact power of two, a 1-ulp difference
  * between the two log implementations can flip the ceil and silently
  * hand the engines different band geometries (ADVICE r7). Bit-length
  * arithmetic has no ulps: `ceilLog2(n) = bitLength(n-1)`, mirrored in
  * DuckDB as `length(bin(n-1))`, is exact for every n.
  */
object Geometry {

  /** Integer ceil(log2(n)): the smallest e with 2^e >= n. 0 for n <= 1
    * (so degenerate corpora fall to the clamp floor, never to an error —
    * the r6 SQL form crashed DuckDB on n = 0 via CAST(-inf AS INTEGER)). */
  def ceilLog2(n: Long): Int =
    if (n <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1L)

  /** Band width (in bits) for an LSH-style bucket space: the smallest b
    * with 2^b >= n / 2^occLog2 — i.e. bucket count ∝ n at a constant
    * expected occupancy of 2^occLog2 — clamped to [floor, cap]. Exactly
    * ceil(log2(n / 2^occLog2)) since the divisor is a power of two.
    *
    * The floor pins every corpus below 2^(floor+occLog2) rows to the
    * historical fixture geometry (small-scale results unchanged); the cap
    * bounds the band key's width.
    */
  def adaptiveBits(n: Long, occLog2: Int, floor: Int, cap: Int): Int = {
    require(floor <= cap, s"floor $floor > cap $cap")
    math.min(cap, math.max(floor, ceilLog2(n) - occLog2))
  }

  /** IVF codebook size: B = 2^(ceilLog2(n) / 2), clamped — the integer
    * form of B ≈ √n (B² tracks n within a factor of 2), the standard
    * production sizing that keeps per-cell scan cost ~n/B ≈ √n. Power of
    * two so the SQL mirror is a shift, not a sqrt. */
  def adaptiveCodebook(n: Long, floor: Int, cap: Int): Int = {
    require(floor <= cap, s"floor $floor > cap $cap")
    math.min(cap, math.max(floor, 1 << (ceilLog2(n) / 2)))
  }

  /** Decimal blocking-key width for string-suffix blocking (q156): the
    * smallest k with 10^k >= ceil(n / occ) — i.e. key space ∝ n at a
    * constant expected block occupancy `occ` — clamped to [floor, cap].
    * Decimal (not binary) because the key IS a digit suffix: right(name,
    * k) spans exactly 10^k values. Same exactness discipline as
    * [[adaptiveBits]]: ceil-div then decimal digit count of (m-1), no
    * float logs, mirrored verbatim in [[adaptiveDigitsSql]]. */
  def adaptiveDigits(n: Long, occ: Long, floor: Int, cap: Int): Int = {
    require(floor <= cap, s"floor $floor > cap $cap")
    require(occ >= 1)
    val m = (n + occ - 1L) / occ
    val k = if (m <= 1L) 0 else java.lang.Long.toString(m - 1L).length
    math.min(cap, math.max(floor, k))
  }

  /** DuckDB mirror of [[adaptiveBits]] over an aggregate count expression.
    * `length(bin(c-1))` IS bitLength(c-1) = ceilLog2(c) for c >= 2; the
    * CASE guards c <= 1 (bin(-1) / bin(0) never evaluated). */
  def adaptiveBitsSql(countExpr: String, occLog2: Int, floor: Int, cap: Int): String =
    s"""GREATEST($floor, LEAST($cap,
        CASE WHEN $countExpr > 1
             THEN length(bin(CAST($countExpr AS BIGINT) - 1)) - $occLog2
             ELSE $floor END))"""

  /** DuckDB mirror of [[adaptiveDigits]] over an aggregate count
    * expression. `length(CAST(m - 1 AS VARCHAR))` IS the decimal digit
    * count of m-1 = ceilLog10(m) for m >= 2; the CASE guards m <= 1. */
  def adaptiveDigitsSql(countExpr: String, occ: Long, floor: Int, cap: Int): String =
    s"""GREATEST($floor, LEAST($cap,
        CASE WHEN $countExpr > $occ
             THEN length(CAST((($countExpr + $occ - 1) // $occ) - 1 AS VARCHAR))
             ELSE $floor END))"""

  /** Sampling modulus for a corpus-independent audit batch (q173): the
    * power-of-two modulus M = 2^(ceilLog2(n) - targetLog2) keeps the
    * expected sample n/M ≈ 2^targetLog2 CONSTANT as the corpus grows —
    * an audit (exact-recall baseline, spot-check, canary) must cost the
    * same at 100 TB as at 100 MB, so its sample size cannot scale with
    * n. Floor pins small corpora to the historical fixture modulus;
    * power of two so the SQL mirror is a shift, not a log. */
  def adaptiveSampleMod(n: Long, floor: Long, targetLog2: Int): Long =
    math.max(floor, 1L << math.max(0, ceilLog2(n) - targetLog2))

  /** DuckDB mirror of [[adaptiveSampleMod]] over an aggregate count. */
  def adaptiveSampleModSql(countExpr: String, floor: Long, targetLog2: Int): String =
    s"""GREATEST(CAST($floor AS BIGINT),
        CASE WHEN $countExpr > 1
             THEN (1::BIGINT << GREATEST(0,
                    length(bin(CAST($countExpr AS BIGINT) - 1)) - $targetLog2))
             ELSE CAST($floor AS BIGINT) END)"""

  /** DuckDB mirror of [[adaptiveCodebook]]. */
  def adaptiveCodebookSql(countExpr: String, floor: Int, cap: Int): String =
    s"""GREATEST($floor, LEAST($cap,
        CASE WHEN $countExpr > 1
             THEN (1::BIGINT << (length(bin(CAST($countExpr AS BIGINT) - 1)) // 2))
             ELSE $floor END))"""
}
