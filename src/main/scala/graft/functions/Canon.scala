package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Canonical row encoding for the content-checksum family (q145 table
  * checksum, q148 snapshot diff, s21 streaming checksum) — the one place
  * the engine serializes a row to text before hashing it, shared so batch,
  * streaming, and every spec build byte-identical input to md5.
  *
  * NULL discipline (ADVICE r7, medium): Spark's `concat_ws` silently DROPS
  * null fields while SQL `||` nullifies the whole string — so a naive
  * encoding makes two engines disagree on any nullable column (the row
  * counts in n_rows but vanishes from the fingerprints on one side only),
  * and it is collision-ambiguous (rows differing only in WHICH field is
  * null encode identically). Every field therefore passes through an
  * explicit NULL sentinel: `coalesce(cast(f as string), chr(0))`. U+0000
  * cannot appear in any cast of a non-null numeric/date value and is
  * vanishingly unlikely in real text; both Spark and DuckDB 1.x carry it
  * through md5 verbatim (verified against DuckDB: md5('a'||chr(0)||'b') is
  * stable and NUL-containing varchars are legal).
  *
  * Field order and the '|' separator are part of the checksum contract:
  * change either and every stored fingerprint invalidates.
  */
object Canon {

  /** The NULL sentinel — U+0000, impossible in a cast numeric field. */
  val NullSentinel = "\u0000"

  /** One field: string-cast with the NULL sentinel. */
  def field(c: Column): Column = coalesce(c.cast("string"), lit(NullSentinel))

  /** Canonical '|'-joined row over sentinel-encoded fields. Safe under
    * nulls because every argument of concat_ws is non-null by
    * construction. */
  def row(fields: Column*): Column = concat_ws("|", fields.map(field): _*)

  /** DuckDB mirror of [[field]]. */
  def fieldSql(e: String): String = s"coalesce(CAST($e AS VARCHAR), chr(0))"

  /** DuckDB mirror of [[row]]. */
  def rowSql(exprs: String*): String =
    exprs.map(fieldSql).mkString(" || '|' || ")
}
