package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: q54's four normalization features in ONE
  * fused pass per row — struct(norm_text, alnum_only, redacted, n_alpha):
  *
  *   norm_text  = trim(regexp_replace(lower(text), "\\s+", " "))
  *   alnum_only = regexp_replace(text, "[^a-z0-9 ]", "")
  *   redacted   = regexp_replace(text, "[0-9]", "#")
  *   n_alpha    = length(regexp_replace(text, "[^a-z]", ""))
  *
  * The composed form runs FOUR java.util.regex passes per row, each with
  * its own UTF8String→String→UTF8String round-trip and result buffer —
  * measured at ~2.5 s of the 4.5 s q54 total on the sf1 fixture (50k
  * docs), the third-heaviest per-row kernel in the registry despite every
  * pattern being a plain character class. This kernel computes all four
  * outputs in a single byte-level scan when the payload is pure ASCII
  * (the documents corpus contract, FIXTURES.md: space-separated lowercase
  * words): per-byte table tests, zero regex machinery, zero intermediate
  * strings. Any non-ASCII byte falls back to the EXACT built-in
  * composition (UTF8String.toLowerCase + the same java.util.regex
  * patterns + UTF8String.trim), so results are identical to the
  * declarative form on any input — the fast path is an optimization, not
  * a semantics change, and NormalizeTextSpec asserts equality on both
  * paths. Byte-level correctness on the fast path: Java \s is exactly
  * [ \t\n\x0B\f\r] (all single-byte), ASCII lowering is the +32 range
  * map, trim() strips 0x20 only, and all four character classes are
  * single-byte, so byte arithmetic reproduces codepoint semantics.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = NormalizeText.Schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"normalize_text requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  val Schema: StructType = StructType(Seq(
    StructField("norm_text", StringType, nullable = false),
    StructField("alnum_only", StringType, nullable = false),
    StructField("redacted", StringType, nullable = false),
    StructField("n_alpha", LongType, nullable = false)))

  /** Invoked from both interpreted eval and generated code. */
  def compute(s: UTF8String): InternalRow = {
    val b = s.getBytes
    val n = b.length
    var ascii = true
    var i = 0
    while (i < n) { if ((b(i) & 0x80) != 0) { ascii = false; i = n }; i += 1 }
    if (!ascii) return slow(s)

    val norm = new Array[Byte](n)
    val aln = new Array[Byte](n)
    val red = new Array[Byte](n)
    var nNorm = 0
    var nAln = 0
    var nAlpha = 0L
    var pendingSpace = false
    var started = false
    i = 0
    while (i < n) {
      val c = b(i)
      red(i) = if (c >= '0' && c <= '9') '#'.toByte else c
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == ' ') {
        aln(nAln) = c; nAln += 1
      }
      if (c >= 'a' && c <= 'z') nAlpha += 1
      val lc = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
      val ws = lc == ' ' || lc == '\t' || lc == '\n' || lc == 0x0b ||
        lc == '\f' || lc == '\r'
      if (ws) {
        if (started) pendingSpace = true
      } else {
        if (pendingSpace) { norm(nNorm) = ' '; nNorm += 1; pendingSpace = false }
        norm(nNorm) = lc; nNorm += 1; started = true
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromBytes(norm, 0, nNorm),
      UTF8String.fromBytes(aln, 0, nAln),
      UTF8String.fromBytes(red, 0, n),
      nAlpha))
  }

  /** Exact replication of the composed built-ins for non-ASCII payloads:
    * lower() is UTF8String.toLowerCase, regexp_replace is java.util.regex
    * on the same patterns, trim() is UTF8String.trim (0x20 only), and
    * length() counts codepoints (the [a-z] survivor string is pure ASCII,
    * so its char count IS its codepoint count). */
  private def slow(s: UTF8String): InternalRow = {
    val str = s.toString
    val collapsed = s.toLowerCase.toString.replaceAll("\\s+", " ")
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(collapsed).trim(),
      UTF8String.fromString(str.replaceAll("[^a-z0-9 ]", "")),
      UTF8String.fromString(str.replaceAll("[0-9]", "#")),
      str.replaceAll("[^a-z]", "").length.toLong))
  }

  private val NAME = "normalize_text"

  def register(spark: SparkSession): Unit =
    Registry.ensure(spark, NAME)(exprs => NormalizeText(exprs.head))

  /** Column-API entry point; requires register(spark) once per session. */
  def apply(c: Column): Column = call_function(NAME, c)
}
