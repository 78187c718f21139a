package graft

import graft.functions.NormalizeText
import org.apache.spark.sql.functions._

/** The fused NormalizeText kernel must equal the composed built-in form
  * (lower + three regexp_replace + trim + length) byte-for-byte — on the
  * fixture corpus (ASCII fast path) and on adversarial strings that
  * exercise collapse/trim edges and the non-ASCII fallback. */
class NormalizeTextSpec extends SparkSpec {
  import spark.implicits._

  private def composed(df: org.apache.spark.sql.DataFrame) = df.select(
    col("id"),
    trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("norm_text"),
    regexp_replace(col("text"), "[^a-z0-9 ]", "").as("alnum_only"),
    regexp_replace(col("text"), "[0-9]", "#").as("redacted"),
    length(regexp_replace(col("text"), "[^a-z]", "")).cast("bigint").as("n_alpha"))

  private def fused(df: org.apache.spark.sql.DataFrame) = {
    NormalizeText.register(spark)
    df.select(col("id"), NormalizeText(col("text")).as("nt"))
      .select(col("id"), col("nt.norm_text").as("norm_text"),
        col("nt.alnum_only").as("alnum_only"),
        col("nt.redacted").as("redacted"), col("nt.n_alpha").as("n_alpha"))
  }

  private def assertEqual(df: org.apache.spark.sql.DataFrame): Unit = {
    val a = composed(df).orderBy(col("id")).collect().toSeq
    val b = fused(df).orderBy(col("id")).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("fused kernel equals the composed built-ins on the documents fixture") {
    assertEqual(graft.sources.Tables.documents(spark, sfSmoke)
      .select(col("doc_id").as("id"), col("text")))
  }

  test("fused kernel equals the composed built-ins on adversarial strings") {
    val rows = Seq(
      "",                            // empty
      "   ",                         // all whitespace -> trim to empty
      "\t\n mixed WS\f runs \r here ",
      "UPPER lower MiXeD 0123 456",
      "a",                           // single char
      " leading and trailing ",
      "digits999interleaved0with0letters",
      "punct!@#$%^&*()_+-=[]{};':\",./<>?",
      "tabs\t\tbetween\t\twords",
      "café naïve résumé",   // non-ASCII fallback
      "中文 mixed ascii 42", // CJK fallback
      "AÉB 9"                   // uppercase + accented uppercase
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    assertEqual(rows.toDF("id", "text"))
  }
}
