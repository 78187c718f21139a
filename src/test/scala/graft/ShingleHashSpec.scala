package graft

import graft.functions.{ShingleHash60, TextOps}
import org.apache.spark.sql.functions._

/** Parity pins for the r16 native shingle-hash kernel: its output must
  * be bit-identical to the expression-tree form it replaced
  * (transform(sequence…) over conv(substring(md5(concat_ws(" ", slice)))))
  * — the form the DuckDB oracles mirror — on real corpus text and on
  * every edge the old expression defined (short arrays, null tokens,
  * empty tokens, null array). */
class ShingleHashSpec extends SparkSpec {
  import spark.implicits._

  /** The exact expression the kernel replaced. */
  private def oldForm(toks: org.apache.spark.sql.Column, n: Int) =
    transform(sequence(lit(1), size(toks) - (n - 1)),
      i => TextOps.shingleHash60(concat_ws(" ", slice(toks, i, lit(n)))))

  test("kernel equals the expression form on fixture corpus text") {
    for (n <- Seq(2, 3, 5, 8, 16, 32)) {
      ShingleHash60.register(spark, n)
      val docs = graft.sources.Tables.documents(spark, sfSmoke)
        .select(split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= n)
      val diff = docs
        .select(ShingleHash60(col("toks"), n).as("a"), oldForm(col("toks"), n).as("b"))
        .filter(not(col("a") === col("b")))
        .count()
      assert(diff == 0L, s"n=$n: kernel diverges from expression form")
    }
  }

  test("edge cases: empty strings, null elements, null array, short arrays") {
    ShingleHash60.register(spark, 3)
    // size >= n rows: parity with the old form (production call sites
    // always filter size >= n first — the old form ERRORS below that,
    // slice(toks, 0, n), so parity is only defined there)
    val rows = Seq(
      Some(Seq("a", "b", "c")),                     // one shingle
      Some(Seq("", "", "")),                        // empty tokens kept
      Some(Seq("a", null, "c", "d")),               // null skipped (concat_ws)
      None                                          // null array -> null
    ).toDF("toks")
    val got = rows
      .filter(col("toks").isNull || size(col("toks")) >= 3)
      .select(
        ShingleHash60(col("toks"), 3).as("a"),
        when(col("toks").isNotNull, oldForm(col("toks"), 3)).as("b"))
      .collect()
    got.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0))
      else assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"row $r")
    }
    // below n the kernel is total (empty array) where the old form threw —
    // strictly more defined, and unreachable from the filtered call sites
    val short = Seq(Seq[String](), Seq("a"), Seq("a", "b")).toDF("toks")
      .select(ShingleHash60(col("toks"), 3).as("a")).collect()
    short.foreach(r => assert(r.getSeq[Long](0).isEmpty))
  }

  test("value pins against the md5 contract") {
    ShingleHash60.register(spark, 2)
    // independent recomputation of one shingle hash through Spark SQL md5
    val viaSql = spark.sql(
      "SELECT CAST(conv(substring(md5('x y'), 1, 15), 16, 10) AS BIGINT)")
      .as[Long].head()
    val viaKernel = Seq(Seq("x", "y")).toDF("toks")
      .select(element_at(ShingleHash60(col("toks"), 2), 1)).as[Long].head()
    assert(viaKernel == viaSql)
  }

  /** The exact distinct-set expression the r17 kernel replaced (the
    * shingleHashes chain): hash each element of the string-distinct
    * shingle set, first-occurrence order. */
  private def oldDistinctForm(toks: org.apache.spark.sql.Column, n: Int) =
    transform(TextOps.shingles(toks, n), s => TextOps.shingleHash60(s))

  test("distinct kernel equals the expression form on fixture corpus text") {
    for (n <- Seq(2, 3, 5, 20)) {
      graft.functions.ShingleHash60Distinct.register(spark, n)
      val docs = graft.sources.Tables.documents(spark, sfSmoke)
        .select(split(col("text"), " ").as("toks"))
      val diff = docs
        .select(graft.functions.ShingleHash60Distinct(col("toks"), n).as("a"),
          oldDistinctForm(col("toks"), n).as("b"))
        .filter(not(col("a") <=> col("b")))
        .count()
      assert(diff == 0L, s"n=$n: distinct kernel diverges from expression form")
    }
  }

  test("distinct kernel edges: repeats, empties, nulls, short arrays") {
    graft.functions.ShingleHash60Distinct.register(spark, 2)
    val rows = Seq(
      Some(Seq("a", "b", "a", "b", "a")),   // repeated shingles collapse
      Some(Seq("a", "a", "a")),             // all-equal
      Some(Seq("", "", "a", "")),           // empty tokens kept as strings
      Some(Seq("x", null, "x", null, "x")), // concat_ws null-skip: "x" vs "x x"
      Some(Seq("a")),                       // size < n -> empty
      Some(Seq[String]()),                  // empty -> empty
      None                                  // null array -> null
    ).toDF("toks")
    val got = rows
      .select(graft.functions.ShingleHash60Distinct(col("toks"), 2).as("a"),
        when(col("toks").isNotNull, oldDistinctForm(col("toks"), 2)).as("b"))
      .collect()
    got.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0), s"null array: $r")
      else assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"row $r")
    }
  }
}
