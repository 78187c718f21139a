package graft

import graft.functions.TextOps
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The driver corpus is null-free, so these tests DEFINE the engine's
  * null semantics on hand-built inputs (SURVEY §5: "nulls and empty
  * inputs — must be defined: standard SQL semantics"). */
class NullSemanticsSpec extends SparkSpec {
  import spark.implicits._

  private def nullableDf = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("k", LongType, nullable = true),
      StructField("text", StringType, nullable = true)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, 10L, "a b c d e f"),
        Row(2L, null, "a b c d e f"),
        Row(3L, 10L, null),
        Row(4L, 20L, "x y")),
      schema)
  }

  test("null join keys match nothing (standard SQL equi-join)") {
    val left = nullableDf.select(col("id"), col("k"))
    val right = Seq((10L, "ten"), (20L, "twenty")).toDF("k2", "name")
    val matched = left.join(right, col("k") === col("k2")).collect()
    assert(matched.map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 4L))
    // and anti-join keeps the null-key row
    val anti = left.join(right, col("k") === col("k2"), "left_anti").collect()
    assert(anti.map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("aggregates skip nulls; count(*) does not") {
    val r = nullableDf.agg(
      count(lit(1)).as("n"), count(col("k")).as("nk"),
      sum(col("k")).as("s"), avg(col("k")).as("a")).head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 3)
    assert(r.getLong(2) == 40L)
    assert(math.abs(r.getDouble(3) - 40.0 / 3) < 1e-12)
  }

  test("null text: empty shingle set + canonical empty fingerprint; dedup groups nulls") {
    val t = nullableDf.select(col("id"),
      TextOps.shingles(TextOps.tokens(col("text")), 5).as("sh"),
      TextOps.fingerprint(TextOps.tokens(col("text"))).as("fp"))
    val rows = t.collect().map(r => r.getLong(0) ->
      (Option(r.getSeq[String](1)), Option(r.getString(2)))).toMap
    // defined semantics: a null document contributes NO shingles (empty
    // set, so it can never appear as a near-dup candidate) and gets the
    // canonical empty-content fingerprint md5("")
    assert(rows(3L)._1.exists(_.isEmpty))
    assert(rows(3L)._2.contains("d41d8cd98f00b204e9800998ecf8427e"))
    assert(rows(1L)._1.get.nonEmpty && rows(1L)._2.isDefined)
    // dedup: null text forms its own group (SQL GROUP BY treats nulls equal)
    val dedup = nullableDf.groupBy(col("text"))
      .agg(min(col("id")).as("id"), count(lit(1)).as("n")).collect()
    assert(dedup.length == 3)
  }

  test("window ordering places nulls first ascending (Spark default, documented)") {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("k"), col("id"))
    val ranked = nullableDf.withColumn("rn", row_number().over(w))
      .orderBy(col("rn")).select(col("id")).collect().map(_.getLong(0))
    assert(ranked.head == 2L) // the null-k row ranks first
  }
}
