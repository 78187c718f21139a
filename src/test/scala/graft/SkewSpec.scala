package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals a plain join on skewed data") {
    // 90% of fact rows share one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 0L, i))
      .toDF("k", "v")
    val dim = (0L to 6L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(dim, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, dim, "k", salts = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("saltedAgg equals a plain aggregation on skewed keys") {
    val df = (1 to 5000).map(i => (if (i % 20 == 0) i.toLong % 5 else 1L, i.toLong))
      .toDF("k", "v")
    val plain = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAgg(df, "k", salts = 8,
      partial = Seq("v" -> (c => sum(c)), "n0" -> (_ => count(lit(1)))),
      merge = Seq("v" -> (c => sum(c)), "n0" -> (c => sum(c))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain.map { case (k, s, n) => (k, s, n) })
  }
}
