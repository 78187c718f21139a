package graft

import graft.operators.Sampling
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfSmoke).select(col("doc_id"), col("lang"))

  test("quotaPerGroup returns at most n rows per stratum, deterministically") {
    val s1 = Sampling.quotaPerGroup(docs, "lang", "doc_id", 15)
    val s2 = Sampling.quotaPerGroup(docs, "lang", "doc_id", 15)
    val counts = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ <= 15))
    assert(counts.size == 5)
    assert(s1.orderBy("doc_id").collect().toSeq == s2.orderBy("doc_id").collect().toSeq)
  }

  test("stratifiedSample respects per-stratum fractions (seeded)") {
    val fr = Map("en" -> 0.5, "es" -> 0.1, "de" -> 0.0, "fr" -> 1.0, "zh" -> 0.3)
    val s = Sampling.stratifiedSample(docs, "lang", fr, seed = 42L)
    val got = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("de"))                       // fraction 0 -> none
    assert(got("fr") == base("fr"))                   // fraction 1 -> all
    assert(math.abs(got("en").toDouble / base("en") - 0.5) < 0.2)
    // reproducible
    val again = Sampling.stratifiedSample(docs, "lang", fr, seed = 42L)
    assert(again.orderBy("doc_id").collect().toSeq ==
      s.orderBy("doc_id").collect().toSeq)
  }

  test("trainTestSplit is disjoint, exhaustive, and reproducible") {
    val (train, test) = Sampling.trainTestSplit(docs, 0.25, seed = 7L)
    val trainIds = train.select("doc_id").collect().map(_.getLong(0)).toSet
    val testIds = test.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(trainIds.intersect(testIds).isEmpty)
    assert(trainIds.size + testIds.size == docs.count())
    assert(testIds.size > 50 && testIds.size < 200) // ~125 of 500 expected
    val (train2, _) = Sampling.trainTestSplit(docs, 0.25, seed = 7L)
    assert(train2.select("doc_id").collect().map(_.getLong(0)).toSet == trainIds)
  }
}
