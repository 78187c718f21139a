package graft

import org.apache.spark.sql.functions._

/** Structural invariants for the curation family (q66-q70) beyond the
  * oracle value-diff — properties that must hold at any scale. */
class CurationSpec extends SparkSpec {

  test("q66 chunking covers every token with the declared overlap") {
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
      .select(col("doc_id"), size(split(col("text"), " ")).as("nt"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = SparkEntry.queries("q66_doc_chunking")(spark, sfSmoke)
      .collect().groupBy(_.getLong(0))
    assert(chunks.keySet == docs.keySet) // every doc chunked
    chunks.foreach { case (docId, rows) =>
      val nt = docs(docId)
      // chunk count = floor((nt-1)/stride)+1; ids contiguous from 0
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.toSeq == (0L until ((nt - 1) / 24 + 1)).toSeq)
      // all chunks full-size except possibly the tail ones; token coverage:
      // last chunk start + its length reaches nt exactly
      val last = rows.maxBy(_.getLong(1))
      assert(last.getLong(1) * 24 + last.getInt(2) == nt)
      rows.foreach(r => assert(r.getInt(2) >= 1 && r.getInt(2) <= 32))
    }
  }

  test("q67 repetition scores are fractions and zero for all-distinct docs") {
    val rows = SparkEntry.queries("q67_repetition_score")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dupTok = r.getDouble(2); val dupTri = r.getDouble(3)
      assert(dupTok >= 0.0 && dupTok < 1.0)
      assert(dupTri >= 0.0 && dupTri < 1.0)
      // a doc cannot repeat trigrams without repeating tokens
      if (dupTok == 0.0) assert(dupTri == 0.0)
    }
  }

  test("q68 flags only train-split docs, each sharing >= 1 test shingle") {
    val h = graft.functions.TextOps.contentSplitHash(col("text"))
    val trainIds = graft.sources.Tables.documents(spark, sfSmoke)
      .filter(h < 80).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val rows = SparkEntry.queries("q68_decontaminate")(spark, sfSmoke).collect()
    assert(rows.nonEmpty) // probed: 8 contaminated docs at sf0.001
    rows.foreach { r =>
      assert(trainIds.contains(r.getLong(0)))
      assert(r.getLong(1) >= 1L)
    }
  }

  test("q69 packing conserves docs and tokens; sequences are dense") {
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
      .select(count(lit(1)), sum(size(split(col("text"), " "))))
      .collect().head
    val rows = SparkEntry.queries("q69_sequence_pack")(spark, sfSmoke).collect()
    assert(rows.map(_.getLong(1)).sum == docs.getLong(0)) // every doc packed once
    assert(rows.map(_.getLong(2)).sum == docs.getLong(1)) // every token counted once
    // seq ids are the contiguous prefix 0..max (concat-and-cut leaves no gap:
    // every 512-token window contains at least one document start only when
    // docs are shorter than the budget — which holds here, max 99 tokens)
    val ids = rows.map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L to ids.max).toSeq)
    // no sequence overfills by more than one trailing document
    rows.foreach(r => assert(r.getLong(2) < 512L + 100L))
  }

  test("q73 merge applies latest-wins upsert semantics per key") {
    import org.apache.spark.sql.functions._
    val h = graft.functions.TextOps.contentSplitHash(col("text"))
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
      .withColumn("k", col("doc_id") % 500)
    val baseKeys = docs.filter(h < 80).select("k").distinct()
      .collect().map(_.getLong(0)).toSet
    val incKeys = docs.filter(h >= 90).select("k").distinct()
      .collect().map(_.getLong(0)).toSet
    val rows = SparkEntry.queries("q73_merge_upsert")(spark, sfSmoke).collect()
    val byAction = rows.groupBy(_.getString(1))
    // actions match the key-set algebra (modulo deletes removing rows)
    byAction.getOrElse("keep", Array()).foreach(r =>
      assert(baseKeys.contains(r.getLong(0)) && !incKeys.contains(r.getLong(0))))
    byAction.getOrElse("insert", Array()).foreach(r =>
      assert(!baseKeys.contains(r.getLong(0)) && incKeys.contains(r.getLong(0))))
    byAction.getOrElse("update", Array()).foreach(r =>
      assert(baseKeys.contains(r.getLong(0)) && incKeys.contains(r.getLong(0))))
    // every surviving key appears exactly once (it IS a snapshot)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    // updates and inserts carry the incoming side's latest doc version
    val latestInc = docs.filter(h >= 90).groupBy(col("k"))
      .agg(max(col("doc_id")).as("m")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (byAction.getOrElse("update", Array()) ++ byAction.getOrElse("insert", Array()))
      .foreach(r => assert(r.getLong(2) == latestInc(r.getLong(0))))
  }

  test("q70 funnel partitions the corpus and pcts sum to 100") {
    val total = graft.sources.Tables.documents(spark, sfSmoke).count()
    val rows = SparkEntry.queries("q70_filter_funnel")(spark, sfSmoke).collect()
    assert(rows.map(_.getLong(1)).sum == total)
    val pctSum = rows.map(_.getDouble(2)).sum
    assert(math.abs(pctSum - 100.0) < 1e-4)
    assert(rows.map(_.getString(0)).toSet.subsetOf(
      Set("too_short", "too_long", "low_diversity", "repetitive", "pass")))
  }
}
