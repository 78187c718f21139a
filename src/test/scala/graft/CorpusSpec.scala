package graft

import org.apache.spark.sql.functions._

/** Property checks for the corpus-construction family (q56-q59) beyond
  * the oracle value-diff: structural invariants that must hold at any
  * scale. */
class CorpusSpec extends SparkSpec {

  test("q58 split partitions the corpus exactly (no loss, no overlap)") {
    val total = graft.sources.Tables.documents(spark, sfSmoke).count()
    val rows = SparkEntry.queries("q58_corpus_split")(spark, sfSmoke).collect()
    assert(rows.map(_.getString(0)).toSet == Set("train", "val", "test"))
    assert(rows.map(_.getLong(1)).sum == total)
    // 80/10/10 within tolerance at 500 docs (hash uniformity)
    val byName = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName("train") > byName("val") && byName("train") > byName("test"))
  }

  test("q58 assignment is content-keyed: identical text lands in one split") {
    import spark.implicits._
    val docs = Seq((1L, "same text", 9L), (2L, "same text", 9L), (3L, "other", 5L))
      .toDF("doc_id", "text", "n_chars").withColumn("lang", lit("en"))
    docs.createOrReplaceTempView("corpus_spec_docs")
    val h = graft.functions.TextOps.contentSplitHash(col("text"))
    val split = docs.withColumn("split",
      when(h < 80, "train").when(h < 90, "val").otherwise("test"))
    val assigns = split.filter(col("text") === "same text")
      .select(col("split")).distinct().count()
    assert(assigns == 1L)
  }

  test("q59 codes reconstruct within half a quantization step") {
    val emb = graft.sources.Tables.embeddings(spark, sfSmoke)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val rows = SparkEntry.queries("q59_embedding_quantize")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vec = emb(r.getLong(0))
      val scale = r.getDouble(1)
      val codes = r.getString(2).split(",").map(_.toInt).toSeq
      assert(codes.length == vec.length)
      assert(codes.forall(c => c >= -127 && c <= 127))
      // |x - c*scale/127| <= scale/254 (half a step) + rounding slack from
      // the 6-digit scale
      val step = scale / 254 + 1e-3
      vec.zip(codes).foreach { case (x, c) =>
        assert(math.abs(x - c * scale / 127) <= step,
          s"vec ${r.getLong(0)}: x=$x c=$c scale=$scale")
      }
    }
  }

  test("q56 postings are capped, sorted, and df-consistent") {
    val rows = SparkEntry.queries("q56_inverted_index")(spark, sfSmoke).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1)
      val postings = r.getString(2).split(",").map(_.toLong).toSeq
      assert(postings.length == math.min(df, 20L).toInt)
      assert(postings == postings.sorted)
      assert(df >= 10)
    }
  }
}
