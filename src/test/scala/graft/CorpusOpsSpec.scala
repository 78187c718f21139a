package graft

import graft.operators.CorpusOps
import org.apache.spark.sql.functions._

/** CorpusOps is the generic corpus-pipeline API: these tests run it on a
  * synthetic relation with NON-fixture column names ("id", "body") to
  * prove nothing is coupled to the driver's tables — the fixture-bound
  * correctness itself is continuously proven by the DuckDB gate through
  * the registry wrappers. */
class CorpusOpsSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "the quick brown fox jumps over the lazy dog today"), // dup of 10
      (12L, "a completely different document with other words here"),
      (13L, "the quick brown fox jumps over the lazy cat today"), // near-dup
      (14L, "short text")
    ).toDF("id", "body")
  }

  test("exactDedup keeps one representative per distinct content") {
    val out = CorpusOps.exactDedup(docs, "id", "body").collect()
    assert(out.length == 4) // 10/11 collapse
    val rep = out.find(_.getLong(1) == 2L).get
    assert(rep.getLong(0) == 10L) // min id wins
  }

  test("minhashCandidates surfaces the exact duplicate pair") {
    val pairs = CorpusOps.minhashCandidates(docs, "id", "body",
      shingleN = 3, stopCap = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((10L, 11L))) // identical docs always collide
    pairs.foreach { case (a, b) => assert(a < b) } // canonical order
  }

  test("published stopShingleSet reproduces the corpus-level cap on a subset batch") {
    import spark.implicits._
    // one 3-token template shared by 5 docs (bucket size 5 > cap 3) plus
    // per-doc unique tails — the template shingle must be stopped
    val corpus = (0L until 5L).map(i =>
      (i, s"alpha beta gamma unique$i tail$i end$i")).toDF("id", "body")
    val cap = 3
    val stop = CorpusOps.stopShingleSet(corpus, "id", "body", n = 3, stopCap = cap)
    assert(stop.count() == 1) // exactly the template shingle
    val batch = corpus.filter(col("id") >= 3L) // a later ingest slice
    // batch postings under the PUBLISHED corpus cap (local cap disabled)
    val got = CorpusOps.shinglePostings(batch, "id", "body", n = 3,
      stopCap = Int.MaxValue, stopShingles = Some(stop))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // oracle: corpus-level postings under the cap, restricted to batch ids
    val want = CorpusOps.shinglePostings(corpus, "id", "body", n = 3, stopCap = cap)
      .filter(col("id") >= 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
    // and the batch-local cap alone would NOT have stopped the template
    val local = CorpusOps.shinglePostings(batch, "id", "body", n = 3, stopCap = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(local != got)
    // a supplied list IS the cap: a stray batch-local stopCap (e.g. a
    // caller's untouched default, possibly tighter than the list's build
    // cap) must not further filter — same result as disabling it
    val withLocalDefault = CorpusOps.shinglePostings(batch, "id", "body",
      n = 3, stopCap = 1, stopShingles = Some(stop))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(withLocalDefault == got)
    // stopJoin strategies are value-identical (the tfidfTopTerm.dfJoin
    // contract): auto (AQE from measured size) / forced broadcast /
    // forced shuffle
    Seq("broadcast", "shuffle").foreach { sj =>
      val alt = CorpusOps.shinglePostings(batch, "id", "body", n = 3,
        stopCap = Int.MaxValue, stopShingles = Some(stop), stopJoin = sj)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(alt == got, s"stopJoin=$sj diverged")
    }
    intercept[IllegalArgumentException] {
      CorpusOps.shinglePostings(batch, "id", "body", n = 3,
        stopCap = cap, stopShingles = Some(stop), stopJoin = "bogus")
        .collect()
    }
  }

  test("withSplit is a pure function of content") {
    val out = CorpusOps.withSplit(docs, "body", as = "bucket")
      .select(col("id"), col("bucket")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(10L) == out(11L)) // identical content, identical split
    assert(Set("train", "val", "test").contains(out(12L)))
  }

  test("chunk covers every token with the declared stride") {
    val out = CorpusOps.chunk(docs, "id", "body", chunkLen = 4, stride = 3)
      .collect().groupBy(_.getLong(0))
    // doc 14: 2 tokens -> single chunk of 2
    assert(out(14L).length == 1 && out(14L).head.getSeq[String](2) == Seq("short", "text"))
    // doc 10: 10 tokens -> chunks at 1,4,7,10 (k = floor(9/3) = 3 -> 4 chunks)
    assert(out(10L).length == 4)
    assert(out(10L).map(_.getSeq[String](2).length).sum >= 10) // full coverage
  }

  test("decontaminate flags only corpus rows overlapping the benchmark") {
    import spark.implicits._
    val bench = Seq((99L, "over the lazy dog today and more")).toDF("id", "body")
    val flagged = CorpusOps.decontaminate(docs, bench, "id", "body", n = 5)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(10L, 11L)) // share "over the lazy dog today"
  }

  test("operators compose into the full curation pipeline") {
    // the end-to-end shape a real corpus run takes: split -> dedup the
    // train side -> decontaminate against test -> chunk survivors ->
    // pack -> score; every stage is a CorpusOps/scoreDocs call on the
    // previous stage's output
    import spark.implicits._
    val corpus = graft.sources.Tables.documents(spark, sfSmoke)
      .select(col("doc_id").as("id"), col("text").as("body"))
    val split = CorpusOps.withSplit(corpus, "body")
    val train = split.filter(col("split") === "train").drop("split")
    val test = split.filter(col("split") === "test").drop("split")
    val kept = train.join(
      CorpusOps.exactDedup(train, "id", "body").select("id"), Seq("id"))
    val contaminated = CorpusOps.decontaminate(kept, test, "id", "body", n = 5)
      .select(col("id"))
    val clean = kept.join(contaminated, Seq("id"), "left_anti")
    val chunks = CorpusOps.chunk(clean, "id", "body", chunkLen = 32, stride = 24)
    val packed = CorpusOps.pack(clean, "id", "body", seqLen = 512)
    val scored = CorpusOps.scoreDocs(
      clean.select(col("id"), col("body")).as[(Long, String)])
    // pipeline invariants: no stage invents or loses documents
    val nClean = clean.count()
    assert(nClean > 0 && nClean <= train.count())
    assert(chunks.select("id").distinct().count() == nClean)
    assert(packed.count() == nClean)
    assert(scored.count() == nClean)
    // dedup + decontamination actually removed something at this fixture
    assert(nClean < corpus.count())
  }

  test("every operator handles an empty corpus without failing") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "body")
    assert(CorpusOps.exactDedup(empty, "id", "body").count() == 0)
    assert(CorpusOps.minhashCandidates(empty, "id", "body", 3, 10).count() == 0)
    assert(CorpusOps.withSplit(empty, "body").count() == 0)
    assert(CorpusOps.chunk(empty, "id", "body", 4, 3).count() == 0)
    assert(CorpusOps.decontaminate(empty, docs, "id", "body").count() == 0)
    assert(CorpusOps.decontaminate(docs, empty, "id", "body").count() == 0)
    assert(CorpusOps.pack(empty, "id", "body", 16).count() == 0)
    assert(CorpusOps.tfidfTopTerm(empty, "id", "body").count() == 0)
  }

  test("tfidfTopTerm: broadcast, shuffle and auto df joins are value-identical") {
    def run(mode: String) =
      CorpusOps.tfidfTopTerm(docs, "id", "body", dfJoin = mode)
        .orderBy(col("id")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val auto = run("auto")
    assert(auto == run("broadcast"))
    assert(auto == run("shuffle"))
    assert(auto.length == 5)
    // the dup pair 10/11 must agree on the top term and score
    assert(auto.find(_._1 == 10L).map(t => (t._2, t._3))
      == auto.find(_._1 == 11L).map(t => (t._2, t._3)))
    intercept[IllegalArgumentException] {
      CorpusOps.tfidfTopTerm(docs, "id", "body", dfJoin = "bogus")
    }
  }

  test("tfidfTopTerm join strategies produce the hinted physical joins") {
    def plan(mode: String) =
      CorpusOps.tfidfTopTerm(docs, "id", "body", dfJoin = mode)
        .queryExecution.executedPlan.toString
    // forced broadcast: the df side rides a BroadcastHashJoin
    assert(plan("broadcast").contains("BroadcastHashJoin"))
    // forced shuffle: the token join is a shuffled hash join (the only
    // remaining broadcast is the one-row corpus-size scalar)
    assert(plan("shuffle").contains("ShuffledHashJoin"))
  }

  test("pack assigns every doc to the sequence of its first token") {
    val out = CorpusOps.pack(docs, "id", "body", seqLen = 16).collect()
    assert(out.length == 5)
    // total tokens 10+10+8+10+2 = 40 -> seq ids within 0..2 for seqLen 16
    assert(out.map(_.getLong(2)).forall(s => s >= 0 && s <= 2))
    assert(out.map(r => r.getInt(1)).sum == 40)
  }
}
