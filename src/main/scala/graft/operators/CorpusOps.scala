package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The generic, reusable corpus-pipeline API: every operator takes a
  * DataFrame plus column names and returns a DataFrame — nothing here
  * knows about the driver's fixture tables. The registry queries
  * (q24/q25/q31/q58/q60/q66/q68/q69) are thin wrappers over these, so the
  * driver's DuckDB gate continuously proves this API correct, and a user
  * can run the same operators on their own relations:
  *
  * {{{
  * CorpusOps.minhashCandidates(myDocs, "id", "body")
  * CorpusOps.decontaminate(train, benchmark, "id", "body", n = 8)
  * }}}
  *
  * Scale properties are documented per operator in SCALING.md; the short
  * version: every operator is map-only or single-shuffle with bounded
  * per-key state (stop-shingle caps, band caps), and nothing collects to
  * the driver.
  */
object CorpusOps {

  /** Internal/output column names are fixed (they ARE the output
    * contract), so a user id/text column with one of these names would
    * collide inside the operator — fail fast with the list instead of an
    * opaque ambiguous-reference error mid-plan. */
  private def guard(reserved: Seq[String], cols: String*): Unit =
    cols.foreach { c =>
      require(!reserved.contains(c),
        s"column name '$c' collides with ${getClass.getSimpleName} internals; " +
          s"rename it (reserved here: ${reserved.mkString(", ")})")
    }

  /** Exact dedup: one representative (min id) per distinct content, with
    * the copy count. One shuffle carrying a 32-byte key. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    guard(Seq("content_key", "n_copies"), idCol, textCol)
    docs.groupBy(md5(col(textCol)).as("content_key"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(col(idCol), col("n_copies"))
  }

  /** PUBLISH the corpus-level stop-shingle relation: the `sgh` hashes of
    * buckets whose posting list exceeds `stopCap` (the exact complement
    * of what shinglePostings keeps). Incremental/streaming consumers
    * (q100, s15) pass this as `stopShingles` so a per-batch run applies
    * the CORPUS cap instead of a batch-local one — a batch never sees
    * corpus frequencies on its own. One shuffle; output is stop-list
    * sized (the heavy tail), never corpus sized. */
  def stopShingleSet(docs: DataFrame, idCol: String, textCol: String,
      n: Int, stopCap: Int): DataFrame = {
    guard(Seq("toks", "sh", "sgh", "n_postings"), idCol, textCol)
    shingleHashes(docs, idCol, textCol, n)
      .groupBy(col("sgh"))
      .agg(count(lit(1)).as("n_postings"))
      .filter(col("n_postings") > stopCap)
      .select(col("sgh"))
  }

  /** (shingle-hash, id) postings surviving the stop-shingle cap — the
    * shared candidate-generation input for the Jaccard and MinHash
    * families. The shuffle key is the md5-60bit of the shingle, NOT the
    * shingle text: at corpus scale the n-token shingle strings are the
    * heaviest bytes in flight, and every downstream use (set equality,
    * set size, min-hashing) only needs a stable identity — 8 bytes do.
    * One explode + one shuffle; buckets above `stopCap` docs are dropped
    * (they pair near-everything and carry no signal).
    *
    * `stopShingles` is an optional PUBLISHED stop list (a `sgh` relation
    * from [[stopShingleSet]]): postings anti-join it before the bucket
    * groupBy, so a subset batch applies the corpus-level cap. When a
    * list is supplied it IS the cap — the batch-local `stopCap` filter
    * is disabled, because a batch bucket can only exceed the cap if its
    * corpus bucket did, and that shingle is already on the list; keeping
    * the local filter active would silently tighten results whenever the
    * list was built with a different cap (batch/stream equivalence bug).
    *
    * `stopJoin` picks how the stop list joins (the tfidfTopTerm.dfJoin
    * contract): the list is the heavy tail of the shingle distribution —
    * bounded by total_postings/cap, which is small at fixture scale but
    * NOT broadcast-sized by construction at web scale. "auto" (default)
    * leaves the anti-join unhinted so AQE picks broadcast-vs-shuffle
    * from the list's MEASURED bytes; "broadcast"/"shuffle" force the
    * respective side for callers that know their list size. All three
    * are value-identical (CorpusOpsSpec locks it). */
  def shinglePostings(docs: DataFrame, idCol: String, textCol: String,
      n: Int, stopCap: Int, stopShingles: Option[DataFrame] = None,
      stopJoin: String = "auto"): DataFrame = {
    guard(Seq("toks", "sh", "sgh", "docs"), idCol, textCol)
    val hashed = shingleHashes(docs, idCol, textCol, n)
    val kept = stopShingles.fold(hashed) { stop =>
      val stopSide = stopJoin match {
        case "auto"      => stop.select(col("sgh"))
        case "broadcast" => broadcast(stop.select(col("sgh")))
        case "shuffle"   => stop.select(col("sgh")).hint("shuffle_hash")
        case other => throw new IllegalArgumentException(
          s"stopJoin must be auto|broadcast|shuffle, got '$other'")
      }
      hashed.join(stopSide, Seq("sgh"), "left_anti")
    }
    val grouped = kept
      .groupBy(col("sgh"))
      .agg(sort_array(collect_list(col(idCol))).as("docs"))
    val capped =
      if (stopShingles.isDefined) grouped
      else grouped.filter(size(col("docs")) <= stopCap)
    capped.select(col("sgh"), explode(col("docs")).as(idCol))
  }

  /** The (idCol, band, bh) LSH band relation behind minhashCandidates —
    * exposed separately so incremental consumers (q100) can treat it as
    * the STANDING index a new ingest batch probes, instead of re-pairing
    * the whole corpus. */
  def minhashBands(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5, stopCap: Int = 1000, k: Int = 8,
      bands: Int = 2, stopShingles: Option[DataFrame] = None,
      stopJoin: String = "auto"): DataFrame = {
    guard(Seq("toks", "sh", "sgh", "docs", "band", "bh", "e", "p",
      "doc1", "doc2") ++ (0 until k).map(i => s"h$i"), idCol, textCol)
    minhashBandsFromPostings(
      shinglePostings(docs, idCol, textCol, shingleN, stopCap, stopShingles,
        stopJoin),
      idCol, k, bands)
  }

  /** Band derivation from an EXISTING (sgh, idCol) posting relation — the
    * standing-index path: a pipeline that has already built (or published)
    * its postings derives signatures and band keys from it without
    * re-scanning the corpus. [[minhashBands]] is this over a fresh
    * [[shinglePostings]] build. */
  def minhashBandsFromPostings(postings: DataFrame, idCol: String,
      k: Int = 8, bands: Int = 2): DataFrame = {
    require(k % bands == 0, "k must divide into equal bands")
    val rowsPerBand = k / bands
    val sigs = postings
      .groupBy(col(idCol))
      .agg(TextOps.minhash(col("sgh"), 0).as("h0"),
        (1 until k).map(i => TextOps.minhash(col("sgh"), i).as(s"h$i")): _*)
    val bandStructs = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
      struct(lit(b).as("band"), md5(concat_ws("|", cols: _*)).as("bh"))
    }
    sigs.select(col(idCol), explode(array(bandStructs: _*)).as("e"))
      .select(col(idCol), col("e.band").as("band"), col("e.bh").as("bh"))
  }

  /** Candidate pairs from an EXISTING (idCol, band, bh) band relation —
    * the consumer half of [[minhashCandidates]], usable against a
    * published standing index. Pairs are generated inside band buckets
    * (no self-join) and distinct-ed across bands. */
  def candidatePairsFromBands(bandRel: DataFrame, idCol: String): DataFrame =
    bandRel
      .groupBy(col("band"), col("bh"))
      .agg(sort_array(collect_list(col(idCol))).as("docs"))
      .filter(size(col("docs")) >= 2)
      .select(explode(TextOps.orderedPairs(col("docs"))).as("p"))
      .select(col("p.d1").as("doc1"), col("p.d2").as("doc2"))
      .distinct()

  /** MinHash+LSH candidate pairs (unordered, distinct): `k` md5-min
    * hashes per shingle set, `bands` bands hashed to band keys, pairs
    * generated inside band buckets without a self-join. */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 5, stopCap: Int = 1000, k: Int = 8,
      bands: Int = 2): DataFrame =
    candidatePairsFromBands(
      minhashBands(docs, idCol, textCol, shingleN, stopCap, k, bands), idCol)

  /** Deterministic content-hash split column in {train, val, test}:
    * reproducible across runs/engines/repartitioning, and exact
    * duplicates land in one split (no cross-split leakage). Map-only. */
  def withSplit(docs: DataFrame, textCol: String, as: String = "split",
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    guard(Seq(as), textCol)
    // case-insensitive: Spark's default resolver would match (and
    // withColumn would replace) a column differing only in case
    require(!docs.columns.exists(_.equalsIgnoreCase(as)),
      s"input already has a column named '$as' — withColumn would silently " +
        "replace it; pass a different `as`")
    val h = TextOps.contentSplitHash(col(textCol))
    docs.withColumn(as,
      when(h < trainPct, "train")
        .when(h < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Fixed-size overlapping chunks: (id, chunk_id, chunk tokens array).
    * Map-only 1:N explode; chunk k covers tokens [stride·k+1, stride·k+len]. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkLen: Int, stride: Int): DataFrame = {
    require(chunkLen > 0 && stride > 0,
      s"chunkLen and stride must be positive, got chunkLen=$chunkLen stride=$stride")
    guard(Seq("toks", "chunk_id", "chunk"), idCol, textCol)
    docs.select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0L), floor((size(col("toks")) - 1) / stride)))
          .as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        slice(col("toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(chunkLen)).as("chunk"))
  }

  /** (id, sgh) per-document distinct shingle-hash rows — the ONE
    * definition of the shingle probe side shared by batch q68 and the s08
    * streaming twin (their equivalence depends on bit-identity). */
  def shingleHashes(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    guard(Seq("toks", "sg", "sgh"), idCol, textCol)
    // r17: the tokens→shingle-strings→md5 chain ran as an interpreted
    // higher-order transform allocating 5 intermediates per shingle; the
    // ShingleHash60Distinct kernel fuses it into one whole-stage-codegen
    // call with IDENTICAL set semantics (distinct on the shingle STRING,
    // not the hash — a 60-bit collision still emits both copies exactly
    // like the expression form / the oracle's list_distinct).
    graft.functions.ShingleHash60Distinct.register(docs.sparkSession, n)
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        explode(graft.functions.ShingleHash60Distinct(col("toks"), n))
          .as("sgh"))
  }

  /** The DISTINCT shingle-hash set of a benchmark relation — the (tiny)
    * broadcast side of decontamination, reusable across probes. */
  def benchmarkShingleSet(benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 5): DataFrame =
    shingleHashes(benchmark, idCol, textCol, n).select(col("sgh")).distinct()

  /** Decontamination probe against a PREBUILT shingle-hash set (one `sgh`
    * column): corpus rows sharing >= 1 shingle, with the overlap count.
    * The set broadcasts; the corpus side is a map-side probe over 8-byte
    * keys. */
  def decontaminateAgainst(corpus: DataFrame, shingleSet: DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame = {
    guard(Seq("n_shared"), idCol, textCol)
    shingleHashes(corpus, idCol, textCol, n)
      .join(broadcast(shingleSet), "sgh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Benchmark decontamination: corpus rows sharing >= 1 n-token shingle
    * with the benchmark, with the distinct-shingle overlap count. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 5): DataFrame =
    decontaminateAgainst(corpus,
      benchmarkShingleSet(benchmark, idCol, textCol, n), idCol, textCol, n)

  /** Deterministic stand-in for a learned quality model (the container
    * has no inference runtime): an algebraic sigmoid over three exact
    * document features. Algebraic (z / (1+|z|)), NOT exp-based — +,*,/,
    * abs are bit-identical IEEE ops in the JVM and DuckDB, so the oracle
    * can mirror the score exactly; exp implementations may differ in the
    * last ulp and flip a rounded hash. Replace `score` with a real model
    * forward pass in production; init/batching plumbing stays identical. */
  object StubModel {
    // ??? <- real model load goes here (once per executor/partition)
    def score(nTokens: Int, diversity: Double, avgWordLen: Double): Double = {
      val z = -1.5 + 0.02 * nTokens + 2.0 * diversity - 0.1 * avgWordLen
      0.5 + 0.5 * z / (1.0 + math.abs(z))
    }
  }

  /** The shared scoring kernel: per-task model init + 64-row micro-batches
    * over (doc_id, text). ONE implementation used by batch q72 AND the s09
    * streaming scorer — the batch/streaming twin contract depends on the
    * two staying bit-identical (same rule as TextOps.contentSplitHash). */
  def scoreDocs(docs: org.apache.spark.sql.Dataset[(Long, String)]): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .mapPartitions { it =>
        val model = StubModel // per-partition init point
        it.grouped(64).flatMap(_.map { case (docId, text) =>
          // feature extraction mirrors the SQL oracle exactly: token
          // count (split keeps empties), distinct ratio, average token
          // length in CODEPOINTS (SQL length() counts codepoints)
          val toks = text.split(" ", -1)
          val nt = toks.length
          val div = toks.distinct.length.toDouble / nt
          val cp = text.codePointCount(0, text.length)
          val awl = (cp - (nt - 1)).toDouble / nt
          (docId, nt, model.score(nt, div, awl))
        })
      }
      .toDF("doc_id", "n_tokens", "score")
      .withColumn("score", round(col("score"), 6))
  }

  /** Repeated-passage detection (exact-substring dedup): n-token spans
    * appearing in >= minDocs documents, with a capped sample of carrying
    * docs. One distinct-shingle explode + one 8-byte passage-hash shuffle
    * with partial counts. Deliberately NO stop cap — oversized buckets
    * are the signal (heavily repeated passages), not noise. */
  def repeatedPassages(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 20, minDocs: Int = 2, sampleCap: Int = 10): DataFrame = {
    guard(Seq("toks", "ps", "psh", "n_docs", "sample_docs"), idCol, textCol)
    // r17: fused distinct-shingle-hash kernel (see shingleHashes)
    graft.functions.ShingleHash60Distinct.register(docs.sparkSession, n)
    docs
      .select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .select(col(idCol),
        explode(graft.functions.ShingleHash60Distinct(col("toks"), n))
          .as("psh"))
      .groupBy(col("psh"))
      .agg(count(lit(1)).as("n_docs"),
        slice(sort_array(collect_list(col(idCol))), 1, sampleCap).as("sample_docs"))
      .filter(col("n_docs") >= minDocs)
  }

  /** TF-IDF top term per document: tf·ln(N/df), rounded, token tie-break.
    *
    * `dfJoin` picks how the vocabulary-sized df relation joins back onto
    * the tf relation — the round-2 watch item: "vocabulary-sized" is
    * data-dependent at web scale (a 100 TB multilingual crawl's token
    * vocabulary can exceed any broadcast budget), so forcing a broadcast
    * is a latent OOM:
    *  - "auto" (default): no hint. Catalyst sizes the join from stats and
    *    AQE converts the shuffle join to broadcast at runtime when the
    *    built df side is actually under
    *    spark.sql.adaptive.autoBroadcastJoinThreshold — the right call is
    *    made from MEASURED bytes, not an assumption.
    *  - "broadcast": force broadcast (known-small vocabularies).
    *  - "shuffle": force a shuffled hash join (known-huge vocabularies;
    *    also what AQE falls back to when the measured size is large).
    * All three are value-identical (CorpusOpsSpec locks it).
    *
    * The per-doc ranking window partitions by doc id — bounded by a
    * document's distinct-token count, never data-sized. */
  def tfidfTopTerm(docs: DataFrame, idCol: String, textCol: String,
      dfJoin: String = "auto"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    guard(Seq("token", "tf", "df", "n_docs", "score", "rn", "top_token"),
      idCol, textCol)
    val tf = docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    // df = #docs containing the token: explode the per-doc DISTINCT token
    // set (array_distinct is map-side) — skew-free: partial counts
    // combine before the token shuffle. Measured (r4 A/B at sf0.1): this
    // second scan+distinct-explode beats both deriving df from tf (AQE
    // does not reuse the tf exchange across the two consumers — the tf
    // shuffle computes twice, 0.88→1.13 median) and materializing tf
    // (checkpoint write cost exceeds the re-scan at any scale where the
    // token relation is corpus-sized).
    val dfRel = docs
      .select(explode(array_distinct(TextOps.tokens(col(textCol)))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val dfSide = dfJoin match {
      case "auto"      => dfRel
      case "broadcast" => broadcast(dfRel)
      case "shuffle"   => dfRel.hint("shuffle_hash")
      case other => throw new IllegalArgumentException(
        s"dfJoin must be auto|broadcast|shuffle, got '$other'")
    }
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfSide, "token")
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") * log(col("n_docs") / col("df")), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("token"))))
      .filter(col("rn") === 1)
      .select(col(idCol), col("token").as("top_token"), col("score"))
  }

  /** Concat-and-cut sequence packing: lay documents out in deterministic
    * content-hash order, cut every `seqLen` tokens, assign each document
    * to the sequence where its first token lands. Returns the input plus
    * (n_tokens, seq_id). The global prefix sum is Ranks.runningSum —
    * bounded range slices + broadcast offsets, no single-task window. */
  def pack(docs: DataFrame, idCol: String, textCol: String,
      seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    guard(Seq("k", "nt", "_g", "run", "prior", "seq_id", "n_tokens", "_slice", "_v"),
      idCol, textCol)
    val prepared = graft.sources.Io.materialize(docs
      .select(col(idCol), md5(col(textCol)).as("k"),
        size(TextOps.tokens(col(textCol))).as("nt"))
      .withColumn("_g", lit(0)))
      // MATERIALIZE before Ranks: this API accepts arbitrary relations,
      // and Ranks' sliced decomposition requires deterministically-ordered
      // input (its two internal references re-evaluate the subtree; a
      // shuffled input can slice the two branches differently and silently
      // drop rows — the recorded q71 incident). EAGER materialization is
      // deliberate: a lazy one could still let the two branches race-
      // compute a partition. Costs: a job at construction time (narrow
      // (id, hash, count) relation — cheap); Io.materialize picks local
      // vs reliable checkpoint from the engine-wide config switch.
    Ranks.runningSum(prepared, "_g", Seq(col("k"), col(idCol)), col("nt"), "run")
      .withColumn("prior", col("run") - col("nt"))
      .withColumn("seq_id", expr(s"prior div $seqLen"))
      .select(col(idCol), col("nt").as("n_tokens"), col("seq_id"))
  }

  /** Maximal shared token SPANS between document pairs — exact substring
    * overlap detection (the span-level dedup of Lee et al.'s
    * "Deduplicating Training Data Makes Language Models Better":
    * verbatim runs copied between documents, which Jaccard-style whole-
    * document similarity under-weights and passage hashing (q74) only
    * sees at fixed chunk boundaries). Output: one row per (doc_id1 <
    * doc_id2) pair sharing at least one run of >= `minSpanTokens`
    * consecutive identical tokens, with the longest such run and the
    * count of maximal runs.
    *
    * Mechanics: POSITIONAL n-token shingles (repeats kept, 1-based
    * position — unlike [[shingleHashes]], whose distinct sets feed set
    * similarity) carry only the md5-60bit hash into a bucket groupBy;
    * in-bucket ordered pairs (no self-join — the q25/q31 pattern) yield
    * matched position pairs; a run of shingle matches at constant
    * position offset is a gaps-and-islands group (pos1 − row_number is
    * constant exactly on consecutive pos1), and a run of k consecutive
    * shingle matches is k + n − 1 shared tokens.
    *
    * Scale notes: one explode (positional shingles, 8-byte keys), one
    * bucket shuffle with `bucketCap` bounding in-bucket pair fan-out
    * (common-phrase buckets pair everything and carry no span signal —
    * the stop-shingle argument), windows partitioned by (pair, offset)
    * — cardinality scales with the data, group size bounded by doc
    * length. Never all-pairs, never a corpus-sized window partition. */
  def sharedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int, bucketCap: Int, minSpanTokens: Int): DataFrame = {
    guard(Seq("toks"), idCol, textCol)
    // fanOut before the positional-shingle expansion — the heaviest
    // map stage in the family (every token position hashes), serial on
    // a one-file fixture scan without it
    sharedSpansFromToks(
      graft.sources.Io.fanOut(docs.select(col(idCol), col(textCol)))
        .select(col(idCol), TextOps.tokens(col(textCol)).as("toks")),
      idCol, n, bucketCap, minSpanTokens)
  }

  /** [[sharedSpans]] over a PRE-TOKENIZED (idCol, toks) relation — the
    * multi-shingle-size escalation (q193) tokenizes the corpus once,
    * materializes it, and derives every shingle size from the shared
    * token arrays instead of re-tokenizing per level (r11 verdict
    * task 5). Identical output to [[sharedSpans]] per level. */
  def sharedSpansFromToks(toksDf: DataFrame, idCol: String,
      n: Int, bucketCap: Int, minSpanTokens: Int): DataFrame = {
    require(n > 0 && minSpanTokens >= n,
      s"need n > 0 and minSpanTokens >= n, got n=$n minSpanTokens=$minSpanTokens")
    guard(Seq("pos", "sgh", "posts", "doc_id1", "doc_id2", "p1",
      "p2", "off", "grp", "span_tokens", "longest_span", "n_spans"),
      idCol)
    // r16: native shingle-hash kernel — the transform(sequence…md5…)
    // form interpreted a 6-node tree per shingle (guide §4; ~20 s CPU
    // across q193's three passes at sf0.1), bit-identical output
    graft.functions.ShingleHash60.register(toksDf.sparkSession, n)
    val postings = toksDf
      .filter(size(col("toks")) >= n)
      .select(col(idCol),
        posexplode(graft.functions.ShingleHash60(col("toks"), n))
          .as(Seq("pos", "sgh")))
      .select(col(idCol), (col("pos") + 1).cast("long").as("pos"), col("sgh"))
    val matches = postings
      .groupBy(col("sgh"))
      .agg(sort_array(collect_list(struct(col(idCol), col("pos")))).as("posts"))
      .filter(size(col("posts")).between(2, bucketCap))
      .select(explode(TextOps.orderedPairs(col("posts"))).as("p"))
      .filter(col("p.d1").getField(idCol) < col("p.d2").getField(idCol))
      .select(col("p.d1").getField(idCol).as("doc_id1"),
        col("p.d2").getField(idCol).as("doc_id2"),
        col("p.d1").getField("pos").as("p1"),
        col("p.d2").getField("pos").as("p2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id1"), col("doc_id2"), col("off")).orderBy(col("p1"))
    matches
      .withColumn("off", col("p1") - col("p2"))
      .withColumn("grp", col("p1") - row_number().over(w))
      .groupBy(col("doc_id1"), col("doc_id2"), col("off"), col("grp"))
      .agg((count(lit(1)) + (n - 1)).as("span_tokens"))
      .filter(col("span_tokens") >= minSpanTokens)
      .groupBy(col("doc_id1"), col("doc_id2"))
      .agg(max(col("span_tokens")).as("longest_span"),
        count(lit(1)).as("n_spans"))
  }
}
