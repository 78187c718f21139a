package graft

/** Physical-plan shape assertions — the "would this survive 100×" checks
  * (builder prompt): filters/projections reach the parquet scan, small
  * dimensions broadcast, top-k avoids a global sort, aggregates run
  * partial+final. These lock the plans Catalyst currently picks so a
  * refactor that silently de-optimizes fails CI. */
class PlanShapeSpec extends SparkSpec {

  private def plan(key: String): String =
    SparkEntry.queries(key)(spark, sfSmoke).queryExecution.executedPlan.toString

  test("q05 pushes filter and projection into the parquet scan") {
    val p = plan("q05_scan_project_filter")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThan(l_discount"), p)
    // pruned read schema — no l_extendedprice in the scan
    assert(!p.contains("l_extendedprice"), p)
  }

  test("q11 uses a broadcast hash join for the dimension side") {
    val p = plan("q11_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q18 top-k plans TakeOrderedAndProject, not a global sort") {
    val p = plan("q18_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q02/q06 aggregate partial then final (map-side combine)") {
    assert(plan("q02_global_max").contains("partial_max"), plan("q02_global_max"))
    val p6 = plan("q06_agg_groupby")
    assert(p6.contains("HashAggregate"), p6)
    assert(p6.contains("partial_"), p6)
  }

  test("q26 broadcasts the query vector (no shuffle of embeddings)") {
    val p = plan("q26_similarity_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q01 global sort is a range-partitioned parallel sort") {
    val p = plan("q01_global_sort")
    assert(p.contains("Sort"), p)
    assert(p.contains("rangepartitioning"), p)
  }

  import org.apache.spark.sql.catalyst.plans.logical

  private def windows(key: String): (Seq[logical.Window], String) = {
    val qe = SparkEntry.queries(key)(spark, sfSmoke).queryExecution
    (qe.optimizedPlan.collect { case w: logical.Window => w }, qe.optimizedPlan.toString)
  }

  test("q37 centroid assignment is relation-based: no Window, partial map-side argmax") {
    val (ws, p) = windows("q37_ann_ivf")
    assert(ws.isEmpty, p)
    val phys = plan("q37_ann_ivf")
    // the centroid relation reaches the scan as a broadcast, the winning
    // cell collapses map-side (partial max over the (csim,-cid) struct)
    // before the slim vec_id shuffle, and the top-k is a heap
    assert(phys.contains("BroadcastNestedLoopJoin") || phys.contains("BroadcastExchange"), phys)
    assert(phys.contains("partial_max"), phys)
    assert(phys.contains("TakeOrderedAndProject"), phys)
  }

  test("q42 document frequency avoids a window over hot token partitions") {
    val (ws, p) = windows("q42_tfidf")
    // the only window left is the per-doc top-term rank (partitioned by doc_id)
    ws.foreach(w => assert(w.partitionSpec.nonEmpty, p))
    assert(plan("q42_tfidf").contains("BroadcastHashJoin"), plan("q42_tfidf"))
  }

  test("q56/q57 aggregate partially before the token shuffle") {
    assert(plan("q56_inverted_index").contains("partial_count"), plan("q56_inverted_index"))
    val p57 = plan("q57_ngram_counts")
    assert(p57.contains("partial_count"), p57)
    assert(p57.contains("TakeOrderedAndProject"), p57)
  }

  test("q59 quantization is map-only (no hash exchange before the sort)") {
    val p = plan("q59_embedding_quantize")
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("no query plans an unbroadcast cartesian product") {
    SparkEntry.registry.foreach { q =>
      val p = q.run(spark, sfSmoke).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"${q.key}: $p")
    }
  }

  test("q66/q67 are map-only up to the presentation sort (no hash exchange)") {
    assert(!plan("q66_doc_chunking").contains("Exchange hashpartitioning"),
      plan("q66_doc_chunking"))
    assert(!plan("q67_repetition_score").contains("Exchange hashpartitioning"),
      plan("q67_repetition_score"))
  }

  test("q68 probes a broadcast test-shingle set (no corpus-side shuffle join)") {
    val p = plan("q68_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q69 packing has no data-sized window partition") {
    val (ws, p) = windows("q69_sequence_pack")
    assert(ws.nonEmpty, p)
    // every window must be range-slice-partitioned (bounded slices) or sit
    // above an aggregate (the k-row slice-offset relation) — a constant or
    // empty partition spec over raw data would funnel the table through
    // one task
    ws.foreach { w =>
      val sliced = w.partitionSpec.exists(_.references.exists(_.name == "_slice"))
      val aboveAgg = w.child.collectFirst { case a: logical.Aggregate => a }.isDefined
      assert(sliced || aboveAgg, s"window partitionSpec=${w.partitionSpec}\n$p")
    }
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    // At 100 TB a selective dimension predicate should reach the fact scan
    // as a runtime bloom filter (row-group skipping long before the join).
    // Spark injects it above size thresholds tuned for clusters; lower the
    // application-side floor so the tiny fixture demonstrates the plan.
    import org.apache.spark.sql.functions.col
    // the fixture is broadcast-sized, the 100 TB shape is a shuffle join —
    // suppress auto-broadcast and the size floor so the tiny data plans
    // the way a fact-to-fact join does on a cluster
    val key = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val bcast = "spark.sql.autoBroadcastJoinThreshold"
    val enab = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    val prev = spark.conf.get(key)
    val prevB = spark.conf.get(bcast)
    val prevE = spark.conf.get(enab)
    spark.conf.set(key, "0")
    spark.conf.set(bcast, "-1")
    spark.conf.set(enab, "true")
    try {
      val orders = graft.sources.Tables.orders(spark, sfSmoke)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      // fact side carries its own shuffle (per-order aggregate) — the rule
      // only injects where the filter can save shuffle bytes
      val li = graft.sources.Tables.lineitem(spark, sfSmoke)
        .groupBy(col("l_orderkey"))
        .agg(org.apache.spark.sql.functions.sum(col("l_quantity")).as("qty"))
      val p = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"), p)
    } finally {
      spark.conf.set(key, prev)
      spark.conf.set(bcast, prevB)
      spark.conf.set(enab, prevE)
    }
  }

  test("q90 bloom probe filters the fact side before the exact semi-join") {
    // The composable-operator twin of the AQE-injected filter above: the
    // native bloom_contains test must sit BELOW the semi-join (pruning
    // rows before the join machinery), stay inside whole-stage codegen,
    // and the exact semi-join must still be present (false positives are
    // removed, so correctness never rests on the bloom).
    val p = plan("q90_bloom_semi_join")
    val probeAt = p.indexOf("bloomcontains")
    val joinAt = p.indexOf("LeftSemi")
    assert(probeAt >= 0, p)
    assert(joinAt >= 0, p)
    // executedPlan prints top-down: the probe appearing AFTER the join
    // header means it executes below (before) the join
    assert(probeAt > joinAt, s"bloom probe not below the semi-join:\n$p")
    // and it reached the scan-level Filter (DataFilters), not a post-join
    // Project — the pruning happens before any join machinery sees a row
    assert(p.contains("DataFilters: [bloomcontains"), p)
  }

  test("q162 deletion semi-joins: broadcast below the key limit, bloom-pruned above") {
    // r9 verdict task 7: the scaladoc's bloom-fallback claim wired to
    // code. Below spark.graft.broadcastKeyLimit the key list broadcasts
    // (fixture default); forcing the limit below ANY count (-1 — the
    // smoke fixture's deletion list is legitimately empty, so 0 would
    // still broadcast) must flip BOTH cascade hops onto q90's
    // bloom-pruned shuffle — with the exact semi-join still present, so
    // the two regimes are value-identical.
    val pDef = plan("q162_deletion_audit")
    assert(pDef.contains("BroadcastExchange"), pDef)
    assert(!pDef.contains("bloomcontains"), pDef)
    val defRows = SparkEntry.queries("q162_deletion_audit")(spark, sfSmoke)
      .collect().toSeq
    spark.conf.set(operators.KeyPrune.BroadcastKeyLimitKey, "-1")
    try {
      val p = plan("q162_deletion_audit")
      val probeAt = p.indexOf("bloomcontains")
      val joinAt = p.indexOf("LeftSemi")
      assert(probeAt >= 0 && joinAt >= 0, p)
      // the probe prints below the first semi-join header: it prunes
      // fact rows before any join machinery sees them
      assert(probeAt > joinAt, s"bloom probe not below the semi-join:\n$p")
      val bloomRows = SparkEntry.queries("q162_deletion_audit")(spark, sfSmoke)
        .collect().toSeq
      assert(bloomRows == defRows, "regimes must be value-identical")
    } finally spark.conf.unset(operators.KeyPrune.BroadcastKeyLimitKey)
  }

  test("q79 true-Jaccard overlap joins only candidate-doc postings") {
    // r3 verdict item 5: the heavy sgh self-join must consume postings
    // semi-joined down to candidate docs (at 100 TB candidates are the
    // LSH-reduced near-dup set; the fixture's template corpus makes the
    // reduction invisible in TIME, so the SHAPE is what's locked).
    val p = plan("q79_minhash_accuracy")
    assert(p.contains("LeftSemi"), p)
  }

  test("q72 inference is map-only up to the presentation sort") {
    val p = plan("q72_batch_inference")
    assert(p.contains("MapPartitions"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q73 merge pre-aggregates both sides map-side before the outer join") {
    val p = plan("q73_merge_upsert")
    assert(p.contains("FullOuter"), p)
    assert(p.contains("partial_max_by"), p) // latest-wins is a combine-able aggregate
    // the aggregate outputs are already partitioned by the merge key — the
    // join must not add its own exchanges
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2, p)
  }

  test("q41 never shuffles an embeddings scan (bucket shuffle is ids-only)") {
    val p = plan("q41_dedup_embedding")
    // verify joins are broadcast probes of the two embeddings scans;
    // a SortMergeJoin would mean a full embeddings shuffle re-appeared
    assert(!p.contains("SortMergeJoin"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
  }

  test("no registry query has a data-sized window partition") {
    // The scale-killer this locks out: Window.partitionBy(<constant-
    // cardinality key>) over raw data funnels the table through O(1)
    // tasks at any cluster size (round-2 verdict on q16/q17). A window is
    // acceptable iff one of:
    //  - its partition spec references `_slice` (the Ranks range-slice
    //    decomposition: partition count scales with data);
    //  - its partition spec references a key whose cardinality scales
    //    with the data (per-user/doc/vector/order groups stay small);
    //  - its input subtree contains an Aggregate — the window runs over a
    //    bounded derived relation (value relations, slice offsets,
    //    tie groups), not the corpus;
    //  - the optimizer inserted a WindowGroupLimit (rank-filter pushdown:
    //    map-side per-group heaps bound the final per-group work).
    SparkEntry.registry.foreach { q =>
      val qe = SparkEntry.queries(q.key)(spark, sfSmoke).queryExecution
      val plan = qe.optimizedPlan
      plan.collect { case w: logical.Window => w }.foreach { w =>
        assert(windowIsScaleSafe(w),
          s"${q.key}: data-sized window partition ${w.partitionSpec}\n$plan")
      }
    }
  }

  private val scalesWithData = Set(
    "user_id", "doc_id", "vec_id", "c_custkey", "o_custkey", "o_orderkey",
    "l_orderkey", "ps", "psh", "token", "sig", "bucket", "cluster_id",
    // file ids under the repo's size-capped layouts (q214/q225/q233
    // convention: key div 256 or rank div 256) — file COUNT scales with
    // data and every file partition is ≤256 rows by construction
    "fid")

  /** The per-window scale-safety predicate behind the registry sweep.
    * WindowGroupLimit is attributed to the SPECIFIC window it bounds —
    * one sitting in this window's child subtree with a semantically
    * equal partition spec — never plan-wide: r11's q201 slipped an
    * unbounded corpus-wide window past the sweep because a SIBLING
    * window's rank<=10 group limit whitelisted the whole plan
    * (r11 verdict task 4). */
  private def windowIsScaleSafe(w: logical.Window): Boolean = {
    val refs = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
    val sliced = refs.contains("_slice") || refs.contains("pid")
    val scaled = refs.exists(r => scalesWithData.exists(r.startsWith))
    val aboveAgg = w.child.collectFirst { case a: logical.Aggregate => a }.isDefined
    val grouped = w.child.collect { case g: logical.WindowGroupLimit => g }
      .exists(g => g.partitionSpec.length == w.partitionSpec.length &&
        g.partitionSpec.zip(w.partitionSpec)
          .forall { case (a, b) => a.semanticEquals(b) })
    sliced || scaled || aboveAgg || grouped
  }

  test("sweep attribution is per-window: a sibling's WindowGroupLimit whitelists nothing") {
    // synthetic q201-shaped plan: the SAME non-scaling-keyed window twice
    // over one relation — one rank<=10-filtered branch (optimizer inserts
    // WindowGroupLimit) unioned with one unbounded branch. The r11 sweep's
    // plan-wide hasGroupLimit passed both; per-window attribution must
    // pass exactly the limited one.
    import org.apache.spark.sql.functions._
    val df = spark.range(100)
      .select((col("id") % 4).as("grp"), col("id").as("v"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("v"))
    val limited = df.withColumn("r", row_number().over(w))
      .filter(col("r") <= 10)
    val unbounded = df.withColumn("r", row_number().over(w))
    val plan = limited.union(unbounded).queryExecution.optimizedPlan
    val verdicts = plan.collect { case win: logical.Window => win }
      .map(windowIsScaleSafe)
    assert(verdicts.sorted == Seq(false, true),
      s"expected exactly the rank-limited window safe, got $verdicts\n$plan")
  }

  test("q76 cluster pruning rides WindowGroupLimit (map-side per-cluster heaps)") {
    // rank<=3 over partitionBy(cid) must rewrite to WindowGroupLimit —
    // without it the per-cluster window concentrates corpus/B rows per
    // task at any cluster size
    val p = plan("q76_semdedup")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q98 entropy is map-only (native kernel, no hash exchange)") {
    val p = plan("q98_char_entropy")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("charentropy"), p)
  }

  test("q106 as-of alignment is join-free (union-merge, one doc-keyed shuffle)") {
    // the naive plan is an inequality join (quadratic per doc); the
    // union-merge form must plan with NO join operator at all
    val p = plan("q106_frame_caption_align")
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
  }

  test("q109 KMV sketch partials combine map-side (bounded state)") {
    // the BoundedHead aggregate must run in partial mode before the
    // source shuffle — every shuffled buffer is <= k longs
    val p = plan("q109_kmv_distinct")
    assert(p.contains("partial_boundedhead"), p)
  }

  test("q81 filters query tokens before the aggregation shuffle") {
    import org.apache.spark.sql.catalyst.plans.logical
    val qe = SparkEntry.queries("q81_index_probe")(spark, sfSmoke).queryExecution
    // the IN predicate must sit BELOW the doc_id aggregate, so the
    // shuffle carries at most |query| rows per document
    val agg = qe.optimizedPlan.collectFirst {
      case a: logical.Aggregate => a }.get
    val filtered = agg.child.collectFirst {
      case f: logical.Filter if f.condition.references.exists(_.name == "token") => f }
    assert(filtered.isDefined, qe.optimizedPlan.toString)
  }

  test("q04 never funnels the full table through an unpartitioned window") {
    val (ws, p) = windows("q04_sorted_check")
    assert(ws.nonEmpty, p)
    ws.filter(_.partitionSpec.isEmpty).foreach { w =>
      // an unpartitioned window may only see the k per-partition boundary
      // rows, i.e. its input subtree must already be aggregated
      assert(w.child.collectFirst { case a: logical.Aggregate => a }.isDefined, p)
    }
  }

  test("q127 encode is join-free: merges are driver literals, not a relation") {
    // the merge table must reach the encode pass as interpolated string
    // literals (3 collected rows), never as a joined relation — a join
    // would re-derive the training chain inside the encode job
    val df = SparkEntry.queries("q127_bpe_encode")(spark, sfSmoke)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: logical.Join => j }
    assert(joins.isEmpty, df.queryExecution.optimizedPlan.toString)
  }

  test("q133 is two 9-long aggregate states and one 1-row join") {
    // the drift audit must never shuffle keyed data: every aggregate is
    // global (grouping-free), so state is the fixed histogram width
    val qe = SparkEntry.queries("q133_drift_psi")(spark, sfSmoke).queryExecution
    val aggs = qe.optimizedPlan.collect { case a: logical.Aggregate => a }
    assert(aggs.nonEmpty && aggs.forall(_.groupingExpressions.isEmpty),
      qe.optimizedPlan.toString)
  }

  test("q134 sketch pairs ride a broadcast; exact side is an equi-join on the hash") {
    val p = plan("q134_source_overlap")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // the vocabulary-sized relation must never cartesian with itself
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q136 is one partial+final aggregate over one scan") {
    val p = plan("q136_feature_corr")
    assert(p.contains("partial_"), p)
    assert(!p.contains("Join"), p)
  }

  test("q141 CDF prefix sums are range-sliced, never one unpartitioned window") {
    // The registry sweep's above-an-Aggregate escape hatch is a loophole
    // here: q141's per-distinct-value relation is ~row-count-sized for a
    // continuous column, so its running sums must ride the Ranks slice
    // decomposition (ADVICE r7), not a global Window over the aggregate.
    val qe = SparkEntry.queries("q141_ks_test")(spark, sfSmoke).queryExecution
    val ws = qe.optimizedPlan.collect { case w: logical.Window => w }
    assert(ws.nonEmpty, qe.optimizedPlan.toString)
    ws.foreach { w =>
      val refs = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
      // legal: slice-local prefix window, or the offsets window over the
      // k-row per-slice totals aggregate (k = partition count, not data)
      val overSliceTotals = w.child.collectFirst {
        case a: logical.Aggregate
          if a.groupingExpressions.exists(_.references.exists(_.name == "_slice")) => a
      }.isDefined
      assert(refs.contains("_slice") || overSliceTotals,
        s"unsliced window partitionSpec=${w.partitionSpec}\n${qe.optimizedPlan}")
    }
  }

  test("q150 resharding audit is one map pass into tiny aggregates — no join, no window") {
    val qe = SparkEntry.queries("q150_shard_rebalance")(spark, sfSmoke).queryExecution
    val plan = qe.optimizedPlan
    assert(plan.collect { case j: logical.Join => j }.isEmpty, plan.toString)
    assert(plan.collect { case w: logical.Window => w }.isEmpty, plan.toString)
    assert(qe.executedPlan.toString.contains("partial_"), qe.executedPlan.toString)
    // the per-key hash grid is O(shards) md5s by contract (scaladoc),
    // fused into exactly ONE native HrwPack call per key (r12 verdict
    // task 4) — no per-shard expression chain, no materialized hash
    // array, no second kernel invocation for the second argmax
    val analyzed = qe.analyzed.toString
    val kernels = analyzed.split("hrwpack\\(").length - 1
    assert(kernels == 1, s"expected exactly one hrwpack kernel: $analyzed")
    assert(analyzed.contains("hrwpack(k#"), analyzed)
    assert(!analyzed.contains("sequence("), analyzed)
  }

  test("q151 watermark prefix max is range-sliced, never one unpartitioned window") {
    // same discipline as q141: the arrival-ordered running max over the
    // raw log is the textbook global-window funnel; it must ride the
    // Ranks slice decomposition
    val qe = SparkEntry.queries("q151_watermark_planner")(spark, sfSmoke).queryExecution
    val ws = qe.optimizedPlan.collect { case w: logical.Window => w }
    assert(ws.nonEmpty, qe.optimizedPlan.toString)
    ws.foreach { w =>
      val refs = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
      val overSliceTotals = w.child.collectFirst {
        case a: logical.Aggregate
          if a.groupingExpressions.exists(_.references.exists(_.name == "_slice")) => a
      }.isDefined
      assert(refs.contains("_slice") || overSliceTotals,
        s"unsliced window partitionSpec=${w.partitionSpec}\n${qe.optimizedPlan}")
    }
  }

  test("q145 checksum partial-combines map-side (16-byte partial states)") {
    val p = plan("q145_table_checksum")
    assert(p.contains("partial_"), p)
    assert(!p.contains("Join"), p)
  }

  test("q148 diff is one key-shuffled full-outer join, hash-width payload") {
    val qe = SparkEntry.queries("q148_snapshot_diff")(spark, sfSmoke).queryExecution
    val joins = qe.optimizedPlan.collect { case j: logical.Join => j }
    assert(joins.length == 1, qe.optimizedPlan.toString)
    assert(joins.head.joinType.sql == "FULL OUTER", joins.head.joinType.sql)
    // the join must move hashes, never the wide rows: each side's output
    // is exactly (key, hash)
    joins.head.children.foreach { side =>
      assert(side.output.length == 2, side.output.mkString(", "))
    }
  }

  test("q173 recall audit: per-query top-k rides WindowGroupLimit; probes broadcast") {
    // the exact baseline's per-query window is corpus-sized by design
    // (it IS the audit); the rank<=k filter must rewrite to
    // WindowGroupLimit so per-group heaps stay map-side and bounded —
    // without it the audit concentrates n rows per query task
    val qe = SparkEntry.queries("q173_ivf_recall")(spark, sfSmoke).queryExecution
    val p = qe.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
    // query batch and probe map travel as broadcasts — the corpus never
    // shuffles by query id
    assert(p.contains("BroadcastExchange"), p)
  }

  test("q174 ablation: occurrence relation materializes once, globals broadcast") {
    val qe = SparkEntry.queries("q174_source_ablation")(spark, sfSmoke).queryExecution
    val plan = qe.optimizedPlan
    // no window anywhere — the sheet is pure aggregate + join algebra
    assert(plan.collect { case w: logical.Window => w }.isEmpty, plan.toString)
    assert(qe.executedPlan.toString.contains("BroadcastExchange"),
      qe.executedPlan.toString)
  }

  test("q202 IVFADC search: broadcast probes, heap top-k, no shuffle join") {
    val p = plan("q202_ivfadc_search")
    // the codebook and centroid array travel as broadcasts/literals; the
    // top-10 merges per-partition heaps; a SortMergeJoin would mean the
    // coded corpus shuffled for the probe
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q205 collision matrix: pair mass is arithmetic — no pair explode") {
    // candidate-pair MASS comes from bucket occupancy counts, never from
    // materialized pairs: the only Generate allowed is none at all (the
    // min-shingle is an array fold, not an explode)
    val qe = SparkEntry.queries("q205_source_collision_matrix")(spark, sfSmoke)
      .queryExecution
    assert(qe.optimizedPlan.collect {
      case g: logical.Generate => g }.isEmpty, qe.optimizedPlan.toString)
  }

  test("q206 bloom probe is map-only: one ground-truth broadcast join, no shuffle join") {
    val p = plan("q206_bloom_fpr_audit")
    assert(!p.contains("SortMergeJoin"), p)
    // exactly the exact-membership broadcast join; the bloom test itself
    // is bit arithmetic on a literal bitmap (no join machinery)
    assert("BroadcastHashJoin".r.findAllIn(p).length == 1, p)
  }

  test("q212/q215/q216 rankings ride WindowGroupLimit heaps") {
    // r13 verdict task 2: the round-13 serving-eval sheets claimed
    // map-side heap rankings but carried no plan lock. Every rank<=k
    // filter over a corpus-sized candidate relation must rewrite to
    // WindowGroupLimit so per-group state stays bounded. (q217/q220's
    // heap rankings run inside eager materializations and are locked by
    // the ExistingRDD assertion below instead — the consuming plan
    // cannot show them.)
    Seq("q212_retrieval_ndcg", "q215_rerank_lift", "q216_mmr_diversify")
      .foreach { key =>
        val p = plan(key)
        assert(p.contains("WindowGroupLimit"), s"$key lost its heap:\n$p")
      }
  }

  test("q217/q220 consume materialized heap rankings, no corpus window survives") {
    Seq("q217_dim_truncation", "q220_sq_recall").foreach { key =>
      val qe = SparkEntry.queries(key)(spark, sfSmoke).queryExecution
      assert(qe.executedPlan.toString.contains("Scan ExistingRDD"),
        s"$key:\n${qe.executedPlan}")
      // the per-variant rankings are heap-limited INSIDE the eager
      // materializations; nothing window-shaped may remain in the
      // consuming plan (a reappearing window = the materialization lost)
      assert(qe.optimizedPlan.collect { case w: logical.Window => w }.isEmpty,
        s"$key:\n${qe.optimizedPlan}")
    }
  }

  test("q214/q218/q219 corpus passes are map-only into bounded aggregates") {
    // the zone-map audit, CMS audit, and filter-ordering planner each
    // make ONE pass over the fact/corpus table that must partial-combine
    // map-side; no window may touch raw data, and every JOIN must have
    // at least one aggregate-reduced (broadcastable) side — a raw scan
    // may enrich against the tiny grid map-side, but two unbounded
    // relations must never shuffle-join
    def joinSideOk(p: logical.LogicalPlan): Boolean = p match {
      case _: logical.Aggregate => true
      case _: logical.GlobalLimit | _: logical.LocalLimit => true
      case leaf if leaf.children.isEmpty =>
        leaf.nodeName != "Relation" && leaf.nodeName != "LogicalRelation"
      case other => other.children.forall(joinSideOk)
    }
    Seq("q214_skipping_audit", "q218_cms_audit", "q219_filter_ordering")
      .foreach { key =>
        val qe = SparkEntry.queries(key)(spark, sfSmoke).queryExecution
        val p = qe.executedPlan.toString
        assert(p.contains("partial_"), s"$key lost map-side combine:\n$p")
        qe.optimizedPlan.foreach {
          case j: logical.Join =>
            assert(j.children.exists(joinSideOk),
              s"$key joins two unbounded relations:\n${qe.optimizedPlan}")
          case w: logical.Window =>
            assert(boundedBelow(w.child),
              s"$key windows over unbounded input:\n${qe.optimizedPlan}")
          case _ =>
        }
      }
  }

  test("q203/q211/q212/q215/q216 read the standing index, never rebuild it") {
    // the serving/audit family consumes servingIndex (one materialized
    // artifact per session/scale); a rebuild would show the coded corpus
    // derived from a parquet scan instead of the checkpointed RDD
    Seq("q203_ivfadc_recall", "q211_ivf_occupancy", "q212_retrieval_ndcg",
        "q215_rerank_lift", "q216_mmr_diversify").foreach { key =>
      val p = plan(key)
      assert(p.contains("Scan ExistingRDD"),
        s"$key does not read the materialized serving index:\n$p")
    }
  }

  /** Bounded-input judgment for an unpartitioned/constant window —
    * shared with the test-session-wide execution tripwire so both
    * gates adjudicate identically (see [[WindowTripwire.boundedBelow]]). */
  private def boundedBelow(p: logical.LogicalPlan): Boolean =
    WindowTripwire.boundedBelow(p)

  test("tripwire: every unpartitioned window in the registry sits over bounded input") {
    // r13 verdict task 6: 112 `WindowExec: No Partition Defined` WARNs
    // were each adjudicated window-over-aggregate by hand; this makes
    // the adjudication structural. A future corpus-sized unpartitioned
    // window fails here instead of in production.
    val offenders = SparkEntry.registry.flatMap { q =>
      val qe = q.run(spark, sfSmoke).queryExecution
      qe.optimizedPlan.collect {
        case w: logical.Window
            if w.partitionSpec.isEmpty && !boundedBelow(w.child) =>
          s"${q.key}: ${w.windowExpressions.map(_.name).mkString(",")}"
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }

  test("q221 HLL registers max-combine map-side; no window anywhere") {
    // the register relation is the production merge unit: max(rho) must
    // partial-aggregate before the (grp, idx) shuffle, and nothing in
    // the sketch side may plan a window (a rank-based register fold
    // would single-task each group)
    val (ws, lp) = windows("q221_hll_audit")
    assert(ws.isEmpty, lp)
    val p = plan("q221_hll_audit")
    assert(p.contains("partial_max"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q222 caps attempts at rank 16 via WindowGroupLimit, user-partitioned") {
    val (ws, lp) = windows("q222_passk")
    assert(ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty), lp)
    val p = plan("q222_passk")
    // the rn <= 16 filter must push into the window as a group limit so
    // each task keeps 16 rows per user map-side
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("q223 prefix buckets are map-only into aggregates: no join, no window") {
    val (ws, lp) = windows("q223_prefix_cache")
    assert(ws.isEmpty, lp)
    val p = plan("q223_prefix_cache")
    assert(p.contains("partial_count"), p)
    assert(!p.contains("Join"), p)
  }

  test("q224 ring/HRW assignment stays fused: one scan, no join of any kind") {
    val (ws, lp) = windows("q224_ring_rebalance")
    assert(ws.isEmpty, lp)
    val p = plan("q224_ring_rebalance")
    // both owner computations are per-row expressions over the one
    // orders scan (typedLit ring + native HrwPack) — a point-relation
    // join formulation would plan a CartesianProduct/BNLJ here
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("q225 deletion census is map-only into a |files|-row aggregate") {
    val (ws, lp) = windows("q225_deletion_vectors")
    assert(ws.isEmpty, lp)
    val p = plan("q225_deletion_vectors")
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("Join"), p)
  }

  test("q226 chunks form map-side: partial counts, no window, no data-sized join") {
    val (ws, lp) = windows("q226_cdc_chunks")
    assert(ws.isEmpty, lp)
    val p = plan("q226_cdc_chunks")
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("q227 KN marginals broadcast back onto the type relation; heap head") {
    val p = plan("q227_kn_bigram")
    assert(p.contains("partial_count"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q228 both quantile passes are range-sliced ranks, targets broadcast") {
    val p = plan("q228_sample_quantile")
    assert(p.contains("rangepartitioning"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q229 skyline is a prefix scan + broadcast join-back, never a self-join") {
    val p = plan("q229_skyline")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the dominance pass runs on the per-cents aggregate (map-side combine)
    assert(p.contains("partial_max"), p)
  }

  test("q230 IVM maintains via partial aggregates; no base-table sort-merge") {
    val p = plan("q230_ivm_delta")
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q231 attribution is one user-keyed window pass: no join anywhere") {
    val (ws, lp) = windows("q231_attribution")
    assert(ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty), lp)
    val p = plan("q231_attribution")
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_count"), p)
  }

  test("q232 prices the cross join without ever executing one") {
    val p = plan("q232_join_order")
    assert(!p.contains("CartesianProduct"), p)
    // the two key-relation probes stay hash joins; the n_o*n_p row is
    // arithmetic over 1-row broadcasts
    assert(p.contains("BroadcastExchange"), p)
  }

  test("q233 run counting is file-keyed; the size join-back broadcasts") {
    // both layouts' lag windows partition by fid (≤256-row partitions);
    // the remaining unpartitioned windows are Ranks slice offsets over
    // aggregates, which the registry tripwire adjudicates
    val (ws, lp) = windows("q233_bitmap_layout")
    assert(ws.count(w => w.partitionSpec.exists(
      _.references.exists(_.name == "fid"))) >= 2, lp)
    val p = plan("q233_bitmap_layout")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q234 calibration rank is range-sliced; model and targets broadcast") {
    val p = plan("q234_conformal")
    assert(p.contains("rangepartitioning"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("q235 sketches heap-limit per source; pair grid broadcasts") {
    val p = plan("q235_kmv_jaccard")
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q236 builds both histograms from one rank pass; grids broadcast") {
    val p = plan("q236_hist_quality")
    assert(p.contains("rangepartitioning"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q237 CUPED is two aggregates and 1-row broadcast arithmetic") {
    val p = plan("q237_cuped")
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q238 stump planner is one flag aggregate; grid arithmetic only") {
    val p = plan("q238_gini_split")
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q239 noisy histogram is 64 rows; exact rank is range-sliced") {
    val p = plan("q239_dp_quantile")
    assert(p.contains("rangepartitioning"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p)
  }

  test("q240 pipeline tokenizes once (materialized), shingle probes broadcast") {
    val (ws, lp) = windows("q240_curation_e2e")
    assert(ws.isEmpty, lp)
    val p = plan("q240_curation_e2e")
    // the five consumers read the one materialized feature relation,
    // not five re-tokenizations of the corpus scan
    assert(p.contains("Scan ExistingRDD"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q241 alpha is explode -> small-group aggregate: no join, no window") {
    val (ws, lp) = windows("q241_krippendorff")
    assert(ws.isEmpty, lp)
    val p = plan("q241_krippendorff")
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("Join"), p)
  }

  test("q242 serves from one materialized artifact; per-query top-k is heap-bounded") {
    val p = plan("q242_vector_e2e")
    // the five sheet consumers read the one materialized
    // (vec_id, embedding, m, codes, rv, cid) artifact, not five
    // re-assignments of the corpus scan
    assert(p.contains("Scan ExistingRDD"), p)
    // exact baseline + probe + quantized serve: every per-qid rank<=k
    // window carries WindowGroupLimit map-side heaps
    assert("WindowGroupLimit".r.findAllIn(p).length >= 3, p)
    // query batch and probed-cell relations broadcast; nothing
    // corpus-sized meets a shuffle join or cartesian product
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("q159 DSIR: the bigram lineage runs once (materialized pre-aggregate)") {
    // r9 verdict task 1: the tokenize→explode→md5 chain must NOT appear
    // in the consuming plan — it ran exactly once into the materialized
    // (doc_id, source, lang, b, cnt) pre-aggregate that feeds BOTH the
    // LM and the per-doc reduce. No Generate and no parquet re-scan of
    // documents may survive in the final plan.
    val qe = SparkEntry.queries("q159_dsir_importance")(spark, sfSmoke).queryExecution
    val p = qe.optimizedPlan
    assert(p.collect { case g: logical.Generate => g }.isEmpty, p.toString)
    assert(!qe.executedPlan.toString.contains("documents.parquet"),
      qe.executedPlan.toString)
    // LM weights and totals travel as broadcasts
    assert(qe.executedPlan.toString.contains("BroadcastExchange"),
      qe.executedPlan.toString)
  }
}
