package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (SURVEY §2-B s01/s02 + stateful s03).
  *
  * These transforms take an unbounded (streaming) DataFrame of the events
  * schema and are verified with MemoryStream-driven ScalaTest (no DuckDB
  * oracle — the driver's batch Verify can't execute streams).
  *
  * Scale notes: watermarks bound state; the tumbling agg and dedup are
  * partial-aggregated before the state store; sessionization keeps one
  * small state row per active (user, session) and emits on event-time
  * timeout — state size tracks active users, not history.
  *
  * ==State-schema versioning convention (r13 verdict task 7)==
  *
  * flatMapGroupsWithState state is not schema-evolvable: a checkpoint
  * written under one state case class cannot be restored under a
  * structurally different one. Two failure classes, two defenses:
  *
  *   1. STRUCTURAL change (field added/removed/retyped): Spark's state
  *      store schema checker rejects the restore with a state schema
  *      error before user code runs — loud by construction. Each such
  *      change must bump the op's schema history note (the s28
  *      template) so the error is attributable to a release.
  *   2. SEMANTIC change (same shape, different meaning — the dangerous
  *      one, a silent misread): every NEW stateful op's state class
  *      carries a `schema_v: Int` FIRST field pinned to the op's
  *      `SchemaV` constant, checked on every restore and failed loudly
  *      on mismatch. Same-shape reinterpretations must bump SchemaV.
  *
  * [[MixState]] / [[mixRouterStream]] (s28) is the worked template:
  * schema_v field, SchemaV constant, restore guard, and a version
  * history in the op's scaladoc. Pre-existing state classes keep their
  * shape (their checkpoints are live); the convention binds new ops and
  * any op whose state must change anyway.
  */
object StreamOps {

  /** Declared streaming surface: sNN key → entry method, in SURVEY §2-B
    * order. This is the census README's streaming header is locked to
    * (DocsCountsSpec) — add the new op HERE when a wave grows the
    * surface, or the count-lockstep test fails. */
  val registry: Seq[(String, String)] = Seq(
    "s01" -> "tumblingCounts", "s02" -> "dedupEvents", "s03" -> "sessionize",
    "s04" -> "enrich", "s05" -> "streamStreamCorrelate", "s06" -> "splitRouter",
    "s07" -> "nearDedupDocs", "s08" -> "decontaminateStream",
    "s09" -> "scoreStream", "s10" -> "slidingCounts",
    "s11" -> "snapshotMaintain", "s12" -> "quotaSampleStream",
    "s13" -> "mergedIndex", "s14" -> "funnelStream",
    "s15" -> "incrementalDedupStream", "s16" -> "kmvStream",
    "s17" -> "streamStreamLeftOuter", "s18" -> "heavyHittersStream",
    "s19" -> "driftMonitor", "s20" -> "percentilesStream",
    "s21" -> "checksumStream", "s22" -> "contributionCapStream",
    "s23" -> "calibrationStream", "s24" -> "ivfAssignStream",
    "s25" -> "tombstoneFilterStream", "s26" -> "blocklistGateStream",
    "s27" -> "decayedCountsStream", "s28" -> "mixRouterStream",
    "s29" -> "pqEncodeStream", "s30" -> "adcSearchStream",
    "s31" -> "tvdMonitorStream", "s32" -> "ivfadcEncodeStream",
    "s33" -> "streamStreamFullOuter", "s34" -> "fileStatsStream",
    "s35" -> "hllSketchStream", "s36" -> "deletionVectorStream",
    "s37" -> "cdcChunkStream", "s38" -> "attributionStream")

  /** File-source stream over a DIRECTORY of events parquet files (the
    * file streaming source contract; new files appearing in the directory
    * become new micro-batches); driven in tests with Trigger.AvailableNow.
    *
    * Timestamp handling matches the batch loader (Tables.events) for BOTH
    * fixture vintages — a claim the r6 cut made but did not keep (ADVICE
    * r7: it hard-coded the us TimestampType schema, so a legacy
    * TIMESTAMP(NANOS) fixture that the batch path tolerates would fail
    * through the streaming reader). File streams need their schema up
    * front, so ONE driver-side footer read sniffs the vintage before the
    * stream starts: under nanosAsLong a legacy ns fixture surfaces `ts`
    * as LongType and is converted ns→us with exact integer arithmetic
    * (`DIV` — epoch-nanos exceed 2^53); the current us fixture reads
    * TimestampType directly under the pinned UTC session. Identical
    * instants to Tables.events either way. */
  def eventsFileStream(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsIsNanos = spark.read.parquet(dir).schema("ts").dataType ==
      org.apache.spark.sql.types.LongType
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        if (tsIsNanos) org.apache.spark.sql.types.LongType
        else org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema).parquet(dir)
    if (tsIsNanos) stream.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    else stream
  }

  /** s01 — tumbling 1-hour window counts with a 10-minute watermark
    * (append mode: a window emits once the watermark passes its end). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** s13 — streaming sliding (hopping) windows, the streaming twin of
    * batch q51: 2-hour windows every hour, each event expanding into two
    * window rows BEFORE the stateful aggregate (TimeWindow expansion is
    * stateless); the watermark closes windows and bounds state to the
    * open-window set — at any throughput the state store holds
    * (windows inside watermark horizon) × event_types rows, independent
    * of history. ScalaTest drives the full fixture through AvailableNow
    * and matches batch q51 on watermark-closed windows. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** s02 — streaming exact dedup on event_id; watermark bounds the
    * dedup state (late duplicates beyond it are dropped by design). */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** s04 — stream-static enrichment join: the unbounded event stream
    * joins a bounded dimension (customer) on user_id. Spark re-plans the
    * static side per micro-batch; with a small dimension this is a
    * broadcast join per batch — the standard streaming-enrichment shape
    * (no state store involved). */
  def enrich(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(
      customer.select(col("c_custkey"), col("c_mktsegment")),
      events("user_id") === col("c_custkey"), "left")
      .select(events("event_id"), events("user_id"), col("event_type"),
        col("value"), col("c_mktsegment"))

  /** s05 — stream-stream interval join: clicks correlated with purchases
    * of the same user within 5 minutes. Both sides are watermarked and the
    * join condition carries the event-time band, so Spark can bound both
    * state stores (a side's row is dropped once the other side's watermark
    * passes its join window). The unbatched form of q14. */
  def streamStreamCorrelate(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val a = clicks.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val b = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
    a.join(b,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL '5' MINUTE"))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        col("click_ts"), col("purchase_ts"))
  }

  /** s17 — stream-stream LEFT OUTER interval join (round 7): every click
    * emits exactly once — matched rows as soon as the purchase arrives,
    * UNMATCHED clicks with null purchase columns once the watermark
    * proves no in-band purchase can still come. The attribution /
    * conversion-funnel shape s05 cannot express: an inner join never
    * reports the clicks that did NOT convert, which is usually the
    * population being measured.
    *
    * The null-emission is the stateful subtlety: a left row must be held
    * in the state store past its own join window and released only when
    * the RIGHT side's watermark passes click_ts + 5 min (until then a
    * matching purchase may still arrive); Spark's symmetric hash join
    * does exactly this because the join carries both watermarks and an
    * event-time band. Same state-eviction bound as s05 — rows leave
    * state when the opposing watermark passes their band, so state size
    * tracks the in-flight window, not history. */
  def streamStreamLeftOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val a = clicks.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val b = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
    a.join(b,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL '5' MINUTE"),
      "left_outer")
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"))
  }

  /** s33 — stream-stream FULL OUTER interval join (round 13): completes
    * the watermarked stream-join family (s05 inner, s17 left outer) with
    * the one shape it lacked — BOTH unmatched populations emit. Matched
    * click/purchase pairs emit as soon as both sides arrive; an
    * unmatched CLICK emits with null purchase columns once the watermark
    * passes its whole forward band (click_ts + 5 min — a purchase could
    * arrive until then); an unmatched PURCHASE emits with null click
    * columns once the watermark passes the purchase's own timestamp
    * (its band looks BACKWARD: the latest click that can match a
    * purchase is at the purchase itself, so nothing later can pair it).
    * The attribution sheet this completes: s05 reports conversions,
    * s17 adds clicks that never converted, THIS adds purchases with no
    * attributable click — the unattributed-revenue population, usually
    * the alarm column.
    *
    * Same state-eviction bound as s05/s17: the join carries both
    * watermarks and the event-time band, so Spark's symmetric hash join
    * drops each side's row once the OPPOSING watermark passes its band —
    * state size tracks the in-flight window, not history. */
  def streamStreamFullOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val a = clicks.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val b = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
    a.join(b,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL '5' MINUTE"),
      "full_outer")
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_id"), col("p_user"), col("purchase_ts"))
  }

  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessState(startMs: Long, endMs: Long, n: Long, sum: Double)
  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, sum_value: Double)

  private val GapMs = 30 * 60 * 1000L

  /** s03 — streaming sessionization with custom state
    * (flatMapGroupsWithState): a >30-min event-time gap closes a session;
    * closed sessions are emitted either when a later event proves the gap
    * or when the event-time timeout fires (watermark passed last event +
    * gap). This is the streaming twin of batch q29. */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new Timestamp(s.startMs),
              new Timestamp(s.endMs), s.n, s.sum))
          } else {
            val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.endMs <= GapMs =>
                  // a late-but-within-watermark event may precede the
                  // current session start — absorb it into the bounds
                  cur = Some(SessState(math.min(s.startMs, t),
                    math.max(s.endMs, t), s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, new Timestamp(s.startMs),
                    new Timestamp(s.endMs), s.n, s.sum)
                  cur = Some(SessState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // the natural timeout can already be behind the watermark
              // (late batch) — setTimeoutTimestamp throws on that; clamp
              // so the session times out on the next watermark advance
              state.setTimeoutTimestamp(
                math.max(s.endMs + GapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
      }
  }

  /** s07 — streaming near-duplicate filter: map-only SimHash signature
    * per document (the q32 codegen kernel), then watermarked signature
    * dedup — q32's candidate generation collapsed to keep-first streaming
    * policy (equal signatures ⇒ near-identical token sets). State holds
    * one signature row per unique doc inside the watermark; the signature
    * computation itself adds no state and no shuffle.
    *
    * The dedup key is the FULL 120-bit SimHash128 signature (two long
    * columns), not the 60-bit kernel (r7): a dedup filter's false
    * collision silently DROPS a distinct document, and a 2^60 key space
    * has ~40% birthday-collision odds by 10^9 docs — 2^120 keeps the
    * expected collision count ~0 past 10^12. Two extra state-row bytes
    * buy data-loss safety; q32's banding is unaffected (bands are its
    * own geometry, this is exact-signature equality). */
  def nearDedupDocs(docs: DataFrame): DataFrame = {
    graft.functions.SimHash128.register(docs.sparkSession)
    docs
      .withColumn("_sig",
        graft.functions.SimHash128(array_distinct(split(col("text"), " "))))
      .withColumn("sig_lo", element_at(col("_sig"), 1))
      .withColumn("sig_hi", element_at(col("_sig"), 2))
      .drop("_sig")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("sig_lo", "sig_hi")
  }

  /** Static benchmark shingle-hash relation for s08: the DISTINCT
    * md5-60bit 5-token shingle hashes of the held-out test split (q58
    * content-hash bucket >= 90) — built by the SAME
    * CorpusOps.benchmarkShingleSet primitive batch q68 uses (the twin
    * contract depends on one definition). Returned PERSISTED so "built
    * once" holds across micro-batches; the caller owns unpersist() at
    * stream shutdown. */
  def testShingleSet(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    graft.operators.CorpusOps.benchmarkShingleSet(
      graft.sources.Tables.documents(spark, dir)
        .filter(graft.functions.TextOps.contentSplitHash(col("text")) >= 90),
      "doc_id", "text", n = 5)
      .persist()

  /** s08 — streaming benchmark decontamination (streaming twin of q68):
    * each micro-batch of documents is probed against the static benchmark
    * shingle-hash set; contaminated docs (sharing >= 1 five-token shingle)
    * route to a `flagged` sink with their overlap count, the rest to
    * `clean`.
    *
    * foreachBatch because the verdict is doc-level: the shingle explode
    * joins inside the batch and reassembles with a batch-local groupBy —
    * no streaming state at all (the only cross-batch data is the static
    * set, broadcast per batch exactly like q68). Exactly-once on replay
    * via the s06 `_batch` dynamic-partition-overwrite contract. */
  def decontaminateStream(docs: DataFrame, testShingles: DataFrame, outDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.functions.TextOps
    docs.writeStream
      .option("checkpointLocation", s"$outDir/_ckpt")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // ONE evaluation of the expensive shingle probe: the routed frame
        // (left join + verdict) is persisted and both sinks filter it.
        // The probe is CorpusOps.decontaminateAgainst — the same code
        // path as batch q68, which the equivalence test depends on.
        val routed = batch
          .join(
            graft.operators.CorpusOps.decontaminateAgainst(
              batch, testShingles, "doc_id", "text", n = 5),
            Seq("doc_id"), "left")
          .withColumn("_batch", lit(batchId))
          .persist()
        try {
          routed.filter(col("n_shared").isNull).drop("n_shared")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch").parquet(s"$outDir/clean")
          routed.filter(col("n_shared").isNotNull)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch").parquet(s"$outDir/flagged")
        } finally { routed.unpersist(); () }
      }
      .start()
  }

  /** s09 — streaming batched inference (twin of batch q72): the SAME
    * scoring kernel (CorpusOps.scoreDocs — per-task model init,
    * fixed 64-row micro-batches) applied to an unbounded document stream.
    * Stateless map — no watermark, no state store; scored rows stream
    * through in append mode, so throughput scales with tasks exactly like
    * the batch form. */
  def scoreStream(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    graft.operators.CorpusOps.scoreDocs(
      docs.select(col("doc_id"), col("text")).as[(Long, String)])
  }

  /** s10 — continuous snapshot maintenance (streaming MERGE, the
    * streaming twin of batch q73): each micro-batch upserts into the
    * corpus snapshot — latest version per key wins, unseen keys insert —
    * and writes the result as a NEW versioned snapshot directory
    * `snapshot_v<batchId>` plus a `_LATEST` pointer file.
    *
    * Versioned immutable directories are the table-format pattern (a
    * manifest naming immutable files) reduced to its essentials. The
    * CURRENT version is derived by listing committed snapshots (those
    * with Spark's `_SUCCESS` marker) and taking the highest batch id —
    * deliberately NOT a mutable pointer file, whose in-place rewrite
    * window would lose the previous version on a crash. A replayed batch
    * whose own snapshot already committed is skipped (idempotent); one
    * that half-wrote (no `_SUCCESS`) is cleanly overwritten from the
    * previous committed version. Old versions remain for time travel
    * until a retention sweep. State lives entirely in storage — the
    * stream holds nothing. Per-batch cost is one snapshot rewrite; at
    * scale the rewrite is partitioned by key range so a batch touches
    * only the partitions its keys hit (here: whole-snapshot rewrite, the
    * fixture is small). */
  /** The current committed snapshot directory name under `outDir`, or
    * None before the first commit: highest snapshot_v<id> carrying
    * Spark's `_SUCCESS` commit marker. Listing goes through the Hadoop
    * filesystem, so any outDir scheme (local/HDFS/S3A) works. Readers and
    * the maintainer share this one definition of "current". */
  def latestSnapshot(spark: org.apache.spark.sql.SparkSession,
      outDir: String): Option[String] = {
    val base = new org.apache.hadoop.fs.Path(outDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) None
    else {
      val V = "snapshot_v(\\d+)".r
      // one listing; _SUCCESS probed newest-first so the steady-state
      // cost is a single exists() regardless of how many versions have
      // accumulated (retention sweeps are the deployment's job)
      fs.listStatus(base).iterator
        .filter(_.isDirectory)
        .flatMap(st => st.getPath.getName match {
          case V(id) => Some(id.toLong -> st.getPath)
          case _ => None
        })
        .toSeq.sortBy(-_._1).iterator
        .find { case (_, p) =>
          fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")) }
        .map(_._2.getName)
    }
  }

  def snapshotMaintain(docs: DataFrame, outDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    docs.writeStream
      .option("checkpointLocation", s"$outDir/_ckpt")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        // the scheme's commit signal is the _SUCCESS marker — fail fast
        // if the committer is configured not to write them (standard S3
        // tuning) rather than silently starting every merge from nothing
        require(spark.sparkContext.hadoopConfiguration.getBoolean(
          "mapreduce.fileoutputcommitter.marksuccessfuljobs", true),
          "snapshotMaintain requires _SUCCESS markers " +
            "(mapreduce.fileoutputcommitter.marksuccessfuljobs=true)")
        val target = s"snapshot_v$batchId"
        val current = latestSnapshot(spark, outDir)
        val currentId = current.map(_.stripPrefix("snapshot_v").toLong)
        // a committed snapshot NEWER than this batch means the streaming
        // checkpoint was reset over an existing outDir — merging from the
        // stale-future state or skipping would silently lose data either
        // way; surface it instead
        if (currentId.exists(_ > batchId)) sys.error(
          s"snapshotMaintain: $outDir already holds ${current.get} but the " +
            s"stream replayed batch $batchId — checkpoint and outDir are " +
            "out of sync (was _ckpt deleted?); point the stream at a fresh " +
            "outDir or restore the checkpoint")
        // replay guard: if this batch's own snapshot already committed,
        // rewriting would read and overwrite the same directory (which
        // Spark refuses) and recompute nothing — skip so the streaming
        // checkpoint can commit. A half-written target (no _SUCCESS) is
        // invisible to latestSnapshot and gets cleanly overwritten.
        if (!current.contains(target)) {
          val incoming = batch
            .groupBy(col("doc_id"))
            .agg(max_by(col("text"), col("version")).as("text"),
              max(col("version")).as("version"))
          val merged = current match {
            case Some(v) =>
              // latest-wins across snapshot + batch: same argmax aggregate
              // as q73, applied to the union
              spark.read.parquet(s"$outDir/$v").unionByName(incoming)
                .groupBy(col("doc_id"))
                .agg(max_by(col("text"), col("version")).as("text"),
                  max(col("version")).as("version"))
            case None => incoming
          }
          merged.write.mode("overwrite").parquet(s"$outDir/$target")
        }
        ()
      }
      .start()
  }

  /** s11 — incremental inverted-index maintenance (streaming twin of the
    * q56 index build): every micro-batch writes a PARTIAL index delta —
    * (token, df contribution, sorted postings) for just that batch's
    * documents — and readers (or a periodic compaction, the Io.compact
    * story) merge deltas by token. This is how a 100 TB index actually
    * stays fresh: the corpus is never re-indexed; each ingest batch adds
    * a segment and merge happens on read or in a background OPTIMIZE —
    * the LSM pattern reduced to parquet + batch-id partitions.
    *
    * Exactly-once on replay via the s06 `_batch` dynamic-partition-
    * overwrite contract. Zero streaming state: a batch's delta depends
    * only on that batch. Per-delta postings are batch-bounded; the merge
    * side stays constant-memory per token via the BoundedHead aggregate
    * (see mergedIndex). */
  def indexDeltas(docs: DataFrame, outDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.functions.TextOps
    docs.writeStream
      .option("checkpointLocation", s"$outDir/_ckpt")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch
          .select(col("doc_id"),
            explode(array_distinct(TextOps.tokens(col("text")))).as("token"))
          .groupBy(col("token"))
          .agg(count(lit(1)).as("df"),
            sort_array(collect_list(col("doc_id"))).as("postings"))
          .withColumn("_batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch").parquet(s"$outDir/deltas")
        ()
      }
      .start()
  }

  /** Merge the s11 delta segments into the current index view: df sums
    * across deltas; postings union-sorted with the same presentation cap
    * as batch q56 (ScalaTest asserts the merged view equals the batch
    * build exactly). One token-keyed aggregate over the delta relation —
    * deltas are pre-aggregated per batch, so this is a merge of partial
    * states, not a corpus re-scan (the reference's partial→final combine
    * one more time, across TIME instead of tasks).
    *
    * Posting state is CONSTANT-BOUNDED (r3 verdict item 4): each delta's
    * postings are sliced to `cap` map-side (valid — deltas are written
    * sorted, and the global head is contained in the union of per-delta
    * heads), then merged by the BoundedHead aggregate whose every partial
    * buffer holds at most `cap` elements. A stop token with a 100 TB
    * ingest history behind it costs the same per-task memory as a rare
    * one; only df (one long) accumulates. The earlier
    * flatten(collect_list) shape grew with delta count before its slice
    * ran — the exact unbounded-state defect this replaces. */
  def mergedIndex(spark: org.apache.spark.sql.SparkSession, outDir: String,
      minDf: Long = 10, cap: Int = 20): DataFrame =
    spark.read.parquet(s"$outDir/deltas")
      .groupBy(col("token"))
      .agg(sum(col("df")).as("df"),
        graft.functions.BoundedHead.head(cap)(slice(col("postings"), 1, cap))
          .as("postings"))
      .filter(col("df") >= minDf)

  final case class QuotaState(keep: Seq[(String, Long)], version: Long)
  final case class QuotaOut(stratum: String, version: Long, doc_ids: Seq[Long])

  /** s12 — streaming stratified quota sampler (streaming twin of batch
    * q52): per-stratum state holds the n smallest (md5(id), id) pairs
    * seen so far — the SAME selection rule as Sampling.quotaPerGroup, so
    * once the stream drains, the final sample per stratum equals the
    * batch quota sample EXACTLY regardless of how ingest was batched
    * (ScalaTest-asserted against q52). Arrival order cannot affect the
    * fixpoint: the n smallest of a set is order-free.
    *
    * State is bounded at n entries per stratum BY CONSTRUCTION — the
    * BoundedHead principle applied to streaming state: a 100 TB ingest
    * history costs the same state as the first megabyte. Update mode:
    * a batch that changes a stratum's sample re-emits that stratum's
    * current selection under an incremented version; max version per
    * stratum = the current sample (consumers upsert on stratum). */
  def quotaSampleStream(docs: Dataset[(Long, String)], n: Int): Dataset[QuotaOut] = {
    import docs.sparkSession.implicits._
    require(n > 0)
    docs.groupByKey(_._2)
      .flatMapGroupsWithState[QuotaState, QuotaOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (stratum: String, rows: Iterator[(Long, String)],
            state: GroupState[QuotaState]) =>
          val cur = state.getOption.getOrElse(QuotaState(Vector.empty, 0L))
          // same key as Sampling.quotaPerGroup's ORDER BY: (md5(id), id)
          val incoming = rows.map { case (id, _) => (md5Hex(id.toString), id) }
          val merged = (cur.keep ++ incoming).distinct.sorted.take(n)
          if (merged == cur.keep) Iterator.empty
          else {
            val next = QuotaState(merged, cur.version + 1)
            state.update(next)
            Iterator.single(QuotaOut(stratum, next.version, merged.map(_._2)))
          }
      }
  }

  /** Hex md5 matching Spark's md5() / DuckDB's md5() exactly. */
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** s06 — streaming corpus router: per-microbatch quality features plus
    * the deterministic content-hash split (the streaming twin of q58 —
    * same TextOps.contentSplitHash expression), fanned out to one parquet
    * sink per split via foreachBatch.
    *
    * foreachBatch is the idiomatic multi-sink shape: the batch is
    * computed once (cached) and each split writes to its own directory.
    * Exactly-once on replay: every write lands in a `_batch=<id>`
    * partition with DYNAMIC partition overwrite, so a micro-batch that
    * reruns after a mid-write failure overwrites its own partition
    * instead of appending duplicates. State is zero — routing is a pure
    * per-row function — so this scales with sink throughput alone. */
  def splitRouter(docs: DataFrame, outDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    docs.writeStream
      .option("checkpointLocation", s"$outDir/_ckpt")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val routed = graft.operators.CorpusOps.withSplit(
          batch.withColumn("n_tokens", size(split(col("text"), " ")).cast("bigint")),
          "text")
          .persist()
        try Seq("train", "val", "test").foreach { sp =>
          routed.filter(col("split") === sp).drop("split")
            .withColumn("_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch")
            .parquet(s"$outDir/$sp")
        } finally { routed.unpersist(); () }
      }
      .start()
  }

  /** s15 — streaming incremental near-dup admission (wave 5; streaming
    * twin of batch q100): every micro-batch of incoming documents (a)
    * computes its LSH bands with the SAME CorpusOps.minhashBands kernel
    * the batch path uses, (b) probes the standing band index — the
    * pre-built corpus index plus every previously ingested batch's delta
    * — for candidate pairs, and (c) appends its own bands as a new
    * `_batch` delta, so later batches dedup against it. This closes the
    * q100 loop operationally: the full-corpus pairing runs once,
    * after which THIS is the only dedup work ingest ever does; the band
    * index is maintained exactly like s11's posting deltas (LSM parquet
    * segments, compacted by Io.compact in a background OPTIMIZE).
    *
    * Exactly-once on replay: both the delta write and the pair write are
    * `_batch`-partitioned dynamic overwrites (the s06 contract); a
    * replayed batch that already appended its bands re-probes an index
    * that includes its own rows — identical rows, removed by the pair
    * DISTINCT — and overwrites its own output partition. Each unordered
    * pair is emitted exactly once (by the batch of its later-arriving
    * endpoint). Zero streaming state: all cross-batch memory lives in
    * the index directory.
    *
    * Stop-shingle contract: the cap is a CORPUS-level parameter; a batch
    * on its own sees only batch-local frequencies. Production publishes
    * the stop list from the standing corpus (alongside the index) via
    * CorpusOps.stopShingleSet and passes it as `stopShingles` — each
    * batch then anti-joins the list, applying exactly the corpus cap
    * (the batch-local `stopCap` filter is disabled whenever a list is
    * supplied — CorpusOps.shinglePostings' contract — so the published
    * cap can't silently tighten under a smaller local default). The list
    * is MATERIALIZED once here, before start(): a foreachBatch closure
    * re-evaluates every captured DataFrame per micro-batch, which would
    * re-run the full corpus stop-list aggregation on every batch and
    * erode the "zero per-batch corpus work" property this op exists
    * for. Without a published list the batch-local cap is the best
    * available approximation. */
  def incrementalDedupStream(docs: DataFrame, indexDir: String, outDir: String,
      shingleN: Int = 5, stopCap: Int = 1000, k: Int = 8, bands: Int = 2,
      stopShingles: Option[DataFrame] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // pinned: the published stop-shingle relation is consumed by every
    // micro-batch for the query's lifetime, not one batch
    val publishedStop = stopShingles.map(graft.sources.Io.materializePinned)
    docs.writeStream
      .option("checkpointLocation", s"$outDir/_ckpt")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val mine = graft.operators.CorpusOps
          .minhashBands(batch, "doc_id", "text", shingleN, stopCap, k, bands,
            publishedStop)
          .withColumn("_batch", lit(batchId))
          .persist()
        try {
          mine.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch").parquet(indexDir)
          val standing = s.read.parquet(indexDir)
          mine.select(col("band"), col("bh"), col("doc_id").as("new_id"))
            .join(standing.select(col("band"), col("bh"), col("doc_id")),
              Seq("band", "bh"))
            .filter(col("doc_id") =!= col("new_id"))
            .select(least(col("new_id"), col("doc_id")).as("doc1"),
              greatest(col("new_id"), col("doc_id")).as("doc2"))
            .distinct()
            .withColumn("_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch").parquet(s"$outDir/pairs")
        } finally { mine.unpersist(); () }
        ()
      }
      .start()
  }

  final case class KmvState(heads: Vector[Long], version: Long)
  final case class KmvOut(source: String, version: Long, n_heads: Int,
      est: Double)

  /** s16 — streaming KMV cardinality maintenance (wave 5; streaming twin
    * of batch q109's sketch side): per-source state is the k smallest
    * distinct md5-60bit token hashes seen so far — BoundedHead's merge
    * rule as streaming state, bounded at k longs per source BY
    * CONSTRUCTION no matter the ingest history. The drained estimate
    * equals the batch sketch exactly (the k-smallest of a set is
    * order-free, the same fixpoint argument as s12), so per-source
    * vocabulary cardinality stays continuously fresh for mixture
    * dashboards without ever recounting the corpus.
    *
    * Input rows are (source, token-hash) pairs — the map-only projection
    * runs on the stream before grouping, so state updates are a sorted
    * merge of longs, never strings. Update mode with versions: max
    * version per source = the current sketch (s10/s12 contract). */
  def kmvStream(hashes: Dataset[(String, Long)], k: Int): Dataset[KmvOut] = {
    import hashes.sparkSession.implicits._
    require(k > 1)
    val space = 1.152921504606846976e18 // 2^60
    hashes.groupByKey(_._1)
      .flatMapGroupsWithState[KmvState, KmvOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (source: String, rows: Iterator[(String, Long)],
            state: GroupState[KmvState]) =>
          val cur = state.getOption.getOrElse(KmvState(Vector.empty, 0L))
          val merged = (cur.heads ++ rows.map(_._2)).distinct.sorted.take(k)
          if (merged == cur.heads) Iterator.empty
          else {
            val next = KmvState(merged, cur.version + 1)
            state.update(next)
            val est =
              if (merged.length < k) merged.length.toDouble
              else (k - 1).toDouble * space / merged.last
            // BigDecimal HALF_UP — the same rounding Spark's round() applies
            // in batch q109, so the drained sketch compares exactly
            Iterator.single(KmvOut(source, next.version, merged.length,
              BigDecimal(est).setScale(2, BigDecimal.RoundingMode.HALF_UP)
                .toDouble))
          }
      }
  }

  final case class FunnelState(signup: Option[Long], purchases: Vector[Long],
      version: Long)
  final case class FunnelOut(user_id: Long, version: Long, signup_us: Long,
      first_purchase_us: Option[Long], converted_7d: Boolean)

  /** s14 — streaming conversion funnel (wave 5; streaming twin of batch
    * q93): per user, the earliest signup and the earliest purchase at or
    * after it, maintained incrementally. The drained fixpoint equals the
    * batch query on the same events REGARDLESS of ingest batching or
    * arrival order (ScalaTest-asserted against q93), because state keeps
    * exactly what out-of-order arrival can still change: the anchor only
    * ever moves EARLIER, so a purchase already above the current answer
    * can never become the answer (the answer only moves earlier too) and
    * is dropped; purchases at or below the answer are retained in case a
    * still-earlier signup arrives and re-qualifies them.
    *
    * State per user is therefore (anchor, purchases ≤ current answer) —
    * bounded by purchase frequency × how late a signup may arrive; a
    * production deployment bounds the retained window with the same
    * allowed-lateness contract the s01 watermark encodes (drop retained
    * purchases older than anchor − lateness once the anchor is
    * watermark-final; the fixture test drains everything, lateness = ∞).
    * Update mode with a per-user version: a batch that changes the
    * visible (signup, first-purchase) tuple re-emits it; max version per
    * user = current truth (the s10/s12 upsert contract). Users with
    * purchases but no signup yet hold state and emit nothing — q93's
    * anchor semantics. */
  def funnelStream(events: Dataset[(Long, Long, String)],
      convertWithinUs: Long = 604800000000L): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    def answerOf(st: FunnelState): Option[Long] =
      st.signup.flatMap(s => st.purchases.find(_ >= s))
    def visible(st: FunnelState): Option[(Long, Option[Long])] =
      st.signup.map(s => (s, answerOf(st)))
    events.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, String)],
            state: GroupState[FunnelState]) =>
          val cur = state.getOption.getOrElse(FunnelState(None, Vector.empty, 0L))
          var signup = cur.signup
          var purch = cur.purchases
          rows.foreach {
            case (_, ts, "signup") =>
              if (signup.forall(ts < _)) signup = Some(ts)
            case (_, ts, "purchase") => purch = purch :+ ts
            case _ => ()
          }
          val sorted = purch.distinct.sorted
          val pruned = FunnelState(signup, signup.flatMap(s =>
            sorted.find(_ >= s)) match {
            case Some(a) => sorted.takeWhile(_ <= a)
            case None => sorted
          }, cur.version + 1)
          state.update(pruned)
          if (visible(pruned) == visible(cur)) Iterator.empty
          else visible(pruned) match {
            case Some((s, ans)) => Iterator.single(FunnelOut(user,
              pruned.version, s, ans, ans.exists(_ - s <= convertWithinUs)))
            case None => Iterator.empty
          }
      }
  }

  /** s18 — streaming hot-key monitor (round 7): a running Misra–Gries
    * frequent-items summary over a token stream, the streaming twin of
    * q123's candidate pass. State is ONE m-entry aggregation buffer
    * (graft.functions.MisraGries — the same mergeable summary, so the
    * per-batch partial merges under the Agarwal rule), BOUNDED AT m BY
    * CONSTRUCTION no matter how much history streams through — this is
    * the aggregate for "which keys are hot right now" when the key space
    * is unbounded and a per-key count would grow state forever.
    * Complete-mode snapshot carries the q123 guarantee at every cut: any
    * key whose share of the stream-so-far exceeds 1/(m+1) is in the map
    * (ScalaTest asserts the superset against batch exact counts). */
  def heavyHittersStream(docs: DataFrame, textCol: String, m: Int): DataFrame =
    docs
      .select(explode(split(col(textCol), " ")).as("token"))
      .agg(graft.functions.MisraGries(m)(col("token")).as("mg"))

  /** s19 — streaming distribution-drift monitor (round 7 wave 8): per
    * closed tumbling window, the event-value distribution is histogrammed
    * onto [[DriftBuckets]] fixed buckets and scored against a REFERENCE
    * distribution with PSI (population stability index,
    * Σ (p−r)·ln(p/r) — the standard model-monitoring drift score; > 0.2
    * is the conventional "significant shift" alarm). This is the input-
    * drift gate a deployed scoring/curation pipeline runs next to s09:
    * when the live feature distribution walks away from the training
    * reference, downstream model scores stop being trustworthy BEFORE
    * accuracy metrics can catch it.
    *
    * `ref` is the training-time bucket distribution (DriftBuckets
    * proportions, a driver-side constant — the deployment artifact a
    * monitor ships with, a few doubles, not a stream-side relation).
    *
    * Scale/state: ONE stateful windowed aggregate whose per-window state
    * is DriftBuckets+1 longs (conditional counts partial-combine
    * map-side); the PSI arithmetic is a stateless projection on the
    * window-sized output. Laplace-style smoothing ((c+0.5)/(n+B/2),
    * ref clamped to 1e-4) keeps empty buckets finite on both sides.
    * Watermark closes windows and bounds state to the open-window set. */
  val DriftBuckets = 8
  val DriftBucketWidth = 64.0
  def driftMonitor(events: DataFrame, ref: Seq[Double]): DataFrame = {
    require(ref.length == DriftBuckets,
      s"reference must have $DriftBuckets buckets, got ${ref.length}")
    val bucket = least(lit(DriftBuckets - 1),
      greatest(lit(0), floor(col("value") / DriftBucketWidth))).cast("int")
    val counts = (0 until DriftBuckets).map(i =>
      sum(when(col("bucket") === i, 1L).otherwise(0L)).as(s"c$i"))
    val aggs = count(lit(1)).as("n") +: counts
    val windowed = events
      .withWatermark("ts", "10 minutes")
      .withColumn("bucket", bucket)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(aggs.head, aggs.tail: _*)
    val psi = (0 until DriftBuckets).map { i =>
      val p = (col(s"c$i") + 0.5) / (col("n") + DriftBuckets * 0.5)
      val r = math.max(ref(i), 1e-4)
      (p - r) * log(p / r)
    }.reduce(_ + _)
    windowed.select(col("window.start").as("win_start"), col("n"),
      round(psi, 6).as("psi"), (psi > 0.2).as("drifted"))
  }

  /** s20 — streaming windowed-percentile monitor (round 7 wave 10): per
    * closed tumbling window, p50/p90/p99 of the event value estimated
    * from the q137 histogram sketch — the latency/value-percentile
    * panel every deployed pipeline watches, computed the only way a
    * stream can afford: per-window state is [[PctBuckets]]+1 longs of
    * bucket counts (vector-addition mergeable, partial-combines
    * map-side), never a value buffer; the interpolation is a stateless
    * projection on the closed window. Exact per-window percentiles
    * would buffer every value in state — the sketch is the operator.
    *
    * The estimate formula is LITERALLY q137's (crossing bucket from the
    * running count, linear interpolation from the exclusive prefix), so
    * the batch query proves the estimator's error bound and the stream
    * inherits it; StreamingSpec additionally matches a closed window's
    * output against a driver-side recomputation value-for-value. */
  val PctBuckets = 64
  val PctWidth = 8.0
  def percentilesStream(events: DataFrame): DataFrame = {
    val bucket = least(lit(PctBuckets - 1),
      greatest(lit(0), floor(col("value") / PctWidth))).cast("int")
    val aggs = count(lit(1)).as("n") +: (0 until PctBuckets).map(i =>
      sum(when(col("bucket") === i, 1L).otherwise(0L)).as(s"c$i"))
    val windowed = events
      .withWatermark("ts", "10 minutes")
      .withColumn("bucket", bucket)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(aggs.head, aggs.tail: _*)
    // q137's estimator, unrolled per bucket as a coalesce chain over
    // PRE-COMPUTED running counts (one prefix-sum column set shared by
    // all three percentiles): the first bucket whose running count
    // crosses p·n interpolates from its exclusive prefix
    val withCum = windowed.select(col("*") +: (0 until PctBuckets).map(b =>
      (0 to b).map(i => col(s"c$i")).reduce(_ + _).as(s"cum$b")): _*)
    def estimate(p: Double) = coalesce((0 until PctBuckets).map { b =>
      when(col(s"cum$b") >= col("n") * p && col(s"c$b") > 0,
        round(lit(b * PctWidth)
          + lit(PctWidth) * (col("n") * p - (col(s"cum$b") - col(s"c$b")))
            / col(s"c$b"), 6))
    }: _*)
    withCum.select(col("window.start").as("win_start"), col("n"),
      estimate(0.50).as("p50"), estimate(0.90).as("p90"),
      estimate(0.99).as("p99"))
  }

  /** s21 — streaming table-checksum maintenance (round 7 wave 12): the
    * q145 fingerprints (row count, bit-XOR and exact-decimal sum of
    * per-row hashes) maintained continuously over an append stream —
    * the replication/CDC validation monitor that can certify a mirror
    * WITHOUT ever re-scanning it: both combiners are commutative/
    * associative, so the state is 3 numbers regardless of history and
    * every complete-mode snapshot equals the batch checksum of
    * everything ingested so far (StreamingSpec asserts equality against
    * q145's aggregate on the same prefix, under arbitrary slicing).
    * Expects the caller to derive the canonical per-row hash `h` the
    * same way as q145 (Wave12Queries.lineitemCanon — NULL-sentinel
    * field encoding per graft.functions.Canon), which keeps the
    * batch/stream encodings identical by construction. Output mirrors
    * q145's fixed-width-string fingerprint contract verbatim (16-digit
    * lowercase hex xor, 39-digit zero-padded decimal sum). */
  def checksumStream(hashed: DataFrame): DataFrame =
    hashed.agg(count(lit(1)).as("n_rows"),
      expr("bit_xor(h)").as("_xor"),
      sum(col("h").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        .as("_sum"))
      .select(col("n_rows"),
        lower(lpad(hex(col("_xor")), 16, "0")).as("xor_fp"),
        lpad(col("_sum").cast("string"), 39, "0").as("sum_fp"))

  /** s23 — streaming calibration monitor (round-8 wave 16; the windowed
    * sibling of batch q158): per closed tumbling window and confidence
    * decile, the reliability row (n, mean confidence, observed rate,
    * gap) plus the bucket Brier score. This is the monitor a deployed
    * model-scored filter (s09's consumer) runs continuously: a decile
    * drifting off the diagonal means the model's confidence stopped
    * meaning what it meant at training time — visible per window,
    * before downstream yield shifts would reveal it.
    *
    * The confidence is the event's value mapped onto the milli grid
    * (value·2 clamped to [0,999] — the fixture's value domain is
    * [0,512)); the outcome is drawn at probability p from the event id's
    * md5 (the q158 synthetic-truth convention, so ground truth is known
    * and every field is assertable). A production deployment replaces
    * both lines with its real score/outcome columns; the windowed
    * arithmetic — integer (p_milli − 1000y)² partials, one division per
    * output field — is the operator.
    *
    * Scale/state: per (window, decile) the state is 4 longs (count and
    * three sums, all vector-addition mergeable, partial-combined
    * map-side) — ≤ 10 rows per open window regardless of event volume;
    * the watermark closes windows and bounds the open set. Append mode:
    * each (window, decile) row emits exactly once (FileStreamSink
    * crash-replay contract, StreamingSpec-injected). */
  def calibrationStream(events: DataFrame): DataFrame = {
    val pm = least(lit(999L), greatest(lit(0L),
      (col("value") * 2).cast("long")))
    val y = when(pmod(graft.functions.TextOps.shingleHash60(
      col("event_id").cast("string")), lit(1000)) < col("p_milli"), 1L)
      .otherwise(0L)
    events
      .withWatermark("ts", "10 minutes")
      .withColumn("p_milli", pm)
      .withColumn("y", y)
      .withColumn("bucket", (col("p_milli") / 100).cast("int"))
      .groupBy(window(col("ts"), "1 hour"), col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("p_milli")).as("sp"),
        sum(col("y")).as("sy"),
        sum((col("p_milli") - col("y") * 1000L)
          * (col("p_milli") - col("y") * 1000L)).as("sq"))
      .select(col("window.start").as("win_start"), col("bucket"), col("n"),
        round(col("sp") / (col("n") * 1000.0), 6).as("mean_p"),
        round(col("sy") / col("n"), 6).as("obs_rate"),
        round(col("sp") / (col("n") * 1000.0) - col("sy") / col("n"), 6)
          .as("gap"),
        round(col("sq") / (col("n") * 1000000.0), 6).as("brier"))
  }

  final case class CapEvent(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String, value: Double)
  final case class CapAdmit(user_id: Long, event_id: Long, event_type: String,
      value: Double, seq: Int)

  /** s22 — streaming user-level contribution cap (round-8 wave 14;
    * streaming twin of batch q153): admit each user's first `cap` events
    * and drop the rest, maintained incrementally so a scoring/aggregation
    * pipeline downstream consumes an already-sensitivity-bounded stream.
    * State per user is ONE integer (admitted-so-far) — bounded by
    * construction regardless of ingest history, the cheapest state in
    * the streaming family — and once a user saturates, its state never
    * changes again (a production deployment can expire saturated users
    * onto a bloom filter; the fixture test drains everything).
    *
    * Admission order: within a micro-batch, (ts_us, event_id) — the
    * batch twin's sort key — so the drained admitted SET equals q153's
    * kept set exactly whenever ingestion batches respect event-time
    * order (the replayable-log deployment; StreamingSpec asserts
    * equality under arbitrary time-ordered slicing). Under out-of-order
    * arrival the rule degrades to first-C-by-arrival — the only
    * retraction-free semantics a stream can offer, and the standard one
    * (a DP budget, once spent on an event, is spent).
    *
    * Each admitted event is emitted exactly once, stamped with its
    * admission sequence number; a crash-replayed batch reloads the
    * pre-batch counter and re-emits byte-identical admissions
    * (StreamingSpec injects the crash). Update mode, like the rest of
    * the flatMapGroupsWithState family.
    *
    * Executor memory per group is O(cap), NOT O(group size): the
    * smallest `cap - admitted` events by (ts_us, event_id) are selected
    * with a bounded max-heap while the group's iterator streams past —
    * a bot user contributing a million events in one micro-batch (the
    * exact adversary this operator exists to bound) costs the heap only
    * `cap` slots, never a group-sized materialization. */
  def contributionCapStream(events: Dataset[CapEvent], cap: Int)
      : Dataset[CapAdmit] = {
    import events.sparkSession.implicits._
    require(cap > 0)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Int, CapAdmit](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[CapEvent], state: GroupState[Int]) =>
          val admitted = state.getOption.getOrElse(0)
          if (admitted >= cap) Iterator.empty
          else {
            val need = cap - admitted
            // bounded selection: max-heap of the `need` smallest seen
            val heap = scala.collection.mutable.PriorityQueue
              .empty[CapEvent](Ordering.by(e => (e.ts_us, e.event_id)))
            rows.foreach { e =>
              if (heap.size < need) heap.enqueue(e)
              else {
                val top = heap.head
                if (Ordering.Tuple2[Long, Long].lt(
                    (e.ts_us, e.event_id), (top.ts_us, top.event_id))) {
                  heap.dequeue(); heap.enqueue(e)
                }
              }
            }
            // dequeueAll yields largest-first; reverse = admission order
            val take = heap.dequeueAll.reverse
            state.update(admitted + take.length)
            take.iterator.zipWithIndex.map { case (e, i) =>
              CapAdmit(user, e.event_id, e.event_type, e.value,
                admitted + i + 1)
            }
          }
      }
  }

  /** s24 — streaming IVF cell assignment (round-9; streaming twin of
    * batch q37's index build): every arriving embedding is assigned to
    * its nearest codebook centroid map-only, emitting (vec_id, cid,
    * csim) — the ingest-time half of an ANN index. Batch builds the
    * codebook and the standing index once (q37/q102); after that THIS is
    * the only per-vector work ingest ever does, and the assigned stream
    * lands directly in the index's cell layout (partitionBy(cid) at the
    * sink), ready for q94-style in-cell probes.
    *
    * ZERO streaming state (the s06 pattern): assignment is a stateless
    * projection through VectorOps.assignCells — the STREAMING shape of
    * the shared assignment semantics (append mode cannot run the batch
    * path's max aggregate, so the codebook collapses to one broadcast
    * array row here; the batch q37/q94/q173 path is the relation-based
    * VectorOps.assignCellsRelation with no single-row ceiling — the
    * Wave29 assignResiduals/assignResidualsServing split). The two
    * shapes share the (round(cosine,6), -cid) argmax contract and
    * VectorSpec pins them row-for-row equal, so stream and batch cannot
    * disagree (StreamingSpec additionally asserts drained-fixture
    * equality against q37's batch assignment and an independent
    * driver-side argmax replay). The 1-row array bounds Bc at ~2^21
    * cells (Dim 64, 2 GB row limit) — past the 2^20 IvfCap, so the
    * stream twin has headroom over the whole supported cell range. The
    * codebook joins stream-static as one broadcast row; it is
    * MATERIALIZED here, before the stream starts, because Structured
    * Streaming re-evaluates the static side every micro-batch — an
    * unmaterialized aggregate would re-reduce the codebook relation per
    * batch (the s15 published-stop-list discipline).
    *
    * Append mode, exactly-once to a file sink via the sink's metadata
    * log (crash-replay injected in StreamingSpec). At 4096 centroids ×
    * any ingest rate the per-row cost is B fused cosine kernels — the
    * same arithmetic the batch assigner pays, amortized to ingest. */
  def ivfAssignStream(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    val centsArr = graft.sources.Io.materializePinned(
      graft.operators.VectorOps.centroidArray(centroids))
    graft.operators.VectorOps.assignCells(vectors, centsArr)
      .select(col("vec_id"), col("cid"), col("csim"))
  }

  /** s25 — streaming deletion-tombstone filter (streaming twin of the
    * q162 right-to-be-forgotten cascade): drop every arriving event
    * whose user is on the standing tombstone list, so an erased user
    * stops flowing into downstream features the moment the list is
    * published — the batch cascade (q162) rewrites history, this gate
    * guards the present. Map-only: a stream-static LEFT ANTI equi-join
    * against the materialized tombstone relation, zero streaming state
    * (the s06/s24 pattern).
    *
    * The list is MATERIALIZED once before start(): streaming
    * re-evaluates the static side every micro-batch, and an
    * unmaterialized deletion query would re-run its derivation per
    * batch (the s15 published-stop-list discipline). Production swaps
    * the list by restarting the query on the newly published snapshot —
    * deletion lists version like the q148 snapshots they are diffed by.
    *
    * Append mode, exactly-once to a file sink via the sink's metadata
    * log (crash-replay injected in StreamingSpec). At any ingest rate
    * the per-row cost is one hash probe against the broadcast list;
    * once a tombstone list outgrows a broadcast, the same anti-join
    * rides a bloom-pruned shuffle (q90's operator) with no API change. */
  def tombstoneFilterStream(events: DataFrame, tombstones: DataFrame)
      : DataFrame = {
    val dead = graft.sources.Io.materializePinned(
      tombstones.select(col("user_id")).distinct())
    events.join(broadcast(dead), Seq("user_id"), "left_anti")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
  }

  /** s26 — streaming blocklist gate (streaming twin of batch q175): every
    * arriving document is scored against the hash-sampled denylist with
    * the SAME kernel the batch audit uses (TextOps.blockedTokens — the
    * equivalence test depends on bit-identity); documents with >= 1
    * blocked token route to a `quarantined` sink carrying their blocked
    * count, the rest to `clean`. This is the ingest-time enforcement of
    * the policy q175 prices: the audit says what a list would cost, the
    * gate is the list running.
    *
    * Stateless — the verdict is per-row (a higher-order filter over the
    * token array, codegen-composed; no explode, no state store, no
    * watermark), so throughput scales with tasks like s06/s25.
    * foreachBatch because the routing is two sinks; exactly-once on
    * replay via the s06 `_batch` dynamic-partition-overwrite contract
    * (crash-replay injected in StreamingSpec). */
  def blocklistGateStream(docs: DataFrame, outDir: String, mod: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    docs.writeStream
      .option("checkpointLocation", s"$outDir/_ckpt")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val routed = batch
          .withColumn("n_blocked",
            size(graft.functions.TextOps.blockedTokens(col("text"), mod))
              .cast("bigint"))
          .withColumn("_batch", lit(batchId))
          .persist()
        try {
          routed.filter(col("n_blocked") === 0).drop("n_blocked")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch").parquet(s"$outDir/clean")
          routed.filter(col("n_blocked") > 0)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch").parquet(s"$outDir/quarantined")
        } finally { routed.unpersist(); () }
      }
      .start()
  }

  final case class DecayEvent(event_type: String, ts_us: Long)
  final case class DecayState(refDay: Long, mass: Long, n: Long)
  final case class DecayOut(event_type: String, ref_day: Long, n_events: Long,
      mass: Long, decayed_n: Double)

  /** Scale bits for s27 — q177's DecayScaleBits convention (weights are
    * exact powers of two at 2^40 scale). */
  val DecayBits = 40

  /** s27 — streaming decay-weighted counts (round-10; the incremental
    * twin of batch q177's freshness profile): per event type, maintain
    * the exponentially decayed event count at a given half-life, with
    * EXACT integer arithmetic — weights are powers of two on an absolute
    * half-life day grid (day = ts_us DIV halfLife), so advancing the
    * reference day is ONE right-shift of the accumulated mass and every
    * arrival adds 2^(40 − age). This absolute grid is what makes decay
    * streamable at all: q177 ages events relative to the corpus max
    * timestamp, which moves with every arrival — a stream cannot
    * reweight history by arbitrary factors, but it CAN shift by powers
    * of two, which is exactly what a day-grid half-life is. Same
    * recency-weighting dial, retraction-free.
    *
    * Determinism: the drained mass is order- and slicing-independent —
    * each event's final contribution is 2^(40 − (maxDay − day)) no
    * matter when it arrived (shift-then-add telescopes exactly), which
    * StreamingSpec asserts against a driver-side replay under arbitrary
    * slicing and crash-replay. Truncation contract: shifts compose
    * exactly (m >>> a >>> b == m >>> (a+b)), so the mass after any gap
    * is independent of how micro-batches slice it; a single event older
    * than [[DecayBits]] half-lives at the current reference has decayed
    * off the 40-bit scale and contributes 0, though ACCUMULATED
    * same-day mass (k events = k·2^w) floors as a sum, so a residue
    * carry of up to log2(k) extra half-lives can survive — identically
    * under every slicing (batch q177 floors the same event at one ulp;
    * the fixtures never reach that horizon). Exactness
    * envelope: mass < 2^63 bounds same-day arrivals per key to ~2^23,
    * the batch operator's own BIGINT envelope.
    *
    * Scale/state: per event type the state is THREE longs (reference
    * day, mass, count) — constant regardless of history; output is one
    * updated row per key per micro-batch (Update mode). */
  def decayedCountsStream(events: Dataset[DecayEvent], halfLifeDays: Int)
      : Dataset[DecayOut] = {
    import events.sparkSession.implicits._
    require(halfLifeDays > 0)
    val per = halfLifeDays.toLong * 86400000000L
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[DecayState, DecayOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[DecayEvent], state: GroupState[DecayState]) =>
          var st = state.getOption.getOrElse(DecayState(Long.MinValue, 0L, 0L))
          rows.foreach { e =>
            val d = Math.floorDiv(e.ts_us, per)
            if (st.n == 0L) st = DecayState(d, 0L, 0L)
            else if (d > st.refDay) {
              // >>> composes exactly (m >>> a >>> b == m >>> (a+b) for
              // a+b < 64), so slicing a gap across micro-batches lands on
              // the same mass as jumping it in one — the invariant the
              // scaladoc claims. Guard at 64 (where >>> wraps), NOT at
              // DecayBits: accumulated same-day mass can carry above
              // 2^DecayBits, and zeroing it at shift 41 while two shifts
              // of 20+21 kept a carry would break slicing-independence
              // (ADVICE r10).
              val shift = d - st.refDay
              val shifted = if (shift >= 64) 0L else st.mass >>> shift
              st = DecayState(d, shifted, st.n)
            }
            val age = st.refDay - d
            val w = if (age > DecayBits) 0L else 1L << (DecayBits - age)
            st = DecayState(st.refDay, st.mass + w, st.n + 1L)
          }
          state.update(st)
          val scale = (1L << DecayBits).toDouble
          Iterator.single(DecayOut(key, st.refDay, st.n, st.mass,
            BigDecimal(st.mass / scale)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
  }

  final case class MixDoc(doc_id: Long, source: String, n_tokens: Long)
  /** s28 state-schema version (the object-scaladoc convention's worked
    * template). History: v1 (r11) 3 fields; v2 (r12) +max_doc_id —
    * structural, caught by the state-store schema checker; v3 (r14)
    * +schema_v itself — structural. Bump on any same-shape semantic
    * reinterpretation; the restore guard in mixRouterStream fails loud
    * on mismatch. */
  private[streaming] val MixSchemaV = 3
  final case class MixState(schema_v: Int, admitted_docs: Long,
      admitted_tokens: Long, seen_docs: Long, max_doc_id: Long)
  final case class MixOut(doc_id: Long, source: String, admitted: Boolean,
      admitted_tokens_after: Long)

  /** s28 — streaming mixture/token-budget router (streaming twin of the
    * q95/q169 selection family): per source, admit documents in arrival
    * order until the source's TOKEN budget is consumed — the admission
    * step that turns a mixture design (per-source token budgets, e.g.
    * q169's temperature weights × a total budget) into an actual
    * admitted set while the corpus streams past. A document is admitted
    * iff the source's admitted-token total BEFORE it is still under
    * budget — the q69/q108 straddle rule (the doc that crosses the
    * boundary ships, then the gate closes), so a budget is never
    * under-filled by early termination.
    *
    * Equivalence contract: under TIME-ORDERED ingestion (doc_id
    * non-decreasing per source across micro-batches — the natural feed
    * order; within a micro-batch arrival interleave is repaired by a
    * per-group doc_id sort), the drained admitted set equals the batch
    * prefix rule — per source, admit while the running token sum
    * (cumulative, doc_id order) minus the doc's own tokens is < budget
    * — which StreamingSpec asserts against a window-cumsum batch twin,
    * plus crash-replay. Unlike s12's rank-quota sampler (order-free
    * fixpoint), first-fit budget admission is order-DEPENDENT by
    * nature; the contract scopes it to the feed order a router actually
    * sees.
    *
    * Scale/state: per source the state is FOUR longs (admitted docs,
    * admitted tokens, seen docs, max doc_id seen — the out-of-order
    * tripwire) — constant regardless of history; the
    * per-batch sort buffer is micro-batch-group-sized, never
    * history-sized. Sources absent from the budget map admit nothing
    * (deny-by-default). Output: one decision row per arriving doc
    * (Update mode; replays overwrite their own batch partition).
    *
    * Checkpoint compatibility: this op is the WORKED TEMPLATE for the
    * object-scaladoc state-versioning convention. Structural history:
    * v1 (r11, 3 fields) → v2 (r12, +max_doc_id) → v3 (r14, +schema_v);
    * each structural change makes old checkpoints unrestorable — the
    * restore fails with a state schema error, it does not silently
    * misread — and requires a fresh checkpoint dir + source replay (the
    * family's documented checkpoint-loss recovery path). The schema_v
    * field guards the OTHER failure class: a same-shape semantic
    * reinterpretation is rejected by the in-code version check instead
    * of being silently misread (ADVICE r12 / r13 verdict task 7). */
  def mixRouterStream(docs: Dataset[MixDoc], budgets: Map[String, Long])
      : Dataset[MixOut] = {
    import docs.sparkSession.implicits._
    require(budgets.values.forall(_ >= 0L), "budgets must be non-negative")
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[MixState, MixOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[MixDoc], state: GroupState[MixState]) =>
          val budget = budgets.getOrElse(src, 0L)
          var st = state.getOption.getOrElse(
            MixState(MixSchemaV, 0L, 0L, 0L, Long.MinValue))
          // semantic-version guard (object scaladoc convention): a
          // same-shape state written under a different meaning must not
          // be silently reinterpreted
          if (st.schema_v != MixSchemaV) throw new IllegalStateException(
            s"mixRouterStream: state schema_v ${st.schema_v} != $MixSchemaV —" +
              " restore from an incompatible checkpoint; start a fresh" +
              " checkpoint dir and replay the source")
          val sorted = rows.toSeq.sortBy(_.doc_id)
          // the equivalence contract REQUIRES doc_id non-decreasing per
          // source across micro-batches; a violating feed used to
          // silently diverge from the batch prefix rule — fail loudly
          // instead (ADVICE r11). State rolls back with the batch on
          // crash-replay, so replays never false-positive here.
          sorted.headOption.foreach { first =>
            if (first.doc_id < st.max_doc_id) throw new IllegalStateException(
              s"mixRouterStream: out-of-order feed for source '$src': " +
                s"doc_id ${first.doc_id} arrived after ${st.max_doc_id}")
          }
          val out = sorted.map { doc =>
            val admit = st.admitted_tokens < budget
            st =
              if (admit) MixState(MixSchemaV, st.admitted_docs + 1L,
                st.admitted_tokens + doc.n_tokens, st.seen_docs + 1L,
                math.max(st.max_doc_id, doc.doc_id))
              else st.copy(seen_docs = st.seen_docs + 1L,
                max_doc_id = math.max(st.max_doc_id, doc.doc_id))
            MixOut(doc.doc_id, src, admit, st.admitted_tokens)
          }
          state.update(st)
          out.iterator
      }
  }

  /** s29 — streaming PQ encoder: ingest-time product-quantization code
    * assignment through the SAME Wave24Queries.withCodes kernel as
    * q191's batch encode — zero streaming state (the s24 ivfAssign
    * pattern with PQ codes instead of IVF cells: the index's compressed
    * representation is computed AT INGEST, so the search tier never
    * re-reads raw vectors). The codebook is trained offline (q191's
    * exact-integer Lloyd) and travels as M·K·S literals; output is one
    * (vec_id, code_str) row per arriving vector, append-only. An empty
    * codebook (trainBooks on an empty corpus) encodes nothing — the
    * stream is the typed empty projection, mirroring q191/q192's
    * empty-model branch rather than indexing into absent books.
    * Determinism: drained codes equal the batch encode bit-for-bit
    * (ScalaTest-asserted) — same milli grid, same lowest-id tie-break. */
  def pqEncodeStream(vectors: DataFrame,
      books: IndexedSeq[Seq[(Long, IndexedSeq[Long])]]): DataFrame = {
    if (books.isEmpty)
      return vectors.select(col("vec_id"), lit("").as("code_str"))
        .filter(lit(false))
    graft.functions.MilliQuant.register(vectors.sparkSession)
    val milli = vectors.select(col("vec_id"),
      graft.functions.MilliQuant(col("embedding")).as("qv"))
    graft.operators.Wave24Queries.withCodes(milli, books)
      .select(col("vec_id"),
        concat_ws(",", expr("transform(codes, c -> CAST(c AS STRING))"))
          .as("code_str"))
  }

  final case class AdcTop(adc: Long, nbr: Long)
  final case class TopKState(top: Seq[AdcTop])
  final case class AdcHit(q_id: Long, nbr: Long, adc_dist: Long, rank: Int)

  /** s30 — streaming ADC search (the serving twin of batch q192):
    * arriving QUERY vectors are scored against the standing PQ-coded
    * corpus and each query's top-k lands in the sink. The ADC staging
    * is honest: each query row computes its own M·K subspace-distance
    * table ONCE in the stream-side projection (`qtab`, an array of M
    * code→distance maps built from the literal books), and every
    * (query, corpus-row) candidate costs exactly M map lookups + a
    * sum — no vector arithmetic touches the scan, the q192 contract
    * at ingest time.
    *
    * The coded corpus is encoded through the SAME withCodes kernel as
    * q191/s29 and MATERIALIZED before the stream starts (streaming
    * re-evaluates the static side per micro-batch — the s24/s15
    * discipline). Per-query state is a bounded top-k list (k rows,
    * (adc, nbr)-ordered with the q192 tie-break) maintained by
    * insertion, never a buffered group; a query's candidates all
    * arrive in its own micro-batch (static corpus), so each query
    * emits exactly once and crash-replay reloads the pre-batch state
    * and re-emits byte-identically (StreamingSpec injects it).
    *
    * Scale notes: the fixture plan broadcasts the coded corpus into
    * the batch's query crossJoin; at index scale the same operator
    * runs cell-partitioned with the micro-batch's queries broadcast
    * (the q203 orientation) — the per-row cost and the state bound
    * are unchanged. Determinism: drained top-k for the family's fixed
    * probe equals q192 bit-for-bit (ScalaTest-asserted). */
  def adcSearchStream(queries: DataFrame, corpus: DataFrame,
      books: IndexedSeq[Seq[(Long, IndexedSeq[Long])]],
      k: Int): Dataset[AdcHit] = {
    import queries.sparkSession.implicits._
    graft.functions.VecDist.register(queries.sparkSession)
    graft.functions.MilliQuant.register(queries.sparkSession)
    require(k > 0, s"k must be positive, got $k")
    // derive the empty-model result FROM the input (the ivfadcEncodeStream
    // pattern): emptyDataset is a BATCH relation, and returning it for a
    // streaming `queries` makes the caller's .writeStream throw
    // AnalysisException instead of running an empty stream (ADVICE r12)
    if (books.isEmpty)
      return queries.select(col("vec_id").as("q_id"), col("vec_id").as("nbr"),
        col("vec_id").as("adc_dist"), lit(0).as("rank"))
        .filter(lit(false)).as[AdcHit]
    val M = graft.operators.Wave24Queries.PqM
    val S = graft.operators.Wave24Queries.PqS
    val coded = graft.sources.Io.materializePinned(
      graft.operators.Wave24Queries.withCodes(
        corpus.select(col("vec_id"),
          graft.functions.MilliQuant(col("embedding")).as("qv")),
        books)
        .select(col("vec_id").as("nbr"), col("codes")))
    val staged = queries.select(col("vec_id").as("q_id"),
        graft.functions.MilliQuant(col("embedding")).as("qv"))
      .withColumn("qtab", array((0 until M).map { m =>
        val sv = slice(col("qv"), m * S + 1, S)
        map_from_arrays(typedLit(books(m).map(_._1)),
          array(books(m).map { case (_, cv) =>
            graft.functions.VecDist.l2sq(sv, typedLit(cv))
          }: _*))
      }: _*))
      .drop("qv")
    val adc = (0 until M).map { m =>
      element_at(element_at(col("qtab"), m + 1),
        element_at(col("codes"), m + 1))
    }.reduce(_ + _)
    staged.crossJoin(coded)
      .filter(col("nbr") =!= col("q_id"))
      .select(col("q_id"), col("nbr"), adc.as("adc"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[TopKState, AdcHit](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (qid: Long, rows: Iterator[(Long, Long, Long)],
            state: GroupState[TopKState]) =>
          // a query's candidates all arrive in its own micro-batch (the
          // corpus side is static), so existing state here means the SAME
          // q_id arrived in a second batch: the whole corpus would be
          // re-scored and already-present (adc, nbr) entries re-inserted,
          // silently emitting a top-k with duplicate neighbours. Fail
          // loudly instead (the s28 out-of-order discipline; ADVICE r12).
          // State rolls back with the batch on crash-replay, so replays
          // never false-positive here.
          if (state.exists) throw new IllegalStateException(
            s"adcSearchStream: q_id $qid arrived in a second micro-batch " +
              "— duplicate query feed")
          var top = state.getOption.map(_.top).getOrElse(Seq.empty)
          rows.foreach { case (_, nbr, adcD) =>
            val c = AdcTop(adcD, nbr)
            if (top.size < k || c.adc < top.last.adc
              || (c.adc == top.last.adc && c.nbr < top.last.nbr))
              top = (top :+ c).sortBy(t => (t.adc, t.nbr)).take(k)
          }
          state.update(TopKState(top))
          top.zipWithIndex.map { case (c, i) =>
            AdcHit(qid, c.nbr, c.adc, i + 1) }.iterator
      }
  }

  final case class TvdRow(grp: String, cat: String)
  final case class TvdState(counts: Map[String, Long])
  final case class TvdOut(grp: String, n_rows: Long, tvd_num: Long,
      tvd: Double)

  /** s31 — streaming t-closeness monitor (incremental twin of batch
    * q204): per quasi-identifier group, maintain the live sensitive-
    * category histogram and emit the total-variation distance against
    * a PUBLISHED reference distribution after every micro-batch — the
    * ingest-time disclosure tripwire (q204 audits a finished corpus;
    * this flags a group drifting toward one sensitive value while the
    * corpus is still arriving). The reference is a published constant
    * (the s15/s24 discipline): a stream cannot see the final global
    * distribution, so it monitors against the released one, exactly
    * like a production privacy gate.
    *
    * Determinism: identical integer numerators to q204 (cross-
    * multiplied |cnt·N − gcnt·k| with the closed-form absent-category
    * mass) and the same one-division HALF_UP round — the drained
    * per-group tvd equals the batch kernel on the same rows
    * bit-for-bit (ScalaTest-asserted), independent of slicing, plus
    * crash-replay.
    *
    * Scale/state: per group the state is its live category histogram
    * (bounded by |categories|, constant in history); output is one
    * row per touched group per micro-batch (Update mode). */
  def tvdMonitorStream(rows: Dataset[TvdRow],
      reference: Map[String, Long]): Dataset[TvdOut] = {
    import rows.sparkSession.implicits._
    require(reference.values.forall(_ >= 0L), "reference counts must be >= 0")
    val nTot = reference.values.sum
    rows.groupByKey(_.grp)
      .flatMapGroupsWithState[TvdState, TvdOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (grp: String, it: Iterator[TvdRow], state: GroupState[TvdState]) =>
          var counts = state.getOption.map(_.counts).getOrElse(Map.empty)
          it.foreach { r =>
            counts = counts.updated(r.cat, counts.getOrElse(r.cat, 0L) + 1L)
          }
          state.update(TvdState(counts))
          val k = counts.values.sum
          val present = counts.map { case (cat, c) =>
            math.abs(c * nTot - reference.getOrElse(cat, 0L) * k) }.sum
          val absent =
            (nTot - counts.keys.map(reference.getOrElse(_, 0L)).sum) * k
          val num = present + absent
          val tvd =
            if (k == 0L || nTot == 0L) 0.0
            else BigDecimal(num.toDouble / (2L * k * nTot).toDouble)
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          Iterator.single(TvdOut(grp, k, num, tvd))
      }
  }

  /** s32 — streaming IVFADC ingest encoder: every arriving vector is
    * coarse-assigned to its nearest cell and residual-PQ-encoded in ONE
    * map-only projection (Wave29Queries.assignResidualsServing — the
    * map-only twin of the batch build's min_by-join assignment, needed
    * because streaming append mode cannot aggregate — + the SAME
    * Wave24Queries.withCodes encoder; drained rows are ScalaTest-
    * asserted bit-identical to the batch build, so the streamed index
    * and the batch index can never disagree). This completes the
    * family's serving loop: s32 ingests into the IVFADC layout, q202
    * searches it, q203 audits it.
    *
    * ZERO streaming state (the s24/s29 pattern): the coarse codebook
    * arrives as a published model artifact (driver seq → one
    * materialized broadcast row — streaming re-evaluates the static
    * side per micro-batch, the s15 discipline) and the residual books
    * as M·K·S literals. Output (vec_id, cid, code_str) lands
    * append-only, ready for a partitionBy(cid) sink — the index's
    * cell layout at ingest time. */
  def ivfadcEncodeStream(vectors: DataFrame,
      cents: Seq[(Long, IndexedSeq[Long])],
      books: IndexedSeq[Seq[(Long, IndexedSeq[Long])]]): DataFrame = {
    if (books.isEmpty || cents.isEmpty)
      return vectors.select(col("vec_id"), col("vec_id").as("cid"),
        lit("").as("code_str")).filter(lit(false))
    val centsArr = graft.sources.Io.materializePinned(
      graft.operators.Wave29Queries.centroidArrayDf(
        vectors.sparkSession, cents))
    graft.functions.MilliQuant.register(vectors.sparkSession)
    val milli = vectors.select(col("vec_id"),
      graft.functions.MilliQuant(col("embedding")).as("qv"))
    graft.operators.Wave24Queries.withCodes(
      graft.operators.Wave29Queries.assignResidualsServing(milli, centsArr),
      books)
      .select(col("vec_id"), col("cid"),
        concat_ws(",", expr("transform(codes, c -> CAST(c AS STRING))"))
          .as("code_str"))
  }

  final case class FileRow(file_id: Long, ds: Long, ts: Timestamp)
  final case class FileStatsState(minDs: Long, maxDs: Long, n: Long,
      lastMs: Long)
  final case class FileStatsOut(file_id: Long, f_min: Long, f_max: Long,
      n_rows: Long)

  private val FileCloseMs = 30L * 60 * 1000

  /** s34 — streaming footer-stats publisher (round 13; the ingest half
    * of batch q214's zone-map audit): while a writer streams rows into
    * files, maintain each open file's min/max/count over the stats
    * column and PUBLISH the footer exactly once, when the file closes —
    * when the event-time watermark proves no row for it can still
    * arrive (30 event-time minutes past its last row, the s03
    * gap-close recipe). Zone-map skipping only works if footer stats
    * are exact over ALL of a file's rows, so the row must be final the
    * moment it is published — hence append mode + close-on-timeout,
    * not an update-mode running aggregate.
    *
    * State per open file: 4 longs — bounded by the number of files
    * being written concurrently, never by history. Contract: a writer
    * writes each file contiguously; a row arriving after its file
    * closed re-opens it and publishes a SECOND partial footer, which
    * downstream detects as a duplicate file_id (within-watermark
    * reordering is absorbed exactly — min/max/count are
    * order-insensitive). StreamingSpec asserts the drained footers
    * equal the batch per-file stats on the same rows. */
  def fileStatsStream(rows: Dataset[FileRow]): Dataset[FileStatsOut] = {
    import rows.sparkSession.implicits._
    rows.withWatermark("ts", "10 minutes")
      .groupByKey(_.file_id)
      .flatMapGroupsWithState[FileStatsState, FileStatsOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (fid: Long, it: Iterator[FileRow],
            state: GroupState[FileStatsState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(FileStatsOut(fid, s.minDs, s.maxDs, s.n))
          } else {
            var s = state.getOption.getOrElse(
              FileStatsState(Long.MaxValue, Long.MinValue, 0L, Long.MinValue))
            it.foreach { r =>
              s = FileStatsState(math.min(s.minDs, r.ds),
                math.max(s.maxDs, r.ds), s.n + 1,
                math.max(s.lastMs, r.ts.getTime))
            }
            state.update(s)
            // the natural close time can already be behind the watermark
            // (late batch) — clamp so the file closes on the next
            // watermark advance (the s03 clamp)
            state.setTimeoutTimestamp(math.max(s.lastMs + FileCloseMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** s35 state-schema version — the FIRST op born under the object-
    * scaladoc versioning convention (v1, r14). Bump on any same-shape
    * semantic reinterpretation of regs. */
  private[streaming] val HllSchemaV = 1
  final case class HllState(schema_v: Int, regs: Vector[Long], version: Long)
  final case class HllOut(grp: String, version: Long, est: Long,
      zeros: Long, max_rho: Long)

  /** s35 — streaming HyperLogLog register maintenance (streaming twin of
    * batch q221's sketch side): per-group state is the m = 64 HLL
    * registers — max(rho) per register over every key ever seen —
    * updated by the SAME md5-60 → (idx, rho) rule as the batch audit
    * (Wave43Queries.hllRegs; StreamingSpec asserts drained state equals
    * the batch register relation bit-for-bit, the s24 discipline).
    * Because max-merge is commutative/associative/idempotent, the
    * drained sketch equals the batch sketch regardless of batching,
    * replays included — the monotone-state family (s12/s16).
    *
    * State per group: m longs + the schema_v/version words, constant in
    * ingest history. Update mode with versions: a batch that changes
    * any register re-emits the group's current integer estimate (the
    * q221 scaled-integer estimator, identical literals) under an
    * incremented version; max version per group = current estimate. */
  def hllSketchStream(rows: Dataset[(String, Long)]): Dataset[HllOut] = {
    import rows.sparkSession.implicits._
    val m = graft.operators.Wave43Queries.HllM
    val wbits = graft.operators.Wave43Queries.HllWBits
    val estNum = graft.operators.Wave43Queries.EstNum
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[HllState, HllOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (grp: String, it: Iterator[(String, Long)],
            state: GroupState[HllState]) =>
          val cur = state.getOption.getOrElse(
            HllState(HllSchemaV, Vector.fill(m)(0L), 0L))
          if (cur.schema_v != HllSchemaV) throw new IllegalStateException(
            s"hllSketchStream: state schema_v ${cur.schema_v} != " +
              s"$HllSchemaV — restore from an incompatible checkpoint")
          val regs = cur.regs.toArray
          var changed = false
          it.foreach { case (_, key) =>
            val h = java.lang.Long.parseLong(
              md5Hex("hll:" + key.toString).substring(0, 15), 16)
            val idx = (h % m).toInt
            val hw = (h >>> graft.operators.Wave43Queries.HllB) % (1L << wbits)
            val rho =
              if (hw == 0) (wbits + 1).toLong
              else (wbits + 1).toLong - (64 - java.lang.Long.numberOfLeadingZeros(hw))
            if (rho > regs(idx)) { regs(idx) = rho; changed = true }
          }
          if (!changed) Iterator.empty
          else {
            val next = HllState(HllSchemaV, regs.toVector, cur.version + 1)
            state.update(next)
            val sAll = regs.map(r => 1L << (wbits + 1 - r)).sum
            Iterator.single(HllOut(grp, next.version,
              (estNum / sAll) / 1000000L,
              regs.count(_ == 0L).toLong,
              regs.max))
          }
      }
  }

  /** s36 state-schema version (v1, r14). Bump on any same-shape semantic
    * reinterpretation of the bitmap words. */
  private[streaming] val DelVecSchemaV = 1
  final case class DelVecState(schema_v: Int, bits: Vector[Long],
      version: Long)
  final case class DelVecOut(file_id: Long, version: Long, rows_del: Long)

  /** s36 — streaming deletion-vector maintainer (streaming twin of batch
    * q225's per-file deletion census): the ingest half of merge-on-read.
    * Deletes arrive as a stream of row keys; per FILE (key div
    * KeysPerFile, the q214/q225 layout convention) the state is the
    * deletion BITMAP itself — KeysPerFile bits packed into
    * ⌈KeysPerFile/64⌉ longs, exactly the position-delete vector a
    * Delta/Iceberg v2 writer persists. Bit-set is idempotent, so the
    * drained vector equals the batch census regardless of batching or
    * replays (the monotone-state family: s12/s16/s35); StreamingSpec
    * asserts the drained per-file counts equal a q225-rule driver
    * replay, plus crash-replay determinism under the versioned state.
    *
    * State per file: 4 longs + the schema_v/version words — constant in
    * delete history (the bitmap IS the state, not a key list). Update
    * mode with versions: a batch that sets any new bit re-emits the
    * file's deleted-row count under an incremented version; max version
    * per file = the current vector. A downstream rewrite planner joins
    * these counts against the static file census to apply the q225
    * threshold policy — the batch sheet prices the policy, this op
    * maintains its input. */
  def deletionVectorStream(deletes: Dataset[Long]): Dataset[DelVecOut] = {
    import deletes.sparkSession.implicits._
    val kpf = graft.operators.Wave47Queries.KeysPerFile
    val words = (kpf + 63) / 64
    // floorDiv/floorMod: the public Dataset[Long] input admits negative
    // keys, and Java's truncating % would produce a NEGATIVE bitmap
    // offset — an ArrayIndexOutOfBoundsException that kills the streaming
    // query mid-batch. Floor semantics keep (file, offset) consistent for
    // any key sign: key = fid*kpf + off with off in [0, kpf).
    deletes.groupByKey(k => Math.floorDiv(k, kpf))
      .flatMapGroupsWithState[DelVecState, DelVecOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (fid: Long, it: Iterator[Long], state: GroupState[DelVecState]) =>
          val cur = state.getOption.getOrElse(
            DelVecState(DelVecSchemaV, Vector.fill(words)(0L), 0L))
          if (cur.schema_v != DelVecSchemaV) throw new IllegalStateException(
            s"deletionVectorStream: state schema_v ${cur.schema_v} != " +
              s"$DelVecSchemaV — restore from an incompatible checkpoint")
          val bits = cur.bits.toArray
          var changed = false
          it.foreach { k =>
            val off = Math.floorMod(k, kpf).toInt
            val m = 1L << (off & 63)
            if ((bits(off >> 6) & m) == 0L) {
              bits(off >> 6) |= m; changed = true
            }
          }
          if (!changed) Iterator.empty
          else {
            val next = DelVecState(DelVecSchemaV, bits.toVector,
              cur.version + 1)
            state.update(next)
            Iterator.single(DelVecOut(fid, next.version,
              bits.map(w => java.lang.Long.bitCount(w).toLong).sum))
          }
      }
  }

  final case class CdcOut(doc_id: Long, bmod: Long, k: Long, l: Long)

  /** s37 — ingest-time content-defined chunking (streaming twin of batch
    * q226's chunk formation): every arriving document runs the SAME
    * native CdcChunks kernel as the batch curve — one md5 per token,
    * all three boundary moduli, packed rolling-hash chunk keys — and
    * emits its (bmod, chunk-key, len) rows. Stateless (chunk boundaries
    * are per-document facts), so drained rows equal the batch kernel's
    * output bit-for-bit under any batching; a downstream keyed count
    * (the s01 shape) or the standing dedup index (s15) turns them into
    * the live savings curve. StreamingSpec asserts stream ≡ batch. */
  /** s38 state-schema version (v1, r15). Bump on any same-shape semantic
    * reinterpretation of the click/pending buffers. */
  private[streaming] val AttrSchemaV = 1
  private[streaming] val AttrLookbackUs = 7L * 86400L * 1000000L
  final case class AttrState(schema_v: Int, clicks: Vector[Long],
      pending: Vector[(Long, Long, Double)]) // (p_tus, event_id, value)
  final case class AttrOut(user_id: Long, event_id: Long, p_tus: Long,
      first_click: Option[Long], last_click: Option[Long], value: Double)

  /** s38 — streaming first/last-touch attribution (streaming twin of
    * batch q231's per-purchase relation): per user, every PURCHASE is
    * attributed to the min (first-touch) and max (last-touch) CLICK
    * timestamp inside its 7-day lookback [p − L, p], the same RANGE
    * frame the batch window evaluates. A purchase must not emit the
    * moment it arrives — an on-time click with ts ≤ purchase ts can
    * still be in flight — so purchases PEND in state and emit exactly
    * once the watermark passes their timestamp (the s03/s34 discipline:
    * correctness comes from the watermark, not arrival order; drained
    * rows then equal the batch window under the final cut).
    *
    * State per user: the click-timestamp buffer pruned to the live
    * lookback horizon (clicks older than watermark − L can never matter
    * — any future on-time purchase sits past the watermark) plus the
    * pending purchases — both track the in-flight window, not history.
    * Versioned state (schema_v) per the r14 convention. Timestamps are
    * carried as exact epoch-MICROS (the batch q231 unit); the 1 ms
    * watermark/µs boundary is handled strictly (emit only when the
    * watermark is strictly past the purchase's millisecond, prune with
    * 1 ms slack) so sub-ms races can never split the two engines. */
  // object-level (not local defs inside attributionStream): the state
  // function must close over ONLY the serializable module, never the
  // enclosing method frame (which holds the input Dataset — "Task not
  // serializable" otherwise)
  private def attrTus(ts: Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  private def attrSettle(userId: Long, st: AttrState, wmMs: Long,
      state: GroupState[AttrState]): Iterator[AttrOut] = {
    val L = AttrLookbackUs
    val (due, still) = st.pending.partition(_._1 / 1000L < wmMs)
    val out = due.sortBy(p => (p._1, p._2)).map { case (pt, id, v) =>
      val in = st.clicks.filter(c => c >= pt - L && c <= pt)
      AttrOut(userId, id, pt,
        if (in.isEmpty) None else Some(in.min),
        if (in.isEmpty) None else Some(in.max), v)
    }
    val live = st.clicks.filter(_ >= wmMs * 1000L - L - 1000L)
    if (still.isEmpty && live.isEmpty) state.remove()
    else {
      state.update(AttrState(AttrSchemaV, live, still))
      val next =
        if (still.nonEmpty) still.map(_._1).min / 1000L + 1L
        else live.max / 1000L + L / 1000L + 1L
      state.setTimeoutTimestamp(math.max(next, wmMs + 1L))
    }
    out.iterator
  }

  def attributionStream(events: Dataset[Ev]): Dataset[AttrOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, AttrOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[AttrState]) =>
          val wm = state.getCurrentWatermarkMs()
          val cur = state.getOption.getOrElse(
            AttrState(AttrSchemaV, Vector.empty, Vector.empty))
          if (cur.schema_v != AttrSchemaV) throw new IllegalStateException(
            s"attributionStream: state schema_v ${cur.schema_v} != " +
              s"$AttrSchemaV — restore from an incompatible checkpoint")
          if (state.hasTimedOut) attrSettle(userId, cur, wm, state)
          else {
            var clicks = cur.clicks
            var pending = cur.pending
            evs.foreach { e =>
              val t = attrTus(e.ts)
              if (e.event_type == "click") clicks :+= t
              else if (e.event_type == "purchase")
                pending :+= ((t, e.event_id, e.value))
            }
            attrSettle(userId, AttrState(AttrSchemaV, clicks, pending), wm,
              state)
          }
      }
  }

  def cdcChunkStream(docs: Dataset[(Long, String)]): Dataset[CdcOut] = {
    import docs.sparkSession.implicits._
    graft.functions.CdcChunks.register(docs.sparkSession)
    docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(graft.functions.CdcChunks(col("text"))).as("c"))
      .select(col("doc_id"), col("c.bmod").as("bmod"), col("c.k").as("k"),
        col("c.l").as("l"))
      .as[CdcOut]
  }
}
