package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink utilities beyond the driver's parquet tables: schema-
  * enforced CSV/JSON ingestion and partitioned parquet output.
  *
  * Scale notes: explicit schemas always (inference double-reads the data —
  * unacceptable at 100 TB); CSV/JSON land in PERMISSIVE mode with a
  * corrupt-record column so bad rows are quarantined, not dropped
  * silently; writes partition by low-cardinality columns only and rely on
  * AQE-coalesced upstream shuffles for file sizing.
  */
object Io {
  val CorruptCol = "_corrupt_record"

  /** One config key flips every lineage-truncation site in the engine
    * between eager localCheckpoint (default — executor-resident blocks,
    * no distributed-FS round-trip, right for local mode and short jobs)
    * and reliable `checkpoint()` (blocks on the checkpoint dir, survive
    * executor loss — required on a real cluster with dynamic allocation,
    * where a lost executor would otherwise kill every iterative operator
    * mid-flight at once). */
  val ReliableCheckpointKey = "spark.graft.reliableCheckpoint"

  /** Optional convenience: when set, materialize() installs this as the
    * SparkContext checkpoint dir on first reliable use. */
  val CheckpointDirKey = "spark.graft.checkpointDir"

  /** Central materialization switch: every operator that must truncate
    * lineage / force one evaluation of a multi-consumer subtree (the CC
    * loop, Ranks' offset producers, pack()'s prefix sums, q79's posting
    * relation) calls this instead of hard-coding localCheckpoint. The
    * eager=true semantics are identical in both modes: the returned
    * DataFrame is already computed and its plan is a block scan.
    *
    * BLOCK ACCOUNTING (r14 verdict task 1 — the bench session-drift
    * root cause): checkpoint blocks are dropped by Spark's
    * ContextCleaner only after a driver GC cycle collects the RDD object
    * AND the cleaner drains its reference queue — with the default
    * 30-minute periodicGC that never happens inside a bench/verify
    * session, so a 239-query × 3-rep run accumulated every transient
    * materialization of every rep (341 MB of blocks, and the GC/
    * block-manager pressure that dripped +20% onto untouched queries).
    * materialize() therefore TRACKS the block ids it creates as
    * transient; a long-lived driver (Bench, Verify, any pipeline loop)
    * calls [[releaseTransient]] at its natural per-query boundary to
    * drop them deterministically. Standing artifacts that outlive one
    * query (the published dedup index family, CC labels, the ANN
    * serving index, streaming static relations) use
    * [[materializePinned]], which is identical but exempt; a replaced
    * standing artifact is released precisely via
    * [[unpersistMaterialized]]. The accounting covers BOTH checkpoint
    * modes: local mode tracks the persisted RDD id, reliable mode
    * tracks the relation's checkpoint directory (df.checkpoint
    * registers no persistent RDD — its blocks are files), and release
    * drops whichever the relation owns.
    *
    * Safety: unpersisting a checkpointed relation makes it
    * UNRECOMPUTABLE (lineage is truncated by design), so release sites
    * must sit at points where no live plan still references the blocks
    * — after a query's action completes, or after a standing artifact's
    * replacement is published. */
  def materialize(df: DataFrame): DataFrame =
    materialize0(df, pinned = false)

  /** [[materialize]] for STANDING artifacts — relations published across
    * query boundaries (build-once-consume-many indexes, streaming
    * statics). Exempt from [[releaseTransient]]; release explicitly via
    * [[unpersistMaterialized]] when replaced or retired. */
  def materializePinned(df: DataFrame): DataFrame =
    materialize0(df, pinned = true)

  // Accounting state (r16 rework, closing three r15 advisories):
  //  - attribution is EXACT: the Dataset returned by checkpoint /
  //    localCheckpoint scans a LogicalRDD whose `rdd` IS the relation
  //    Spark persisted (local mode) or wrote to the checkpoint dir
  //    (reliable mode) — so we read that id/path directly instead of
  //    diffing getPersistentRDDs around the job. A user cache that
  //    happens to populate during the checkpoint job can no longer be
  //    misattributed as a transient block, and the monitor now guards
  //    only registry mutation (concurrent materializations run their
  //    checkpoint jobs unserialized).
  //  - registries are scoped to the SparkContext: RDD ids restart at 0
  //    in a fresh context, so a stale registry from a stopped context
  //    could release an unrelated (unrecomputable) block. Any entrypoint
  //    observing a different applicationId clears the registries first.
  //  - reliable mode is tracked by CHECKPOINT PATH: df.checkpoint
  //    registers no persistent RDD (the blocks are files under
  //    <dir>/rdd-<id>), so release deletes those directories. The
  //    release contract is identical to local mode — the relation is
  //    unreadable afterwards — and without it a long session under
  //    reliableCheckpoint=true accumulates every transient's files.
  private val lock = new Object
  private var appIdSeen: String = null
  private val transientIds = scala.collection.mutable.LinkedHashSet.empty[Int]
  private val transientCkpts = scala.collection.mutable.LinkedHashSet.empty[String]
  private val trackByDf =
    new java.util.WeakHashMap[DataFrame, (Set[Int], Set[String])]()

  // Under `lock`: forget a stopped context's bookkeeping before touching
  // a new one (ids/paths from the old context must never be released
  // against the new one).
  private def resetIfNewApp(sc: org.apache.spark.SparkContext): Unit = {
    val app = sc.applicationId
    if (appIdSeen != app) {
      transientIds.clear(); transientCkpts.clear(); trackByDf.clear()
      appIdSeen = app
    }
  }

  private def materialize0(df: DataFrame, pinned: Boolean): DataFrame = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    val reliable =
      spark.conf.getOption(ReliableCheckpointKey).exists(_.toBoolean)
    if (reliable && sc.getCheckpointDir.isEmpty)
      spark.conf.getOption(CheckpointDirKey) match {
        case Some(dir) => sc.setCheckpointDir(dir)
        case None => sys.error(
          s"$ReliableCheckpointKey=true requires a checkpoint dir: set " +
            s"$CheckpointDirKey or call sparkContext.setCheckpointDir")
      }
    val out =
      if (reliable) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)
    val rdd = out.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }.getOrElse(throw new IllegalStateException(
      "materialize: checkpoint did not return a LogicalRDD scan — " +
        "block accounting cannot attribute the new relation " +
        s"(plan: ${out.queryExecution.analyzed.nodeName})"))
    val ids: Set[Int] = if (reliable) Set.empty else Set(rdd.id)
    val paths: Set[String] =
      if (reliable) rdd.getCheckpointFile.toSet else Set.empty
    lock.synchronized {
      resetIfNewApp(sc)
      trackByDf.put(out, (ids, paths))
      if (!pinned) { transientIds ++= ids; transientCkpts ++= paths }
    }
    out
  }

  // Delete reliable-checkpoint directories (<ckptDir>/rdd-<id>) through
  // the Hadoop FS API so the path scheme (local, HDFS, object store)
  // resolves the same way the writer's did.
  private def deleteCkptDirs(spark: SparkSession, paths: Iterable[String]): Unit =
    paths.foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(hp, true)
    }

  /** Drop every TRANSIENT materialization's blocks (everything created
    * by [[materialize]] since the last release; pinned artifacts are
    * untouched). In reliable-checkpoint mode the "blocks" are the
    * relation's checkpoint files, which are deleted the same way. Call
    * at a point where no live plan references them — Bench and Verify
    * call this after each query completes. */
  def releaseTransient(spark: SparkSession): Unit = {
    val (ids, paths) = lock.synchronized {
      resetIfNewApp(spark.sparkContext)
      val snap = (transientIds.toList, transientCkpts.toList)
      transientIds.clear(); transientCkpts.clear()
      snap
    }
    val live = spark.sparkContext.getPersistentRDDs
    ids.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
    deleteCkptDirs(spark, paths)
  }

  /** Release the blocks of ONE materialized relation (pinned or not) —
    * the replace path for standing artifacts: publish the rebuilt
    * relation first, then unpersist the one it displaced. Deletes the
    * relation's checkpoint directory in reliable mode. */
  def unpersistMaterialized(df: DataFrame): Unit = {
    val tracked = lock.synchronized {
      resetIfNewApp(df.sparkSession.sparkContext)
      val t = Option(trackByDf.remove(df))
      t.foreach { case (ids, paths) =>
        transientIds --= ids; transientCkpts --= paths
      }
      t
    }
    tracked.foreach { case (ids, paths) =>
      val live = df.sparkSession.sparkContext.getPersistentRDDs
      ids.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
      deleteCkptDirs(df.sparkSession, paths)
    }
  }

  /** Rebalance a slim projection ahead of a CPU-heavy map-side kernel
    * (explode chains, per-row text/vector hashing). A small-file scan
    * plans one task per file — at fixture scale that runs a 32× explode+
    * hash chain on ONE core while the rest idle (q118 measured 5.0 s
    * serial vs ~0.8 s fanned at sf0.1). CONDITIONAL: when the planned
    * scan already meets the session's shuffle width (every production
    * many-file scan), this is the identity — no shuffle, no plan change;
    * only a parallelism-starved scan pays one round-robin shuffle of the
    * slim projection handed in (keep it to the columns the kernel
    * needs). The partition probe reads the PLANNED file-scan partition
    * count — pass a scan-level projection (scan/project/filter only):
    * planning a subtree with upstream exchanges would materialize query
    * stages under AQE just to count partitions. Determinism: Spark sorts
    * partitions before round-robin redistribution
    * (sortBeforeRepartition), and every query in the registry is
    * partitioning-independent by contract anyway. */
  def fanOut(df: DataFrame): DataFrame = {
    val want = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions >= want) df else df.repartition(want)
  }

  /** Read CSV with an enforced schema + quarantine column. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** Read newline-delimited JSON with an enforced schema + quarantine. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Rows that failed parsing (quarantine stream). */
  def corruptRows(df: DataFrame): DataFrame =
    df.filter(df(CorruptCol).isNotNull)

  /** Clean rows with the quarantine column dropped. */
  def cleanRows(df: DataFrame): DataFrame =
    df.filter(df(CorruptCol).isNull).drop(CorruptCol)

  /** Hive-style partitioned parquet write. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Plain parquet sink (CSV/JSON sinks mirror spark.write natively). */
  def writeParquet(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  /** ORC read with enforced schema — the second columnar format big SQL
    * stacks exchange data in; same pushdown/pruning behavior as parquet
    * (OrcScan reports PushedFilters the same way). */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** ORC sink. */
  def writeOrc(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** Parquet read with schema merging across file footers — the schema-
    * evolution path: a corpus written over months gains columns, and a
    * reader pinned to one footer's schema silently drops them. Merging
    * unions the schemas (missing values null). Costs a footer scan per
    * file at planning time, so production confines it to tables that
    * actually evolve (or maintains the schema in a catalog instead). */
  def readParquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Small-file compaction: rewrite a fragmented parquet directory (the
    * inevitable product of per-micro-batch streaming sinks like s06/s08)
    * into ~`targetFileMB`-sized files. File count is computed from the
    * source's actual on-disk bytes, so the operator needs no statistics
    * service; the write goes to a NEW directory — atomic swap/retention is
    * the table format's or orchestrator's job, not a file-level rename
    * race this library should hide.
    *
    * A Hive-partitioned source MUST pass its partition columns via
    * `partitionCols` — the merged read surfaces them as ordinary columns,
    * and writing without re-partitioning would silently flatten the
    * directory layout (readers lose partition pruning). */
  def compact(spark: SparkSession, srcPath: String, dstPath: String,
      targetFileMB: Int = 128, partitionCols: Seq[String] = Nil): Unit = {
    // Path.getFileSystem handles raw (unescaped) paths and scheme
    // resolution; a raw path is not a valid java.net.URI
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(src).getLength
    val n = math.max(1L, (bytes + targetFileMB.toLong * 1024 * 1024 - 1) /
      (targetFileMB.toLong * 1024 * 1024)).toInt
    // merged read: a fragmented directory written over time may have
    // gained columns — compaction must not pin one footer's schema and
    // silently destroy the late-added columns
    val merged = readParquetMerged(spark, srcPath)
    // partitioned output must CLUSTER by the partition columns: a plain
    // round-robin repartition(n) spreads every partition value across all
    // n tasks and partitionBy then writes n×P fragments — worse than the
    // input. Hash-clustering keeps each value's rows in few tasks.
    val df =
      if (partitionCols.nonEmpty)
        merged.repartition(n, partitionCols.map(org.apache.spark.sql.functions.col): _*)
      else merged.repartition(n)
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(dstPath)
  }

  /** Bucketed parquet table: rows are hash-clustered into `buckets` files
    * per partition BY THE JOIN KEY and each bucket is sorted on it. Two
    * tables bucketed the same way join with ZERO exchange — the shuffle is
    * paid once at write time and amortized over every subsequent join or
    * aggregation on that key. This is the co-location strategy for
    * fact-to-fact joins at 100 TB, where neither side broadcasts and a
    * per-query shuffle of either would dominate the plan.
    *
    * Catalog-backed (`saveAsTable`) because bucket metadata lives in the
    * table catalog, not the files. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
