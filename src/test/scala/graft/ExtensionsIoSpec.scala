package graft

import graft.plans.GraftExtensions
import graft.sources.Io
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class ExtensionsIoSpec extends SparkSpec {

  test("GraftExtensions injects cosine_sim into a fresh session") {
    // getOrCreate returns the active session, so detach it, build an
    // extension-bearing session on the same SparkContext, then restore.
    val prev = SparkSession.getDefaultSession
    spark.sparkContext // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val sim = s2.sql(
        """SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |                  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c""".stripMargin)
        .head().getDouble(0)
      assert(math.abs(sim - 1.0) < 1e-12)
    } finally {
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  test("csv round-trip with enforced schema; corrupt rows quarantined") {
    val dir = java.nio.file.Files.createTempDirectory("graft_io").toString
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    docs.write.option("header", "true").mode("overwrite").csv(s"$dir/csv")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType)))
    // cache: Spark disallows lazy queries whose referenced columns reduce
    // to only the corrupt-record column (UNSUPPORTED_FEATURE)
    val back = Io.cleanRows(Io.readCsv(spark, s"$dir/csv", schema).cache())
    assert(back.count() == docs.count())
    assert(back.agg(sum("n_chars")).head().getLong(0) ==
      docs.agg(sum("n_chars")).head().getLong(0))
  }

  test("json read quarantines malformed rows instead of dropping silently") {
    val dir = java.nio.file.Files.createTempDirectory("graft_io").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in.json"),
      """{"doc_id": 1, "lang": "en"}
        |{"doc_id": "NOT_A_NUMBER", "lang": "de"}
        |{"doc_id": 3, "lang": "fr"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType)))
    val df = Io.readJson(spark, s"$dir/in.json", schema).cache()
    assert(Io.cleanRows(df).count() == 2)
    assert(Io.corruptRows(df).count() == 1)
  }

  test("partitioned parquet write produces hive-style partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_io").toString
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    Io.writePartitioned(docs, s"$dir/part", Seq("lang"))
    val dirs = new java.io.File(s"$dir/part").listFiles().map(_.getName).filter(_.startsWith("lang="))
    assert(dirs.toSet == Set("lang=en", "lang=es", "lang=de", "lang=fr", "lang=zh"))
    val back = spark.read.parquet(s"$dir/part")
    assert(back.count() == docs.count())
    // partition pruning: a lang filter scans one partition only
    val pruned = back.filter(col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"), scan)
  }

  test("orc round-trip preserves values and pushes filters into the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    Io.writeOrc(docs, s"$dir/orc")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val back = Io.readOrc(spark, s"$dir/orc", schema)
    assert(back.count() == docs.count())
    assert(back.agg(sum("n_chars")).head().getLong(0) ==
      docs.agg(sum("n_chars")).head().getLong(0))
    val plan = back.filter(col("n_chars") > 500)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("n_chars"), plan)
  }

  test("bucketed tables join and aggregate with zero exchange") {
    // suite-unique table names: JoinSemanticsSpec writes its own bucketed
    // tables, and under parallel forked test groups the two suites share
    // the on-disk warehouse but NOT the in-memory catalog — a shared name
    // hits LOCATION_ALREADY_EXISTS across JVMs. Pre-clean stale managed
    // locations a crashed prior run may have left (same JVM-split reason:
    // DROP TABLE in another JVM's catalog never deletes this dir).
    spark.sql("DROP TABLE IF EXISTS b_io_orders")
    spark.sql("DROP TABLE IF EXISTS b_io_lineitem")
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("b_io_orders", "b_io_lineitem").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    val orders = graft.sources.Tables.orders(spark, sfSmoke)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val lineitem = graft.sources.Tables.lineitem(spark, sfSmoke)
      .select(col("l_orderkey"), col("l_quantity"))
    Io.writeBucketed(orders, "b_io_orders", "o_orderkey", 8)
    Io.writeBucketed(lineitem, "b_io_lineitem", "l_orderkey", 8)
    try {
      val bo = spark.table("b_io_orders")
      val bl = spark.table("b_io_lineitem")
      // co-located join: the write-time clustering replaces the per-query
      // shuffle on both sides (broadcast suppressed to prove it)
      val joined = bo.hint("merge")
        .join(bl, bo("o_orderkey") === bl("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      // and the values are identical to the unbucketed join
      val expected = orders.join(lineitem,
        orders("o_orderkey") === lineitem("l_orderkey")).count()
      assert(joined.count() == expected)
      // aggregation on the bucket key also skips its exchange
      val agg = bl.groupBy(col("l_orderkey")).agg(sum(col("l_quantity")))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"),
        agg.queryExecution.executedPlan.toString)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_io_orders")
      spark.sql("DROP TABLE IF EXISTS b_io_lineitem")
      ()
    }
  }

  test("schema evolution: merged read unions old and new file schemas") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evo").toString
    val v1 = graft.sources.Tables.documents(spark, sfSmoke)
      .select(col("doc_id"), col("lang"))
    val v2 = graft.sources.Tables.documents(spark, sfSmoke)
      .select(col("doc_id"), col("lang"), col("n_chars")) // column added later
    v1.write.parquet(s"$dir/t/batch=1")
    v2.write.parquet(s"$dir/t/batch=2")
    val merged = Io.readParquetMerged(spark, s"$dir/t")
    assert(merged.columns.toSet == Set("doc_id", "lang", "n_chars", "batch"))
    // old files surface the new column as null, not an error
    assert(merged.filter(col("batch") === 1 && col("n_chars").isNull).count() ==
      v1.count())
    assert(merged.filter(col("batch") === 2 && col("n_chars").isNotNull).count() ==
      v2.count())
  }

  test("compact rewrites a fragmented directory into few files, losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
    // fragment: 20 tiny files (the shape a micro-batch sink leaves behind)
    docs.repartition(20).write.parquet(s"$dir/frag")
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$dir/frag") == 20)
    Io.compact(spark, s"$dir/frag", s"$dir/compacted", targetFileMB = 128)
    assert(parquetFiles(s"$dir/compacted") == 1) // tiny fixture -> one file
    val back = spark.read.parquet(s"$dir/compacted")
    assert(back.count() == docs.count())
    assert(back.agg(sum("n_chars")).head().getLong(0) ==
      docs.agg(sum("n_chars")).head().getLong(0))
    // partitioned source: layout survives when partition cols are named
    docs.write.partitionBy("lang").parquet(s"$dir/pfrag")
    Io.compact(spark, s"$dir/pfrag", s"$dir/pcompacted",
      partitionCols = Seq("lang"))
    val partDirs = new java.io.File(s"$dir/pcompacted").listFiles()
      .map(_.getName).filter(_.startsWith("lang="))
    assert(partDirs.nonEmpty)
    assert(spark.read.parquet(s"$dir/pcompacted").count() == docs.count())
  }

  test("Io.fanOut: rebalances a starved scan, identity on a wide input") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("fanout").toString
    spark.range(10000).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val want = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val scan = spark.read.parquet(dir).select(col("id"))
    assert(scan.rdd.getNumPartitions < want, "fixture scan should be starved")
    // starved scan -> one round-robin exchange to the session width
    val fanned = graft.sources.Io.fanOut(scan)
    assert(fanned.rdd.getNumPartitions == want)
    assert(fanned.queryExecution.executedPlan.toString.contains("RoundRobinPartitioning"))
    // already-wide input -> IDENTITY: same object, no exchange added
    val wide = scan.repartition(want)
    assert(graft.sources.Io.fanOut(wide) eq wide)
    // values untouched either way
    assert(fanned.agg(org.apache.spark.sql.functions.sum(col("id"))).head.getLong(0)
      == 10000L * 9999 / 2)
  }

  test("Io.materialize reliable mode: one config flips CC and Ranks to checkpoint()") {
    import spark.implicits._
    // The r3 verdict's one-switch ask: every lineage-truncation site goes
    // through Io.materialize, so flipping spark.graft.reliableCheckpoint
    // must route ALL of them (the CC loop and a Ranks consumer here)
    // through reliable checkpoint() — blocks on the checkpoint dir that
    // survive executor loss — with identical results.
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    try {
      spark.conf.set(Io.ReliableCheckpointKey, "true")
      spark.conf.set(Io.CheckpointDirKey, ckptDir)
      // CC under reliable checkpoint (Graph.scala's two materialize sites)
      val edges = (0 until 50).map(i => (i.toLong, i.toLong + 1)).toDF("s", "t")
      val cc = graft.operators.Graph.connectedComponents(edges, "s", "t").collect()
      assert(cc.length == 51 && cc.forall(_.getLong(1) == 0L))
      // a Ranks consumer under reliable checkpoint (CorpusOps.pack's site)
      val docs = (1 to 40)
        .map(i => (i.toLong, List.fill(i % 5 + 1)(s"tok$i").mkString(" ")))
        .toDF("id", "text")
      val packed = graft.operators.CorpusOps.pack(docs, "id", "text", 16)
      assert(packed.count() == 40)
      assert(packed.agg(sum(col("n_tokens"))).head.getLong(0) ==
        (1 to 40).map(i => i % 5 + 1).sum)
      // the reliable path was actually taken: checkpoint data landed on disk
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      assert(walk(new java.io.File(ckptDir)).nonEmpty,
        "no checkpoint files written — materialize did not go reliable")
    } finally {
      spark.conf.unset(Io.ReliableCheckpointKey)
      spark.conf.unset(Io.CheckpointDirKey)
    }
  }

  test("a pinSliced registry query runs end-to-end under reliable checkpoint") {
    // r14 verdict task 5: ~15 registry queries pass through Ranks'
    // pinSliced materialization on every run; on a real cluster the
    // localCheckpoint default dies with an executor, so the reliable
    // path must be proven on a REAL registry query, not just the unit
    // helpers. q17 rides rowNumberAndRunningSum (two pinSliced reads).
    val baseline = SparkEntry.queries("q17_window_frame")(spark, sfSmoke)
      .collect().map(_.toString).sorted
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt_q17").toString
    try {
      spark.conf.set(Io.ReliableCheckpointKey, "true")
      // set the context dir DIRECTLY: the CheckpointDirKey convenience
      // only applies when no dir is set yet, and the shared test session
      // may already carry one from an earlier suite — the file assertion
      // below must walk THIS test's directory
      spark.sparkContext.setCheckpointDir(ckptDir)
      val reliable = SparkEntry.queries("q17_window_frame")(spark, sfSmoke)
        .collect().map(_.toString).sorted
      assert(reliable.sameElements(baseline),
        "reliable-checkpoint result differs from localCheckpoint result")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      assert(walk(new java.io.File(ckptDir)).nonEmpty,
        "no checkpoint files written — q17 did not take the reliable path")
    } finally {
      spark.conf.unset(Io.ReliableCheckpointKey)
      spark.conf.unset(Io.CheckpointDirKey)
    }
  }

  test("releaseTransient drops materialize blocks, spares pinned; replace releases old") {
    import spark.implicits._
    val sc = spark.sparkContext
    def liveIds: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    // quiesce: drop anything earlier suites left tracked, so this test
    // observes only its own blocks
    Io.releaseTransient(spark)
    val before = liveIds
    val t = Io.materialize((1 to 100).toDF("a"))
    val p = Io.materializePinned((1 to 100).toDF("b"))
    val tIds = liveIds -- before
    assert(tIds.nonEmpty, "materialization created no persistent RDDs?")
    assert(t.count() == 100 && p.count() == 100)
    Io.releaseTransient(spark)
    // transient blocks gone...
    val after = liveIds
    val pinnedLeft = after -- before
    assert(pinnedLeft.nonEmpty, "pinned blocks were released with the transients")
    // ...pinned relation still readable (its blocks survived)
    assert(p.count() == 100)
    // replace path: unpersistMaterialized drops exactly the old pinned set
    Io.unpersistMaterialized(p)
    assert((liveIds -- before).isEmpty,
      "unpersistMaterialized left the replaced relation's blocks live")
  }

  test("PhaseTiming splits stages into map and reduce phases") {
    val pt = new PhaseTiming
    spark.sparkContext.addSparkListener(pt)
    try {
      graft.sources.Tables.lineitem(spark, sfSmoke)
        .groupBy(col("l_returnflag")).count().collect()
      // listener bus is async; give stage-completed events time to drain
      Thread.sleep(2000)
      val r = pt.report
      assert(r.contains("\"map_stages\":"), r)
      val mapStages = "\"map_stages\":(\\d+)".r.findFirstMatchIn(r).get.group(1).toInt
      val reduceStages = "\"reduce_stages\":(\\d+)".r.findFirstMatchIn(r).get.group(1).toInt
      assert(mapStages >= 1, r)       // the scan/partial-agg stage
      assert(reduceStages >= 1, r)    // the final-agg stage after shuffle
    } finally spark.sparkContext.removeSparkListener(pt)
  }

  test("attribution is exact: a user cache populated during a checkpoint " +
      "job is not claimed as transient") {
    import spark.implicits._
    val sc = spark.sparkContext
    def liveIds: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    Io.releaseTransient(spark) // quiesce earlier suites' transients
    // lazy cache whose InMemoryRelation populates (and so registers its
    // persistent RDD) INSIDE the eager checkpoint job below — the r15
    // misattribution scenario for before/after id diffing
    val cached = (1 to 1000).toDF("x").cache()
    val m = Io.materialize(cached.groupBy((col("x") % 10).as("g")).count())
    val afterMat = liveIds
    Io.releaseTransient(spark)
    val released = afterMat -- liveIds
    val ckptId = m.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.get
    assert(released == Set(ckptId),
      s"releaseTransient dropped $released; expected exactly the " +
        s"checkpoint RDD $ckptId (user cache must be spared)")
    assert(cached.count() == 1000)
    cached.unpersist()
  }

  test("reliable-mode release deletes transient checkpoint dirs, spares " +
      "pinned until replaced") {
    import spark.implicits._
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_ckpt_rel").toString
    def rddDirs: Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory)
          f.listFiles().toSeq.flatMap(walk) :+ f
        else Seq(f)
      walk(new java.io.File(ckptDir)).filter(f =>
        f.isDirectory && f.getName.startsWith("rdd-"))
    }
    try {
      spark.conf.set(Io.ReliableCheckpointKey, "true")
      spark.sparkContext.setCheckpointDir(ckptDir)
      Io.releaseTransient(spark) // quiesce (earlier local-mode transients)
      val t = Io.materialize((1 to 100).toDF("a"))
      val p = Io.materializePinned((1 to 200).toDF("b"))
      assert(t.count() == 100 && p.count() == 200)
      assert(rddDirs.size == 2, s"expected 2 checkpoint dirs, got $rddDirs")
      Io.releaseTransient(spark)
      assert(rddDirs.size == 1,
        "transient checkpoint dir not deleted (or pinned dir deleted)")
      // pinned relation still readable from its checkpoint files
      assert(p.count() == 200)
      Io.unpersistMaterialized(p)
      assert(rddDirs.isEmpty,
        "replaced pinned relation's checkpoint dir not deleted")
    } finally {
      spark.conf.unset(Io.ReliableCheckpointKey)
      spark.conf.unset(Io.CheckpointDirKey)
    }
  }
}
