package graft

import java.sql.Timestamp

import graft.streaming.StreamOps
import graft.streaming.StreamOps.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** MemoryStream-driven tests for the streaming surface (SURVEY §5):
  * tumbling windows emit on watermark passage, dedup drops duplicates,
  * sessionization closes sessions on gap/timeout. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def ev(id: Long, minute: Int, user: Long = 1L,
      typ: String = "click", value: Double = 1.0): Ev =
    Ev(id, ts(minute), user, typ, value)

  test("s01 tumbling window emits closed windows after watermark passes") {
    val input = MemoryStream[Ev](spark)
    val q = StreamOps.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("s01_out")
      .outputMode(OutputMode.Append).start()
    try {
      // hour 0: 3 events; then jump far past hour 0 + watermark
      input.addData(ev(1, 10), ev(2, 20, typ = "view"), ev(3, 30))
      q.processAllAvailable()
      input.addData(ev(4, 200))   // 03:20 -> watermark 03:10 >> 01:00
      q.processAllAvailable()
      val rows = spark.table("s01_out").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(rows == Set(
        (ts(0), "click", 2L),
        (ts(0), "view", 1L)))
    } finally q.stop()
  }

  test("s01 over the real parquet file source matches batch q30 (closed windows)") {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    // file streaming sources want a directory: stage the table file there
    val streamDir = java.nio.file.Files.createTempDirectory("graft_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfSmoke/events.parquet"),
      streamDir.resolve("part-00000.parquet"))
    val q = StreamOps.tumblingCounts(StreamOps.eventsFileStream(spark, streamDir.toString))
      .writeStream.format("memory").queryName("s01_file")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("s01_file").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    // append mode emits only windows the final watermark (max ts - 10min)
    // has closed; compare against the batch result restricted to those
    val batch = SparkEntry.queries("q30_events_tumbling")(spark, sfSmoke).collect()
    val maxTs = graft.sources.Tables.events(spark, sfSmoke)
      .agg(max(col("ts"))).head().getTimestamp(0)
    val cutoffMs = maxTs.getTime - 10 * 60 * 1000
    val closed = batch.filter(_.getTimestamp(0).getTime + 3600000 <= cutoffMs)
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == closed)
    assert(streamed.nonEmpty)
  }

  test("file stream over a legacy ns-vintage fixture sees the batch loader's instants") {
    // The old fixture vintage stores ts as TIMESTAMP(NANOS), which Spark
    // surfaces as LongType under nanosAsLong — eventsFileStream's
    // driver-side footer sniff must route that vintage through the exact
    // ns→us integer conversion the batch loader applies (r7 verdict task
    // 7: the scaladoc claimed this; now it is held to it). The staged
    // fixture stores epoch-nanos as int64, which reads back through the
    // same LongType path as a genuine TIMESTAMP(NANOS) column.
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_ns").toString
    val nsDir = java.nio.file.Files.createTempDirectory("graft_events_ns").toString
    graft.sources.Tables.events(spark, sfSmoke)
      .select(col("event_id"), (unix_micros(col("ts")) * 1000L).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite").parquet(nsDir)
    val q = StreamOps.eventsFileStream(spark, nsDir)
      .select(col("event_id"), col("ts"))
      .writeStream.format("memory").queryName("ns_file")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("ns_file").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val batch = graft.sources.Tables.events(spark, sfSmoke)
      .select(col("event_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("s01 in Complete mode emits every window, matching the batch aggregation") {
    val input = MemoryStream[Ev](spark)
    // Complete mode re-emits the full result table each trigger (no
    // watermark-based finalization needed) — the monitoring-dashboard mode
    val q = input.toDF()
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"))
      .writeStream.format("memory").queryName("s01_complete")
      .outputMode(OutputMode.Complete).start()
    try {
      input.addData(ev(1, 10), ev(2, 20, typ = "view"), ev(3, 70))
      q.processAllAvailable()
      val rows = spark.table("s01_complete").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(rows == Set(
        (ts(0), "click", 1L), (ts(0), "view", 1L), (ts(60), "click", 1L)))
      // late-arriving data updates the already-emitted window
      input.addData(ev(4, 15, typ = "view"))
      q.processAllAvailable()
      val rows2 = spark.table("s01_complete").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(rows2 == Set(
        (ts(0), "click", 1L), (ts(0), "view", 2L), (ts(60), "click", 1L)))
    } finally q.stop()
  }

  test("s02 streaming dedup drops duplicate event_ids within watermark") {
    val input = MemoryStream[Ev](spark)
    val q = StreamOps.dedupEvents(input.toDF())
      .writeStream.format("memory").queryName("s02_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev(1, 10), ev(1, 10), ev(2, 11))
      q.processAllAvailable()
      input.addData(ev(1, 12), ev(3, 13))
      q.processAllAvailable()
      val ids = spark.table("s02_out").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("s04 stream-static enrichment join tags events with customer segment") {
    val input = MemoryStream[Ev](spark)
    val customer = graft.sources.Tables.customer(spark, sfSmoke)
    val q = StreamOps.enrich(input.toDF(), customer)
      .writeStream.format("memory").queryName("s04_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev(1, 10, user = 3L), ev(2, 11, user = 999999L))
      q.processAllAvailable()
      val rows = spark.table("s04_out").collect()
        .map(r => r.getLong(0) -> Option(r.getString(4))).toMap
      assert(rows(1L).isDefined)       // user 3 exists in customer
      assert(rows(2L).isEmpty)         // unknown user -> null segment
    } finally q.stop()
  }

  test("s05 stream-stream interval join correlates within the time band") {
    val clicks = MemoryStream[Ev](spark)
    val purchases = MemoryStream[Ev](spark)
    val q = StreamOps.streamStreamCorrelate(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("s05_out")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(ev(1, 10, user = 1L), ev(2, 40, user = 2L))
      purchases.addData(
        ev(101, 12, user = 1L),   // within 2 min of click 1 -> match
        ev(102, 30, user = 1L),   // 20 min after click 1 -> no match
        ev(103, 41, user = 2L))   // within 1 min of click 2 -> match
      q.processAllAvailable()
      val pairs = spark.table("s05_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 101L), (2L, 103L)))
    } finally q.stop()
  }

  test("s17 left-outer stream-stream join emits unmatched clicks on watermark") {
    val clicks = MemoryStream[Ev](spark)
    val purchases = MemoryStream[Ev](spark)
    val q = StreamOps.streamStreamLeftOuter(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("s17_out")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(ev(1, 10, user = 1L), ev(2, 40, user = 2L),
        ev(3, 11, user = 3L),     // user 3 never purchases (band end 16)
        ev(6, 38, user = 4L))     // user 4 never purchases (band end 43)
      purchases.addData(
        ev(101, 12, user = 1L),   // in band for click 1 -> match
        ev(102, 30, user = 1L),   // 20 min after click 1 -> out of band
        ev(103, 41, user = 2L))   // in band for click 2 -> match
      q.processAllAvailable()
      val matched = spark.table("s17_out").collect()
        .filter(r => !r.isNullAt(3)).map(r => (r.getLong(0), r.getLong(3))).toSet
      assert(matched == Set((1L, 101L), (2L, 103L)))
      // watermark after batch 1 = min(40, 41) - 10min = minute 30 (the
      // no-data batch applies it): click 3's band [11,16] is fully past
      // -> its null row emits NOW; click 6's band runs to 43 > 30, a
      // purchase could still arrive -> it must still be held in state
      val nulls1 = spark.table("s17_out").collect()
        .filter(_.isNullAt(3)).map(_.getLong(0)).toSet
      assert(nulls1 == Set(3L), s"expected only click 3 released, got $nulls1")
      // advance BOTH watermarks far past click 6's band; it releases
      clicks.addData(ev(4, 300, user = 9L))
      purchases.addData(ev(104, 300, user = 9L))
      q.processAllAvailable()
      val nulls = spark.table("s17_out").collect()
        .filter(_.isNullAt(3)).map(_.getLong(0)).toSet
      assert(nulls == Set(3L, 6L), s"expected clicks 3 and 6 unmatched, got $nulls")
    } finally q.stop()
  }

  test("s17 over the real fixture converges to the batch left-join twin") {
    import org.apache.spark.sql.streaming.Trigger
    val events = graft.sources.Tables.events(spark, sfSmoke)
    val clicksB = events.filter(col("event_type") === "click")
    val purchB = events.filter(col("event_type") === "purchase")
    // batch twin restricted to rows the final watermark can release:
    // stream append emits (a) matches once both sides arrive, (b) null
    // rows once the purchase watermark passes the band; with
    // AvailableNow the final watermark is max(ts)-10min, so clicks with
    // band end beyond it stay in state and never emit. Mirror that cut.
    // the global watermark is the MIN over both sides' per-source
    // watermarks (each side only sees its own filtered max ts), and the
    // engine tracks event time in whole MILLIseconds (EventTimeStats) —
    // mirror both before the cut
    val maxTs = math.min(
      clicksB.agg(max(unix_micros(col("ts")))).head().getLong(0),
      purchB.agg(max(unix_micros(col("ts")))).head().getLong(0))
    val wmUs = (maxTs / 1000 - 10L * 60 * 1000) * 1000
    val expected = clicksB.select(col("event_id").as("click_id"),
        col("user_id"), col("ts").as("click_ts"))
      .join(purchB.select(col("event_id").as("purchase_id"),
          col("user_id").as("p_user"), col("ts").as("purchase_ts")),
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL '5' MINUTE"),
        "left_outer")
      .filter(
        // matched rows: both endpoints below the final watermark emit;
        // null rows: only when the watermark passed the whole band
        when(col("purchase_id").isNotNull, lit(true))
          .otherwise(unix_micros(col("click_ts")) + 5L * 60 * 1000000 < wmUs))
      .select(col("click_id"), col("purchase_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_s17")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfSmoke/events.parquet"),
      dir.resolve("part-00000.parquet"))
    def side(t: String) = StreamOps.eventsFileStream(spark, dir.toString)
      .filter(col("event_type") === t)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s17_ckpt").toString
    val q = StreamOps.streamStreamLeftOuter(side("click"), side("purchase"))
      .writeStream.format("memory").queryName("s17_file")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val got = spark.table("s17_file").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got == expected,
      s"diff: stream-only=${(got -- expected).take(5)} batch-only=${(expected -- got).take(5)}")
  }

  test("s33 full-outer stream-stream join releases BOTH unmatched sides on watermark") {
    val clicks = MemoryStream[Ev](spark)
    val purchases = MemoryStream[Ev](spark)
    val q = StreamOps.streamStreamFullOuter(clicks.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("s33_out")
      .outputMode(OutputMode.Append).start()
    try {
      clicks.addData(ev(1, 10, user = 1L), ev(2, 40, user = 2L),
        ev(3, 11, user = 3L))       // user 3 never purchases (band end 16)
      purchases.addData(
        ev(101, 12, user = 1L),     // in band for click 1 -> match
        ev(102, 20, user = 9L),     // user 9 never clicks (ts 20)
        ev(103, 41, user = 2L))     // in band for click 2 -> match
      q.processAllAvailable()
      val rows = spark.table("s33_out").collect()
      val matched = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(3))
        .map(r => (r.getLong(0), r.getLong(3))).toSet
      assert(matched == Set((1L, 101L), (2L, 103L)))
      // watermark after batch 1 = min(40, 41) - 10min = minute 30 (the
      // no-data batch applies it): click 3's band [11,16] is fully past
      // -> its null-purchase row emits; purchase 102 (ts 20) can only
      // match clicks at ts <= 20, all below the watermark -> its
      // null-click row emits. Clicks 1/2 matched -> no null rows.
      val nullPurch = rows.filter(_.isNullAt(3)).map(_.getLong(0)).toSet
      assert(nullPurch == Set(3L), s"unmatched clicks: $nullPurch")
      val nullClick = rows.filter(_.isNullAt(0)).map(_.getLong(3)).toSet
      assert(nullClick == Set(102L), s"unmatched purchases: $nullClick")
    } finally q.stop()
  }

  /** The batch full-outer twin restricted to rows the final watermark can
    * release (the s17 cut, extended to the purchase side): matches emit
    * once both sides arrive; a null-purchase row once the watermark
    * passes the click's forward band; a null-click row once it passes
    * the purchase's own timestamp (the latest click that can match a
    * purchase is at the purchase itself). */
  private def s33BatchTwin(clicksB: org.apache.spark.sql.DataFrame,
      purchB: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val maxTs = math.min(
      clicksB.agg(max(unix_micros(col("ts")))).head().getLong(0),
      purchB.agg(max(unix_micros(col("ts")))).head().getLong(0))
    val wmUs = (maxTs / 1000 - 10L * 60 * 1000) * 1000
    clicksB.select(col("event_id").as("click_id"),
        col("user_id"), col("ts").as("click_ts"))
      .join(purchB.select(col("event_id").as("purchase_id"),
          col("user_id").as("p_user"), col("ts").as("purchase_ts")),
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL '5' MINUTE"),
        "full_outer")
      .filter(
        when(col("click_id").isNotNull && col("purchase_id").isNotNull,
          lit(true))
          .when(col("purchase_id").isNull,
            unix_micros(col("click_ts")) + 5L * 60 * 1000000 < wmUs)
          .otherwise(unix_micros(col("purchase_ts")) < wmUs))
      .select(col("click_id"), col("purchase_id"))
      .collect().map(r => (
        if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
  }

  test("s33 over the real fixture converges to the batch full-join twin") {
    import org.apache.spark.sql.streaming.Trigger
    val events = graft.sources.Tables.events(spark, sfSmoke)
    val expected = s33BatchTwin(
      events.filter(col("event_type") === "click"),
      events.filter(col("event_type") === "purchase"))
    val dir = java.nio.file.Files.createTempDirectory("graft_s33")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfSmoke/events.parquet"),
      dir.resolve("part-00000.parquet"))
    def side(t: String) = StreamOps.eventsFileStream(spark, dir.toString)
      .filter(col("event_type") === t)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s33_ckpt").toString
    val q = StreamOps.streamStreamFullOuter(side("click"), side("purchase"))
      .writeStream.format("memory").queryName("s33_file")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val got = spark.table("s33_file").collect()
      .map(r => (
        if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got == expected,
      s"diff: stream-only=${(got -- expected).take(5)} batch-only=${(expected -- got).take(5)}")
    // the fixture exercises all three populations
    assert(got.exists(p => p._1 >= 0 && p._2 >= 0), "no matches")
    assert(got.exists(p => p._2 == -1L), "no unmatched clicks")
    assert(got.exists(p => p._1 == -1L), "no unmatched purchases")
  }

  test("s33 crash-replay re-emits its lost batch without duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("s33_crash").toString
    val in = s"$dir/in"
    val events = graft.sources.Tables.events(spark, sfSmoke)
    val expected = s33BatchTwin(
      events.filter(col("event_type") === "click"),
      events.filter(col("event_type") === "purchase"))
    // time-ordered slices: every later slice sits above the watermark the
    // earlier ones advanced, so the multi-batch feed drops nothing late
    // and the drained result must still equal the single-cut batch twin
    val ordered = events.orderBy(col("ts"), col("event_id"))
    val n = ordered.count().toInt
    val rows = ordered.collect()
    rows.grouped(n / 3 + 1).zipWithIndex.foreach { case (slice, i) =>
      feedFile(spark.createDataFrame(
        spark.sparkContext.parallelize(slice.toSeq), events.schema), in, s"f$i")
    }
    def side(t: String) = StreamOps.eventsFileStream(spark, in)
      .filter(col("event_type") === t)
    // append-mode foreachBatch sink, replay-idempotent via per-batch
    // dynamic partition overwrite (the updateSink contract, append flavor
    // — stream-stream joins only support Append output mode)
    def start() = StreamOps.streamStreamFullOuter(side("click"), side("purchase"))
      .writeStream
      .option("checkpointLocation", s"$dir/out/_ckpt")
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        batch.withColumn("_batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch").parquet(s"$dir/out/rows")
      }
      .start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    dropLastCommit(s"$dir/out/_ckpt")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(s"$dir/out/rows").collect()
      .map(r => (
        if (r.isNullAt(0)) -1L else r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    // multiset equality: the replayed batch overwrote its own partition —
    // nothing lost, nothing duplicated
    assert(got.sorted == expected.toSeq.sorted,
      s"got ${got.size} rows, expected ${expected.size}")
  }

  test("s03 stateful sessionization closes sessions on >30min gaps") {
    val input = MemoryStream[Ev](spark)
    val q = StreamOps.sessionize(input.toDS())
      .writeStream.format("memory").queryName("s03_out")
      .outputMode(OutputMode.Append).start()
    try {
      // session 1: minutes 0-10 (3 events); gap > 30min; session 2 at 60
      input.addData(ev(1, 0), ev(2, 5), ev(3, 10))
      q.processAllAvailable()
      input.addData(ev(4, 60))   // proves the gap -> closes session 1
      q.processAllAvailable()
      val sessions = spark.table("s03_out").collect()
        .map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      assert(sessions.toSeq == Seq((ts(0), ts(10), 3L)))
      // advance watermark far past session 2 + gap -> timeout closes it
      input.addData(ev(5, 300, user = 2L))
      q.processAllAvailable()
      input.addData(ev(6, 301, user = 2L))
      q.processAllAvailable()
      val all = spark.table("s03_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
      assert(all.contains((1L, ts(60), ts(60), 1L)), all.mkString(", "))
    } finally q.stop()
  }

  test("s03 absorbs late-but-within-watermark events into the session start") {
    val input = MemoryStream[Ev](spark)
    val q = StreamOps.sessionize(input.toDS())
      .writeStream.format("memory").queryName("s03b_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev(1, 20, user = 7L))
      q.processAllAvailable()
      // 5 minutes late but inside the 10-minute watermark: must extend the
      // session BACKWARDS (round-1 bug kept the later start)
      input.addData(ev(2, 15, user = 7L))
      q.processAllAvailable()
      // advance the watermark far past user 7's session + gap; second
      // batch fires the event-time timeout that closes it
      input.addData(ev(3, 300, user = 8L))
      q.processAllAvailable()
      input.addData(ev(4, 301, user = 8L))
      q.processAllAvailable()
      val sess = spark.table("s03b_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
        .filter(_._1 == 7L)
      assert(sess.toSeq == Seq((7L, ts(15), ts(20), 2L)), sess.mkString(", "))
    } finally q.stop()
  }

  test("s07 streaming near-dedup keeps one doc per simhash signature") {
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val q = StreamOps.nearDedupDocs(
      input.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("s07_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, ts(0), "alpha beta gamma"),
        (2L, ts(1), "alpha beta gamma"),      // same token set -> same sig
        (3L, ts(2), "delta epsilon zeta"))
      q.processAllAvailable()
      val kept = spark.table("s07_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept.size == 2, kept.mkString(", "))
      assert(kept.contains(3L))
      assert(kept.intersect(Set(1L, 2L)).size == 1)
    } finally q.stop()
  }

  test("s18 streaming hot-key monitor keeps every guaranteed-heavy token at each cut") {
    val m = 15
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamOps.heavyHittersStream(
      input.toDF().toDF("doc_id", "text"), "text", m)
      .writeStream.format("memory").queryName("s18_out")
      .outputMode(OutputMode.Complete).start()
    try {
      val docs = graft.sources.Tables.documents(spark, sfSmoke)
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      val (b1, b2) = docs.splitAt(docs.length / 2)
      def check(prefix: Array[(Long, String)]): Unit = {
        val snap = spark.table("s18_out")
          .select(explode(col("mg")).as(Seq("k", "cnt")))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(snap.size <= m, "state exceeded capacity")
        val toks = prefix.flatMap(_._2.split(" "))
        val exact = toks.groupBy(identity).view.mapValues(_.size.toLong)
        val n = toks.length
        exact.foreach { case (k, c) =>
          if (c > n / (m + 1))
            assert(snap.contains(k), s"guaranteed-heavy '$k' ($c of $n) missing")
        }
      }
      input.addData(b1.toIndexedSeq: _*)
      q.processAllAvailable()
      check(b1)
      input.addData(b2.toIndexedSeq: _*)
      q.processAllAvailable()
      check(docs)
    } finally q.stop()
  }

  test("s08 streaming decontamination routes exactly the batch q68 doc set") {
    val dir = java.nio.file.Files.createTempDirectory("graft_decon").toString
    // static side: benchmark shingles of the sf0.001 test split
    val testSet = StreamOps.testShingleSet(spark, sfSmoke).persist()
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamOps.decontaminateStream(
      input.toDF().toDF("doc_id", "text"), testSet, dir)
    try {
      // stream the TRAIN split of the same corpus — q68's exact input
      val h = graft.functions.TextOps.contentSplitHash(col("text"))
      val train = graft.sources.Tables.documents(spark, sfSmoke)
        .filter(h < 80).select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      input.addData(train.toIndexedSeq: _*)
      q.processAllAvailable()
      val flagged = spark.read.parquet(s"$dir/flagged")
        .select("doc_id", "n_shared").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val clean = spark.read.parquet(s"$dir/clean")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // the two sinks partition the stream
      assert(clean.size + flagged.size == train.length)
      assert(clean.intersect(flagged.keySet).isEmpty)
      // and the flagged set matches batch q68 exactly (ids + counts)
      val batch = SparkEntry.queries("q68_decontaminate")(spark, sfSmoke)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(flagged == batch, s"stream=$flagged batch=$batch")
    } finally { q.stop(); testSet.unpersist(); () }
  }

  test("s09 streaming scorer emits exactly the batch q72 scores") {
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamOps.scoreStream(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("s09_out")
      .outputMode(OutputMode.Append).start()
    try {
      val docs = graft.sources.Tables.documents(spark, sfSmoke)
        .select("doc_id", "text").limit(100)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      input.addData(docs.toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("s09_out")
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
      val batch = SparkEntry.queries("q72_batch_inference")(spark, sfSmoke)
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
      assert(streamed.size == docs.length)
      streamed.foreach { case (id, v) => assert(batch(id) == v, s"doc $id") }
    } finally q.stop()
  }

  test("s10 snapshot maintenance upserts each batch with latest-wins") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString
    val input = MemoryStream[(Long, String, Long)](spark)
    val q = StreamOps.snapshotMaintain(
      input.toDF().toDF("doc_id", "text", "version"), dir)
    def snapshot(): Map[Long, (String, Long)] = {
      val v = StreamOps.latestSnapshot(spark, dir).get
      spark.read.parquet(s"$dir/$v").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    }
    try {
      input.addData((1L, "one v1", 1L), (2L, "two v1", 1L))
      q.processAllAvailable()
      assert(snapshot() == Map(1L -> ("one v1", 1L), 2L -> ("two v1", 1L)))
      // batch 2: update doc 1, insert doc 3; doc 2 untouched
      input.addData((1L, "one v2", 2L), (3L, "three v1", 2L))
      q.processAllAvailable()
      assert(snapshot() == Map(
        1L -> ("one v2", 2L), 2L -> ("two v1", 1L), 3L -> ("three v1", 2L)))
      // stale replay inside one batch: higher version wins regardless of order
      input.addData((2L, "two v9", 9L), (2L, "two v3", 3L))
      q.processAllAvailable()
      assert(snapshot()(2L) == ("two v9", 9L))
    } finally q.stop()
  }

  test("s11 incremental index deltas merge to exactly the batch q56 index") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamOps.indexDeltas(input.toDF().toDF("doc_id", "text"), dir)
    try {
      // the full sf0.001 documents table streamed in 3 arbitrary slices —
      // the merged view must not depend on how ingest was batched
      val docs = graft.sources.Tables.documents(spark, sfSmoke)
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      docs.grouped(docs.length / 3 + 1).foreach { slice =>
        input.addData(slice.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val merged = StreamOps.mergedIndex(spark, dir)
      .select(col("token"), col("df"),
        concat_ws(",", transform(col("postings"), x => x.cast("string"))).as("postings"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val batch = SparkEntry.queries("q56_inverted_index")(spark, sfSmoke)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(merged == batch)
    // replay idempotence: deltas are _batch-partitioned, so a re-write of
    // one batch partition cannot duplicate df contributions
    assert(spark.read.parquet(s"$dir/deltas")
      .groupBy(col("_batch")).count().count() == 3)
    // bounded-merge lock (r3 verdict item 4): the merge must aggregate
    // postings through the constant-state BoundedHead (each delta's list
    // pre-sliced map-side), NOT collect every delta's full postings and
    // slice after — that state grows with ingest history for hot tokens.
    val plan = StreamOps.mergedIndex(spark, dir).queryExecution.executedPlan.toString
    assert(!plan.contains("collect_list") && !plan.contains("flatten"),
      s"merge plan regressed to unbounded collect_list+flatten:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"expected the typed BoundedHead aggregate in the merge plan:\n$plan")
  }

  test("s13 sliding windows over the file source match batch q51 (closed windows)") {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt13").toString
    val streamDir = java.nio.file.Files.createTempDirectory("graft_events13")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfSmoke/events.parquet"),
      streamDir.resolve("part-00000.parquet"))
    val q = StreamOps.slidingCounts(StreamOps.eventsFileStream(spark, streamDir.toString))
      .writeStream.format("memory").queryName("s13_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("s13_out").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    // append emits only watermark-closed windows: window end (start + 2h)
    // at or before max ts - 10 min
    val batch = SparkEntry.queries("q51_hopping_window")(spark, sfSmoke).collect()
    val maxTs = graft.sources.Tables.events(spark, sfSmoke)
      .agg(max(col("ts"))).head().getTimestamp(0)
    val cutoffMs = maxTs.getTime - 10 * 60 * 1000
    val closed = batch.filter(_.getTimestamp(0).getTime + 2 * 3600000 <= cutoffMs)
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == closed)
    assert(streamed.nonEmpty)
  }

  test("s12 streaming quota sampler converges to exactly the batch q52 sample") {
    val input = MemoryStream[(Long, String)](spark)
    val out = StreamOps.quotaSampleStream(input.toDS(), 20)
    val q = out.writeStream.format("memory").queryName("s12out")
      .outputMode("update").start()
    try {
      // the full sf0.001 (doc_id, lang) relation in 3 arbitrary slices —
      // the final sample must not depend on ingest batching
      val docs = graft.sources.Tables.documents(spark, sfSmoke)
        .select("doc_id", "lang").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      docs.grouped(docs.length / 3 + 1).foreach { slice =>
        input.addData(slice.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    // latest version per stratum = the converged sample
    val updates = spark.table("s12out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2).toSet))
    val got = updates.groupBy(_._1).map { case (lang, rows) =>
      lang -> rows.maxBy(_._2)._3
    }
    val want = SparkEntry.queries("q52_quota_sample")(spark, sfSmoke)
      .collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).map { case (lang, rows) => lang -> rows.map(_._2).toSet }
    assert(got == want)
    // bounded-state sanity: no emitted sample ever exceeded the quota
    assert(updates.forall(_._3.size <= 20))
  }

  test("s14 streaming funnel converges to exactly the batch q93 result") {
    val input = MemoryStream[(Long, Long, String)](spark)
    val out = StreamOps.funnelStream(input.toDS())
    val q = out.writeStream.format("memory").queryName("s14out")
      .outputMode("update").start()
    try {
      // the full event log in 3 slices, fed in REVERSED order — the
      // fixpoint must survive out-of-order arrival (late signups must
      // re-qualify earlier purchases)
      val evs = graft.sources.Tables.events(spark, sfSmoke)
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .reverse
      evs.grouped(evs.length / 3 + 1).foreach { slice =>
        input.addData(slice.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("s14out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .groupBy(_._1).map { case (u, rows) =>
        val last = rows.maxBy(_._2)
        u -> (last._3, last._4, last._5)
      }
    val want = SparkEntry.queries("q93_event_funnel")(spark, sfSmoke)
      .select(col("user_id"), unix_micros(col("signup_ts")),
        unix_micros(col("first_purchase_ts")), col("converted_7d"))
      .collect().map { r =>
        r.getLong(0) -> ((r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))
      }.toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("s15 streaming incremental dedup converges to exactly batch q100") {
    val dir = java.nio.file.Files.createTempDirectory("s15").toString
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
      .select("doc_id", "text")
    // standing corpus index: everything that is NOT the incoming batch
    graft.operators.CorpusOps
      .minhashBands(docs.filter(col("doc_id") % 10 =!= 7), "doc_id", "text")
      .withColumn("_batch", lit(-1L))
      .write.partitionBy("_batch").parquet(s"$dir/index")
    // the incoming batch (q100's doc_id % 10 = 7 cohort) in 3 slices
    val incoming = docs.filter(col("doc_id") % 10 === 7)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamOps.incrementalDedupStream(
      input.toDF().toDF("doc_id", "text"), s"$dir/index", s"$dir/out")
    try {
      incoming.grouped(incoming.length / 3 + 1).foreach { slice =>
        input.addData(slice.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.read.parquet(s"$dir/out/pairs")
      .select("doc1", "doc2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = SparkEntry.queries("q100_incremental_dedup")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted == want.sorted)
    // each unordered pair emitted exactly once across all batches
    assert(got.distinct.length == got.length)
  }

  /** Crash-replay injection (r5 verdict item 3): kill the query inside
    * the classic failure window — sink output committed, streaming
    * checkpoint commit LOST — by deleting the newest `commits/N` file,
    * then restart over the same output dir. Spark re-runs batch N with
    * the same batchId and the same input files; the s10/s15 replay
    * contracts (`_SUCCESS`-guarded skip, `_batch` dynamic partition
    * overwrite) must absorb the duplicate execution byte-identically.
    * A file source (not MemoryStream) so the replayed batch really
    * re-reads its recorded offsets across the restart. */
  /** Write `df` as ONE flat parquet file `<dir>/<name>.parquet` — the
    * shape a streaming file source ingests (a .write.parquet output
    * SUBDIRECTORY is not a new source file). */
  private def feedFile(df: org.apache.spark.sql.DataFrame, dir: String,
      name: String): Unit = {
    val tmp = java.nio.file.Files
      .createTempDirectory(s"feed_$name").toString
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/$name.parquet"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  private def dropLastCommit(ckptDir: String): Long = {
    val commits = new java.io.File(s"$ckptDir/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty, s"no commits under $ckptDir")
    val last = commits.last
    assert(last.delete(), s"could not delete $last")
    // the local ChecksumFs shadow too — a leftover .N.crc would fail the
    // re-commit's rename with FileAlreadyExists, which is local-fs
    // plumbing, not the failure mode under test
    val crc = new java.io.File(last.getParentFile, s".${last.getName}.crc")
    if (crc.exists()) crc.delete()
    last.getName.toLong
  }

  test("s10 snapshot maintenance survives a crash-replay of its last batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap_crash").toString
    val in = s"$dir/in"
    def feed(rows: Seq[(Long, String, Long)], file: String): Unit =
      feedFile(rows.toDF("doc_id", "text", "version"), in, file)
    def snapshot(): Map[Long, (String, Long)] = {
      val v = StreamOps.latestSnapshot(spark, dir).get
      spark.read.parquet(s"$dir/$v").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    }
    def start() = StreamOps.snapshotMaintain(
      spark.readStream
        .schema("doc_id LONG, text STRING, version LONG")
        .option("maxFilesPerTrigger", "1").parquet(in), dir)
    feed(Seq((1L, "one v1", 1L), (2L, "two v1", 1L)), "f0")
    val q1 = start()
    try {
      q1.processAllAvailable()
      feed(Seq((1L, "one v2", 2L), (3L, "three v1", 2L)), "f1")
      q1.processAllAvailable()
    } finally q1.stop()
    val before = snapshot()
    assert(before == Map(1L -> ("one v2", 2L), 2L -> ("two v1", 1L),
      3L -> ("three v1", 2L)))
    // crash window: snapshot for the last batch committed, checkpoint
    // commit lost
    dropLastCommit(s"$dir/_ckpt")
    val q2 = start()
    try {
      q2.processAllAvailable() // replays the last batch, same batchId
      assert(snapshot() == before) // replay guard: skipped, not re-merged
      // and the stream still makes progress afterwards
      feed(Seq((2L, "two v9", 9L)), "f2")
      q2.processAllAvailable()
      assert(snapshot() == before + (2L -> ("two v9", 9L)))
    } finally q2.stop()
  }

  test("s15 incremental dedup emits no duplicate pairs across a crash-replay") {
    val dir = java.nio.file.Files.createTempDirectory("s15_crash").toString
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
      .select("doc_id", "text")
    graft.operators.CorpusOps
      .minhashBands(docs.filter(col("doc_id") % 10 =!= 7), "doc_id", "text")
      .withColumn("_batch", lit(-1L))
      .write.partitionBy("_batch").parquet(s"$dir/index")
    val incoming = docs.filter(col("doc_id") % 10 === 7)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val in = s"$dir/in"
    val slices = incoming.grouped(incoming.length / 3 + 1).toSeq
    def feed(i: Int): Unit =
      feedFile(slices(i).toSeq.toDF("doc_id", "text"), in, s"f$i")
    def start() = StreamOps.incrementalDedupStream(
      spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(in),
      s"$dir/index", s"$dir/out")
    feed(0)
    val q1 = start()
    try { q1.processAllAvailable(); feed(1); q1.processAllAvailable() }
    finally q1.stop()
    // crash window: bands appended + pairs written for batch 1, but the
    // checkpoint commit was lost — batch 1 will re-run on restart and
    // must overwrite ITS OWN band/pair partitions, not append duplicates
    dropLastCommit(s"$dir/out/_ckpt")
    val q2 = start()
    try { q2.processAllAvailable(); feed(2); q2.processAllAvailable() }
    finally q2.stop()
    val got = spark.read.parquet(s"$dir/out/pairs")
      .select("doc1", "doc2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = SparkEntry.queries("q100_incremental_dedup")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted == want.sorted) // replay changed nothing
    assert(got.distinct.length == got.length) // and duplicated nothing
    // the standing index holds each batch's bands exactly once too
    val bandDup = spark.read.parquet(s"$dir/index")
      .groupBy(col("doc_id"), col("band"), col("bh")).count()
      .filter(col("count") > 1).count()
    assert(bandDup == 0L)
  }

  /** Crash-replay for the remaining stateful/foreachBatch streams (r6
    * verdict item 4 — s10/s15 proved the pattern; s06/s08 share the
    * `_batch` dynamic-overwrite sink contract, s12/s14/s16 are
    * flatMapGroupsWithState ops whose replayed batch reloads the
    * pre-batch state version and must re-emit byte-identically). Each
    * test kills inside the classic window — output committed, streaming
    * checkpoint commit LOST — restarts, and asserts replay is a no-op
    * and the stream still converges to the batch twin. */

  /** The documented consumer sink for update-mode stateful ops (the
    * s10/s12 upsert contract): every emission lands in its `_batch`
    * partition with dynamic overwrite, so a replayed micro-batch
    * overwrites its own rows instead of duplicating them. */
  private def updateSink(ds: org.apache.spark.sql.Dataset[_], outDir: String) =
    ds.toDF().writeStream
      .option("checkpointLocation", s"$outDir/_ckpt")
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        batch.withColumn("_batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch").parquet(s"$outDir/rows")
      }
      .start()

  test("s06 split router replays a lost batch without duplicating any doc") {
    val dir = java.nio.file.Files.createTempDirectory("s06_crash").toString
    val in = s"$dir/in"
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val slices = docs.grouped(docs.length / 3 + 1).toSeq
    def feed(i: Int): Unit =
      feedFile(slices(i).toSeq.toDF("doc_id", "text"), in, s"f$i")
    def start() = StreamOps.splitRouter(
      spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(in), s"$dir/route")
    feed(0)
    val q1 = start()
    try { q1.processAllAvailable(); feed(1); q1.processAllAvailable() }
    finally q1.stop()
    dropLastCommit(s"$dir/route/_ckpt")
    val q2 = start()
    try { q2.processAllAvailable(); feed(2); q2.processAllAvailable() }
    finally q2.stop()
    val routed = Seq("train", "val", "test").flatMap { sp =>
      spark.read.parquet(s"$dir/route/$sp").select("doc_id")
        .collect().map(r => sp -> r.getLong(0))
    }
    // the replayed batch overwrote its own partitions: every fed doc
    // routed exactly once, none lost, none duplicated
    assert(routed.map(_._2).sorted == docs.map(_._1).sorted.toSeq)
    // and routing still matches the deterministic batch assignment
    val want = graft.operators.CorpusOps
      .withSplit(graft.sources.Tables.documents(spark, sfSmoke), "text")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    routed.foreach { case (sp, id) => assert(want(id) == sp, s"doc $id") }
  }

  test("s08 decontamination replays a lost batch without duplicating verdicts") {
    val dir = java.nio.file.Files.createTempDirectory("s08_crash").toString
    val in = s"$dir/in"
    val testSet = StreamOps.testShingleSet(spark, sfSmoke).persist()
    val h = graft.functions.TextOps.contentSplitHash(col("text"))
    val train = graft.sources.Tables.documents(spark, sfSmoke)
      .filter(h < 80).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val slices = train.grouped(train.length / 3 + 1).toSeq
    def feed(i: Int): Unit =
      feedFile(slices(i).toSeq.toDF("doc_id", "text"), in, s"f$i")
    def start() = StreamOps.decontaminateStream(
      spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(in), testSet, dir)
    try {
      feed(0)
      val q1 = start()
      try { q1.processAllAvailable(); feed(1); q1.processAllAvailable() }
      finally q1.stop()
      dropLastCommit(s"$dir/_ckpt")
      val q2 = start()
      try { q2.processAllAvailable(); feed(2); q2.processAllAvailable() }
      finally q2.stop()
      val flagged = spark.read.parquet(s"$dir/flagged")
        .select("doc_id", "n_shared").collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      val clean = spark.read.parquet(s"$dir/clean")
        .select("doc_id").collect().map(_.getLong(0))
      // partition of the fed set — replay duplicated no verdict
      assert((flagged.map(_._1) ++ clean).sorted.toSeq ==
        train.map(_._1).sorted.toSeq)
      // and the flagged set still matches batch q68 exactly
      val batch = SparkEntry.queries("q68_decontaminate")(spark, sfSmoke)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(flagged.toMap == batch)
    } finally { testSet.unpersist(); () }
  }

  test("s12 quota sampler crash-replay re-emits identical versions, converges to q52") {
    val dir = java.nio.file.Files.createTempDirectory("s12_crash").toString
    val in = s"$dir/in"
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val slices = docs.grouped(docs.length / 3 + 1).toSeq
    def feed(i: Int): Unit =
      feedFile(slices(i).toSeq.toDF("doc_id", "lang"), in, s"f$i")
    def start() = updateSink(StreamOps.quotaSampleStream(
      spark.readStream.schema("doc_id LONG, lang STRING")
        .option("maxFilesPerTrigger", "1").parquet(in).as[(Long, String)], 20),
      s"$dir/out")
    feed(0)
    val q1 = start()
    try { q1.processAllAvailable(); feed(1); q1.processAllAvailable() }
    finally q1.stop()
    // crash window: batch 1's sink rows committed, checkpoint commit lost
    dropLastCommit(s"$dir/out/_ckpt")
    val q2 = start()
    try { q2.processAllAvailable(); feed(2); q2.processAllAvailable() }
    finally q2.stop()
    val rows = spark.read.parquet(s"$dir/out/rows")
      .select("stratum", "version", "doc_ids").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2).toSet))
    // replay determinism: one distinct sample per (stratum, version) —
    // the replayed batch reloaded the pre-batch state and re-emitted
    // byte-identical rows into its own overwritten partition
    rows.groupBy(r => (r._1, r._2)).foreach { case (k, vs) =>
      assert(vs.map(_._3).distinct.length == 1, s"divergent replay at $k")
    }
    val got = rows.groupBy(_._1).map { case (lang, rs) => lang -> rs.maxBy(_._2)._3 }
    val want = SparkEntry.queries("q52_quota_sample")(spark, sfSmoke)
      .collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).map { case (lang, rs) => lang -> rs.map(_._2).toSet }
    assert(got == want)
  }

  test("s14 funnel crash-replay is a no-op and still converges to q93") {
    val dir = java.nio.file.Files.createTempDirectory("s14_crash").toString
    val in = s"$dir/in"
    val evs = graft.sources.Tables.events(spark, sfSmoke)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .reverse
    val slices = evs.grouped(evs.length / 3 + 1).toSeq
    def feed(i: Int): Unit =
      feedFile(slices(i).toSeq.toDF("user_id", "us", "event_type"), in, s"f$i")
    def start() = updateSink(StreamOps.funnelStream(
      spark.readStream.schema("user_id LONG, us LONG, event_type STRING")
        .option("maxFilesPerTrigger", "1").parquet(in).as[(Long, Long, String)]),
      s"$dir/out")
    feed(0)
    val q1 = start()
    try { q1.processAllAvailable(); feed(1); q1.processAllAvailable() }
    finally q1.stop()
    dropLastCommit(s"$dir/out/_ckpt")
    val q2 = start()
    try { q2.processAllAvailable(); feed(2); q2.processAllAvailable() }
    finally q2.stop()
    val rows = spark.read.parquet(s"$dir/out/rows")
      .select("user_id", "version", "signup_us", "first_purchase_us", "converted_7d")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    rows.groupBy(r => (r._1, r._2)).foreach { case (k, vs) =>
      assert(vs.map(v => (v._3, v._4, v._5)).distinct.length == 1,
        s"divergent replay at $k")
    }
    val got = rows.groupBy(_._1).map { case (u, rs) =>
      val last = rs.maxBy(_._2); u -> ((last._3, last._4, last._5))
    }
    val want = SparkEntry.queries("q93_event_funnel")(spark, sfSmoke)
      .select(col("user_id"), unix_micros(col("signup_ts")),
        unix_micros(col("first_purchase_ts")), col("converted_7d"))
      .collect().map { r =>
        r.getLong(0) -> ((r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))
      }.toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("s16 KMV sketch crash-replay is a no-op and still matches q109") {
    val dir = java.nio.file.Files.createTempDirectory("s16_crash").toString
    val in = s"$dir/in"
    val hashes = graft.sources.Tables.documents(spark, sfSmoke)
      .selectExpr("source", "explode(split(text, ' ')) AS tok")
      .select(col("source"), graft.functions.TextOps.shingleHash60(col("tok")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1))).reverse
    val slices = hashes.grouped(hashes.length / 3 + 1).toSeq
    def feed(i: Int): Unit =
      feedFile(slices(i).toSeq.toDF("source", "h"), in, s"f$i")
    def start() = updateSink(StreamOps.kmvStream(
      spark.readStream.schema("source STRING, h LONG")
        .option("maxFilesPerTrigger", "1").parquet(in).as[(String, Long)], 256),
      s"$dir/out")
    feed(0)
    val q1 = start()
    try { q1.processAllAvailable(); feed(1); q1.processAllAvailable() }
    finally q1.stop()
    dropLastCommit(s"$dir/out/_ckpt")
    val q2 = start()
    try { q2.processAllAvailable(); feed(2); q2.processAllAvailable() }
    finally q2.stop()
    val rows = spark.read.parquet(s"$dir/out/rows")
      .select("source", "version", "n_heads", "est").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    rows.groupBy(r => (r._1, r._2)).foreach { case (k, vs) =>
      assert(vs.map(v => (v._3, v._4)).distinct.length == 1,
        s"divergent replay at $k")
    }
    val got = rows.groupBy(_._1).map { case (src, rs) =>
      val last = rs.maxBy(_._2); src -> ((last._3, last._4))
    }
    val want = SparkEntry.queries("q109_kmv_distinct")(spark, sfSmoke)
      .collect().map { r =>
        r.getString(0) -> ((math.min(r.getLong(1), 256L).toInt, r.getDouble(2)))
      }.toMap
    assert(got == want)
  }

  test("s18 Misra-Gries state survives checkpoint restart; replay is a no-op") {
    // the real target: MgBuf (two parallel arrays) round-tripping through
    // the state store across a crash — a broken buffer encoder would
    // corrupt counts on restore, and a replayed batch against restored
    // state must reproduce the pre-crash snapshot bit-for-bit
    val m = 15
    val dir = java.nio.file.Files.createTempDirectory("s18_crash").toString
    val in = s"$dir/in"
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val slices = docs.grouped(docs.length / 3 + 1).toSeq
    def feed(i: Int): Unit =
      feedFile(slices(i).toSeq.toDF("doc_id", "text"), in, s"f$i")
    def start(out: String) = updateSink(StreamOps.heavyHittersStream(
      spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(in), "text", m), out)
    def snap(out: String, batch: Long): Map[String, Long] =
      spark.read.parquet(s"$out/rows").filter(col("_batch") === batch)
        .select(explode(col("mg")).as(Seq("k", "cnt")))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    feed(0)
    val q1 = start(s"$dir/out")
    try { q1.processAllAvailable(); feed(1); q1.processAllAvailable() }
    finally q1.stop()
    val preCrash = snap(s"$dir/out", 1)
    dropLastCommit(s"$dir/out/_ckpt")
    val q2 = start(s"$dir/out")
    try { q2.processAllAvailable(); feed(2); q2.processAllAvailable() }
    finally q2.stop()
    assert(snap(s"$dir/out", 1) == preCrash, "replayed batch diverged")
    // final snapshot: capacity bound + the heavy-hitter guarantee over
    // EVERYTHING fed, crash notwithstanding
    val fin = snap(s"$dir/out", 2)
    assert(fin.size <= m)
    val toks = docs.flatMap(_._2.split(" "))
    toks.groupBy(identity).view.mapValues(_.size.toLong).foreach {
      case (k, c) => if (c > toks.length / (m + 1))
        assert(fin.contains(k), s"guaranteed-heavy '$k' lost across restart")
    }
    // and a no-crash control over the same three files lands on the
    // exact same summary
    val q3 = start(s"$dir/ctrl")
    try q3.processAllAvailable() finally q3.stop()
    assert(snap(s"$dir/ctrl", 2) == fin, "crash run diverged from control")
  }

  test("s15 evaluates a published stop list ONCE, not per micro-batch") {
    // the "zero per-batch corpus work" contract: incrementalDedupStream
    // materializes the captured stop-shingle DataFrame before start();
    // a foreachBatch closure re-evaluates captured DataFrames per batch,
    // so a regression here re-runs the corpus stop-list aggregation on
    // every micro-batch. The accumulator counts source evaluations.
    val dir = java.nio.file.Files.createTempDirectory("s15_stoplist").toString
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
      .select("doc_id", "text")
    graft.operators.CorpusOps
      .minhashBands(docs.filter(col("doc_id") % 10 =!= 7), "doc_id", "text")
      .withColumn("_batch", lit(-1L))
      .write.partitionBy("_batch").parquet(s"$dir/index")
    val evals = spark.sparkContext.longAccumulator("stop_list_evals")
    val stop = spark.range(0, 1, 1, 1)
      .mapPartitions { it => evals.add(1); it }
      .toDF("sgh") // sgh=0: matches no real shingle hash, changes nothing
    val incoming = docs.filter(col("doc_id") % 10 === 7)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamOps.incrementalDedupStream(
      input.toDF().toDF("doc_id", "text"), s"$dir/index", s"$dir/out",
      stopShingles = Some(stop))
    try {
      incoming.grouped(incoming.length / 3 + 1).foreach { slice =>
        input.addData(slice.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    assert(evals.value == 1L,
      s"stop list evaluated ${evals.value} times across 3 micro-batches")
    // and the no-op stop list left the pair set identical to batch q100
    val got = spark.read.parquet(s"$dir/out/pairs")
      .select("doc1", "doc2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = SparkEntry.queries("q100_incremental_dedup")(spark, sfSmoke)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.sorted == want.sorted)
  }

  test("s16 streaming KMV sketch converges to exactly the batch q109 estimate") {
    val input = MemoryStream[(String, Long)](spark)
    val out = StreamOps.kmvStream(input.toDS(), 256)
    val q = out.writeStream.format("memory").queryName("s16out")
      .outputMode("update").start()
    try {
      // the full (source, token-hash) relation, shuffled slices — the
      // k-smallest fixpoint must not depend on arrival order
      val hashes = graft.sources.Tables.documents(spark, sfSmoke)
        .selectExpr("source", "explode(split(text, ' ')) AS tok")
        .select(col("source"),
          graft.functions.TextOps.shingleHash60(col("tok")).as("h"))
        .collect().map(r => (r.getString(0), r.getLong(1))).reverse
      hashes.grouped(hashes.length / 3 + 1).foreach { slice =>
        input.addData(slice.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("s16out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .groupBy(_._1).map { case (src, rows) =>
        val last = rows.maxBy(_._2); src -> ((last._3, last._4))
      }
    val want = SparkEntry.queries("q109_kmv_distinct")(spark, sfSmoke)
      .collect().map { r =>
        val exact = r.getLong(1)
        r.getString(0) -> ((math.min(exact, 256L).toInt, r.getDouble(2)))
      }.toMap
    assert(got == want)
    // state bound: no emitted sketch ever exceeded k heads
    assert(spark.table("s16out").collect().forall(_.getInt(2) <= 256))
  }

  test("s35 streaming HLL registers converge to exactly the batch q221 sketch") {
    val input = MemoryStream[(String, Long)](spark)
    val out = StreamOps.hllSketchStream(input.toDS())
    val q = out.writeStream.format("memory").queryName("s35out")
      .outputMode("update").start()
    try {
      // the full (event_type, user_id) relation, reversed slices — the
      // register max-fixpoint must not depend on arrival order
      val keys = graft.sources.Tables.events(spark, sfSmoke)
        .select(col("event_type"), col("user_id"))
        .collect().map(r => (r.getString(0), r.getLong(1))).reverse
      keys.grouped(keys.length / 3 + 1).foreach { slice =>
        input.addData(slice.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("s35out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .groupBy(_._1).map { case (grp, rows) =>
        val last = rows.maxBy(_._2); grp -> ((last._3, last._4, last._5))
      }
    val want = SparkEntry.queries("q221_hll_audit")(spark, sfSmoke)
      .collect().map { r =>
        // (event_type, .., hll_est, .., zeros, max_rho, m)
        r.getString(0) -> ((r.getLong(2), r.getLong(4), r.getLong(5)))
      }.toMap
    assert(got == want)
  }

  test("s35 HLL crash-replay converges to the same registers (versioned state)") {
    val dir = java.nio.file.Files.createTempDirectory("s35_crash").toString
    val in = s"$dir/in"
    val keys = graft.sources.Tables.events(spark, sfSmoke)
      .select(col("event_type"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val slices = keys.grouped(keys.length / 3 + 1).toSeq
    def feed(i: Int): Unit =
      feedFile(slices(i).toSeq.toDF("grp", "k"), in, s"f$i")
    def start() = updateSink(StreamOps.hllSketchStream(
      spark.readStream.schema("grp STRING, k LONG")
        .option("maxFilesPerTrigger", "1").parquet(in).as[(String, Long)]),
      s"$dir/out")
    feed(0)
    val q1 = start()
    try { q1.processAllAvailable(); feed(1); q1.processAllAvailable() }
    finally q1.stop()
    dropLastCommit(s"$dir/out/_ckpt")
    val q2 = start()
    try { q2.processAllAvailable(); feed(2); q2.processAllAvailable() }
    finally q2.stop()
    val rows = spark.read.parquet(s"$dir/out/rows")
      .select("grp", "version", "est", "zeros", "max_rho").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // a replayed version must reproduce its pre-crash emission exactly
    rows.groupBy(r => (r._1, r._2)).foreach { case (k, vs) =>
      assert(vs.map(v => (v._3, v._4, v._5)).distinct.length == 1,
        s"divergent replay at $k")
    }
    val got = rows.groupBy(_._1).map { case (grp, rs) =>
      val last = rs.maxBy(_._2); grp -> ((last._3, last._4, last._5))
    }
    val want = SparkEntry.queries("q221_hll_audit")(spark, sfSmoke)
      .collect().map { r =>
        r.getString(0) -> ((r.getLong(2), r.getLong(4), r.getLong(5)))
      }.toMap
    assert(got == want)
  }

  /** q225's deletion rule replayed in driver Scala: per-file deleted-row
    * counts under the md5-60 "key:del" mod-20 sample. */
  private def q225FileDels(): Map[Long, Long] =
    graft.sources.Tables.orders(spark, sfSmoke)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
      .filter(k => java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$k:del".getBytes("UTF-8")).map("%02x".format(_))
          .mkString.substring(0, 15), 16) % 20 == 0)
      .groupBy(_ / graft.operators.Wave47Queries.KeysPerFile)
      .map { case (f, ks) => f -> ks.length.toLong }

  test("s36 deletion vectors converge to the batch q225 deletion census") {
    val input = MemoryStream[Long](spark)
    val out = StreamOps.deletionVectorStream(input.toDS())
    val q = out.writeStream.format("memory").queryName("s36out")
      .outputMode("update").start()
    val want = q225FileDels()
    try {
      // every delete twice, reversed slices: bit-set idempotence means
      // the drained vector must ignore both replays and arrival order
      val dels = want.keySet.toSeq.sorted.reverse.flatMap { f =>
        graft.sources.Tables.orders(spark, sfSmoke)
          .select(col("o_orderkey")).collect().map(_.getLong(0))
          .filter(k => k / graft.operators.Wave47Queries.KeysPerFile == f)
          .filter(k => java.lang.Long.parseLong(
            java.security.MessageDigest.getInstance("MD5")
              .digest(s"$k:del".getBytes("UTF-8")).map("%02x".format(_))
              .mkString.substring(0, 15), 16) % 20 == 0)
      }
      (dels ++ dels).grouped(dels.length / 2 + 1).foreach { slice =>
        input.addData(slice.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("s36out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).map { case (f, rows) => f -> rows.maxBy(_._2)._3 }
    assert(got == want)
    // counts only ever grow across versions (monotone bitmap)
    spark.table("s36out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).foreach { case (_, rows) =>
        val byV = rows.sortBy(_._2).map(_._3).toSeq
        assert(byV == byV.sorted, "rows_del not monotone in version")
      }
  }

  test("s36 crash-replay re-emits identical vectors (versioned state)") {
    val dir = java.nio.file.Files.createTempDirectory("s36_crash").toString
    val in = s"$dir/in"
    val want = q225FileDels()
    val dels = graft.sources.Tables.orders(spark, sfSmoke)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
      .filter(k => java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$k:del".getBytes("UTF-8")).map("%02x".format(_))
          .mkString.substring(0, 15), 16) % 20 == 0)
    val slices = dels.grouped(dels.length / 3 + 1).toSeq
    def feed(i: Int): Unit =
      feedFile(slices(i).toSeq.toDF("k"), in, s"f$i")
    def start() = updateSink(StreamOps.deletionVectorStream(
      spark.readStream.schema("k LONG")
        .option("maxFilesPerTrigger", "1").parquet(in).as[Long]),
      s"$dir/out")
    feed(0)
    val q1 = start()
    try { q1.processAllAvailable(); feed(1); q1.processAllAvailable() }
    finally q1.stop()
    dropLastCommit(s"$dir/out/_ckpt")
    val q2 = start()
    try { q2.processAllAvailable(); feed(2); q2.processAllAvailable() }
    finally q2.stop()
    val rows = spark.read.parquet(s"$dir/out/rows")
      .select("file_id", "version", "rows_del").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(r => (r._1, r._2)).foreach { case (k, vs) =>
      assert(vs.map(_._3).distinct.length == 1, s"divergent replay at $k")
    }
    val got = rows.groupBy(_._1).map { case (f, rs) =>
      f -> rs.maxBy(_._2)._3 }
    assert(got == want)
  }

  test("s37 streaming CDC chunks equal the batch kernel bit-for-bit") {
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamOps.cdcChunkStream(input.toDS())
      .writeStream.format("memory").queryName("s37out")
      .outputMode("append").start()
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    try {
      docs.grouped(docs.length / 3 + 1).foreach { slice =>
        input.addData(slice.toIndexedSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("s37out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    graft.functions.CdcChunks.register(spark)
    val want = graft.sources.Tables.documents(spark, sfSmoke)
      .select(col("doc_id"),
        explode(graft.functions.CdcChunks(col("text"))).as("c"))
      .select(col("doc_id"), col("c.bmod"), col("c.k"), col("c.l"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(got == want)
  }

  private def tusOf(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  test("s38 attribution emits once the watermark passes the purchase") {
    val input = MemoryStream[Ev](spark)
    val q = StreamOps.attributionStream(input.toDS())
      .writeStream.format("memory").queryName("s38_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(ev(1, 0), ev(2, 10),
        ev(3, 20, typ = "purchase", value = 5.0),
        ev(4, 25, typ = "purchase", value = 2.0),
        ev(5, 30, user = 9L, typ = "purchase", value = 1.0))
      q.processAllAvailable()
      // nothing can emit yet: the watermark has not passed any purchase
      assert(spark.table("s38_out").isEmpty)
      input.addData(ev(6, 1200, user = -1L, typ = "noop"))
      q.processAllAvailable()
      val rows = spark.table("s38_out").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]), r.getDouble(5))).toSet
      assert(rows == Set(
        (1L, 3L, Some(tusOf(ts(0))), Some(tusOf(ts(10))), 5.0),
        (1L, 4L, Some(tusOf(ts(0))), Some(tusOf(ts(10))), 2.0),
        (9L, 5L, None, None, 1.0)), rows.mkString(", "))
    } finally q.stop()
  }

  test("s38 drained attribution equals the batch q231 window relation") {
    val evs = graft.sources.Tables.events(spark, sfSmoke)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
      .sortBy(e => (tusOf(e.ts), e.event_id))
    val L = 7L * 86400L * 1000000L
    val clicksBy = evs.filter(_.event_type == "click")
      .groupBy(_.user_id).map { case (u, es) => u -> es.map(e => tusOf(e.ts)) }
    val want = evs.filter(_.event_type == "purchase").map { p =>
      val pt = tusOf(p.ts)
      val in = clicksBy.getOrElse(p.user_id, Array.empty[Long])
        .filter(c => c >= pt - L && c <= pt)
      (p.user_id, p.event_id, pt,
        if (in.isEmpty) None else Some(in.min),
        if (in.isEmpty) None else Some(in.max), p.value)
    }.toSet
    val input = MemoryStream[Ev](spark)
    val q = StreamOps.attributionStream(input.toDS())
      .writeStream.format("memory").queryName("s38_twin")
      .outputMode(OutputMode.Append).start()
    try {
      // time-ordered slices: by the time the watermark passes a purchase,
      // every lookback click has arrived — the op's stated contract
      evs.grouped(evs.length / 3 + 1).foreach { slice =>
        input.addData(slice.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val far = new Timestamp(evs.last.ts.getTime + 86400L * 1000L)
      input.addData(Ev(-1L, far, -1L, "noop", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("s38_twin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getDouble(5))).toSet
    assert(got == want)
  }

  test("s38 crash-replay re-emits identical attributions (versioned state)") {
    val dir = java.nio.file.Files.createTempDirectory("s38_crash").toString
    val in = s"$dir/in"
    val evs = graft.sources.Tables.events(spark, sfSmoke)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
      .sortBy(e => (tusOf(e._2), e._1))
    val far = new Timestamp(evs.last._2.getTime + 86400L * 1000L)
    val slices = evs.grouped(evs.length / 2 + 1).toSeq :+
      Array((-1L, far, -1L, "noop", 0.0))
    def feed(i: Int): Unit = feedFile(
      slices(i).toSeq.toDF("event_id", "ts", "user_id", "event_type", "value"),
      in, s"f$i")
    // append-mode sink (attributionStream is an Append fMGWS op;
    // updateSink's update mode is rejected by the analyzer)
    def appendSink(ds: org.apache.spark.sql.Dataset[_], outDir: String) =
      ds.toDF().writeStream
        .option("checkpointLocation", s"$outDir/_ckpt")
        .outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            batchId: Long) =>
          batch.withColumn("_batch", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch").parquet(s"$outDir/rows")
        }
        .start()
    def start() = appendSink(StreamOps.attributionStream(
      spark.readStream
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
        .option("maxFilesPerTrigger", "1").parquet(in).as[Ev]),
      s"$dir/out")
    feed(0)
    val q1 = start()
    try { q1.processAllAvailable(); feed(1); q1.processAllAvailable() }
    finally q1.stop()
    dropLastCommit(s"$dir/out/_ckpt")
    val q2 = start()
    try { q2.processAllAvailable(); feed(2); q2.processAllAvailable() }
    finally q2.stop()
    val rows = spark.read.parquet(s"$dir/out/rows")
      .select("user_id", "event_id", "p_tus", "first_click", "last_click")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    // exactly one attribution per purchase, crash or no crash
    rows.groupBy(_._2).foreach { case (id, vs) =>
      assert(vs.distinct.length == 1, s"divergent replay for purchase $id")
    }
    val purchases = evs.count(_._4 == "purchase")
    assert(rows.map(_._2).distinct.length == purchases,
      s"${rows.map(_._2).distinct.length} attributed != $purchases purchases")
  }

  test("streaming sinks -> Io.compact -> latestSnapshot: end-to-end maintenance") {
    import graft.sources.Io
    def files(p: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(p)).filter(_.getName.endsWith(".parquet"))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_maint").toString
    // 1) fragment scale: three router micro-batches, each fanning out over
    //    8 shuffle partitions -> dozens of small files under train/
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamOps.splitRouter(input.toDF().toDF("doc_id", "text"), s"$dir/route")
    try {
      (0 until 3).foreach { b =>
        // several addData blocks per micro-batch: each block is its own
        // input partition, so every _batch partition lands several files
        // — the fragmentation profile a real per-core streaming sink has
        (0 until 4).foreach { blk =>
          input.addData((1 to 15).map(i => (b * 100 + blk * 20 + i).toLong ->
            s"maintenance doc ${b * 100 + blk * 20 + i} body ${"w " * (i % 17)}"): _*)
        }
        q.processAllAvailable()
      }
    } finally q.stop()
    // partition-column type inference reads _batch back as int — pin it
    def trainRows(p: String): Set[(Long, String, Long)] =
      spark.read.parquet(p)
        .select(col("doc_id"), col("text"), col("_batch").cast("long"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val before = trainRows(s"$dir/route/train")
    val fragCount = files(s"$dir/route/train").size
    assert(fragCount > 3, s"expected a fragmented sink, got $fragCount files")
    assert(new java.io.File(s"$dir/route/train").listFiles()
      .count(_.getName.startsWith("_batch=")) == 3)
    // 2) compact the partitioned streaming sink, preserving the _batch layout
    Io.compact(spark, s"$dir/route/train", s"$dir/route/train_c",
      partitionCols = Seq("_batch"))
    assert(trainRows(s"$dir/route/train_c") == before)
    assert(files(s"$dir/route/train_c").size < fragCount)
    assert(new java.io.File(s"$dir/route/train_c").listFiles()
      .exists(_.getName.startsWith("_batch=")), "partition layout flattened")
    // 3) snapshot maintenance: compact the CURRENT committed snapshot into
    //    the next version — latestSnapshot must flip to the compacted copy
    //    (the _SUCCESS marker of the compaction write IS the commit) and
    //    readers must see identical rows
    val snapIn = MemoryStream[(Long, String, Long)](spark)
    val sq = StreamOps.snapshotMaintain(
      snapIn.toDF().toDF("doc_id", "text", "version"), s"$dir/snap")
    try {
      (1 to 3).foreach { b =>
        snapIn.addData((1 to 50).map(i => (i.toLong, s"doc $i v$b", b.toLong)): _*)
        sq.processAllAvailable()
      }
    } finally sq.stop()
    val cur = StreamOps.latestSnapshot(spark, s"$dir/snap").get
    val curId = cur.stripPrefix("snapshot_v").toLong
    val pre = spark.read.parquet(s"$dir/snap/$cur")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    Io.compact(spark, s"$dir/snap/$cur", s"$dir/snap/snapshot_v${curId + 1}")
    assert(StreamOps.latestSnapshot(spark, s"$dir/snap")
      .contains(s"snapshot_v${curId + 1}"))
    val post = spark.read.parquet(
      s"$dir/snap/${StreamOps.latestSnapshot(spark, s"$dir/snap").get}")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(post == pre)
    assert(files(s"$dir/snap/snapshot_v${curId + 1}").size
      <= files(s"$dir/snap/$cur").size)
  }

  test("s06 split router partitions the stream into train/val/test sinks") {
    val dir = java.nio.file.Files.createTempDirectory("graft_router").toString
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamOps.splitRouter(
      input.toDF().toDF("doc_id", "text"), dir)
    try {
      val docs = (1 to 60).map(i => i.toLong -> s"document number $i with body ${"x " * i}")
      input.addData(docs: _*)
      q.processAllAvailable()
      val back = Seq("train", "val", "test").map { sp =>
        sp -> spark.read.parquet(s"$dir/$sp").select("doc_id")
          .collect().map(_.getLong(0)).toSet
      }.toMap
      // the three sinks partition the input exactly
      assert(back.values.map(_.size).sum == 60)
      assert(back("train").size > back("val").size)
      // routing matches the batch q58 assignment (same content hash)
      val h = graft.functions.TextOps.contentSplitHash(col("text"))
      val expected = docs.toDF("doc_id", "text")
        .withColumn("split", when(h < 80, "train").when(h < 90, "val").otherwise("test"))
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
      back.foreach { case (sp, ids) =>
        ids.foreach(id => assert(expected(id) == sp, s"doc $id routed to $sp")) }
    } finally q.stop()
  }

  test("s19 drift monitor: zero PSI on reference-shaped windows, alarm on shift") {
    val ref = Seq.fill(8)(0.125)
    val input = MemoryStream[Ev](spark)
    val q = StreamOps.driftMonitor(input.toDF(), ref)
      .writeStream.format("memory").queryName("s19_out")
      .outputMode(OutputMode.Append).start()
    try {
      // hour 0: 80 events spread 10-per-bucket (exactly the reference);
      // hour 1: 80 events all in bucket 0 (a hard shift)
      val flat = (0 until 80).map(i =>
        ev(i, i % 60, value = i % 8 * 64.0 + 1.0))
      val spiked = (0 until 80).map(i => ev(100 + i, 60 + i % 60, value = 10.0))
      input.addData(flat ++ spiked: _*)
      q.processAllAvailable()
      input.addData(ev(999, 400))   // advance watermark, close both windows
      q.processAllAvailable()
      val rows = spark.table("s19_out").collect()
        .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
        .sortBy(_._1.getTime)
      assert(rows.length == 2, rows.mkString(", "))
      // driver-side PSI with the identical smoothing
      def psi(counts: Seq[Long]): Double = {
        val n = counts.sum
        counts.zip(ref).map { case (c, r) =>
          val p = (c + 0.5) / (n + 4.0)
          (p - math.max(r, 1e-4)) * math.log(p / math.max(r, 1e-4))
        }.sum
      }
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (w0, w1) = (rows(0), rows(1))
      assert(w0._2 == 80 && w1._2 == 80)
      assert(w0._3 == r6(psi(Seq.fill(8)(10L))), s"flat window psi ${w0._3}")
      assert(!w0._4, "reference-shaped window must not alarm")
      assert(w1._3 == r6(psi(80L +: Seq.fill(7)(0L))), s"spiked psi ${w1._3}")
      assert(w1._4, "shifted window must alarm")
      assert(w1._3 > 1.0 && w0._3 < 0.01)
    } finally q.stop()
  }

  test("s20 windowed percentile monitor matches a driver-side histogram estimate") {
    val input = MemoryStream[Ev](spark)
    val q = StreamOps.percentilesStream(input.toDF())
      .writeStream.format("memory").queryName("s20_out")
      .outputMode(OutputMode.Append).start()
    try {
      // hour 0: values 1..200 (deterministic spread over 25 buckets)
      val evs = (1 to 200).map(i => ev(i, i % 60, value = i.toDouble))
      input.addData(evs: _*)
      q.processAllAvailable()
      input.addData(ev(999, 400))   // close the window
      q.processAllAvailable()
      val rows = spark.table("s20_out").collect()
        .map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      assert(rows.length == 1, rows.mkString(", "))
      val (n, p50, p90, p99) = rows.head
      assert(n == 200)
      // driver-side: same 64x8 histogram, same crossing-bucket formula
      def est(p: Double): Double = {
        val c = Array.fill(64)(0L)
        (1 to 200).foreach(v => c(math.min(63, v / 8)) += 1)
        var cum = 0L
        val t = 200 * p
        val b = (0 until 64).indexWhere { i => cum += c(i); cum >= t && c(i) > 0 }
        val prefix = (0 until b).map(c).sum
        BigDecimal(b * 8.0 + 8.0 * (t - prefix) / c(b))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      assert(p50 == est(0.50), s"p50 $p50 != ${est(0.50)}")
      assert(p90 == est(0.90), s"p90 $p90 != ${est(0.90)}")
      assert(p99 == est(0.99), s"p99 $p99 != ${est(0.99)}")
      // estimates bracket the true percentiles within one bucket width
      assert(math.abs(p50 - 100.0) <= 8.0 && math.abs(p99 - 198.0) <= 8.0)
    } finally q.stop()
  }

  /** Crash-replay for the round-7 windowed monitors (s19/s20): both are
    * append-mode windowed aggregates whose sink is the built-in parquet
    * FileStreamSink — exactly-once by its _spark_metadata batch log. The
    * classic crash window (sink batch committed, checkpoint commit LOST)
    * must therefore replay as a metadata no-op: the re-run batch carries
    * the same batchId, the sink skips it, and readers see each closed
    * window exactly once. */
  private def windowedCrashReplay(tag: String,
      mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : Array[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.streaming.OutputMode
    val dir = java.nio.file.Files.createTempDirectory(s"${tag}_crash").toString
    val in = s"$dir/in"
    val schema = "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE"
    def start() = mk(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(in))
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append).start()
    // hour 0 under test; a far event closes it; another closes the far one
    feedFile((1 to 200).map(i => ev(i, i % 60, value = i.toDouble)).toDF(), in, "f0")
    val q1 = start()
    try {
      q1.processAllAvailable()
      feedFile(Seq(ev(900, 400, value = 1.0)).toDF(), in, "f1")
      q1.processAllAvailable()   // hour 0 closes and lands in the sink
    } finally q1.stop()
    dropLastCommit(s"$dir/ckpt")
    val q2 = start()
    try {
      q2.processAllAvailable()   // replays f1's batch: sink must skip it
      feedFile(Seq(ev(901, 800, value = 1.0)).toDF(), in, "f2")
      q2.processAllAvailable()
    } finally q2.stop()
    spark.read.parquet(s"$dir/out").collect()
  }

  test("s19 drift monitor crash-replay emits each closed window exactly once") {
    val rows = windowedCrashReplay("s19",
      df => StreamOps.driftMonitor(df, Seq.fill(8)(0.125)))
    val h0 = rows.filter(_.getTimestamp(0) == ts(0))
    assert(h0.length == 1, s"hour-0 window emitted ${h0.length} times")
    assert(h0.head.getLong(1) == 200)
    assert(rows.map(_.getTimestamp(0)).distinct.length == rows.length)
  }

  test("s20 percentile monitor crash-replay emits each closed window exactly once") {
    val rows = windowedCrashReplay("s20", StreamOps.percentilesStream)
    val h0 = rows.filter(_.getTimestamp(0) == ts(0))
    assert(h0.length == 1, s"hour-0 window emitted ${h0.length} times")
    val r = h0.head
    assert(r.getLong(1) == 200)
    // the replayed run must still carry the exact estimator values
    def est(p: Double): Double = {
      val c = Array.fill(64)(0L)
      (1 to 200).foreach(v => c(math.min(63, v / 8)) += 1)
      var cum = 0L
      val t = 200 * p
      val b = (0 until 64).indexWhere { i => cum += c(i); cum >= t && c(i) > 0 }
      val prefix = (0 until b).map(c).sum
      BigDecimal(b * 8.0 + 8.0 * (t - prefix) / c(b))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(r.getDouble(2) == est(0.50) && r.getDouble(3) == est(0.90)
      && r.getDouble(4) == est(0.99))
    assert(rows.map(_.getTimestamp(0)).distinct.length == rows.length)
  }

  test("s21 streaming checksum snapshot equals the batch q145 fingerprints") {
    val hashes = graft.sources.Tables.lineitem(spark, sfSmoke)
      .select(graft.functions.TextOps.shingleHash60(
        graft.operators.Wave12Queries.lineitemCanon).as("h"))
      .as[Long].collect()
    val input = MemoryStream[Long](spark)
    val q = StreamOps.checksumStream(input.toDF().toDF("h"))
      .writeStream.format("memory").queryName("s21_out")
      .outputMode(OutputMode.Complete).start()
    try {
      // arbitrary slicing must not matter (mergeable combiners)
      hashes.grouped(hashes.length / 3 + 1).foreach { slice =>
        input.addData(slice.toIndexedSeq: _*)
        q.processAllAvailable()
      }
      val snap = spark.table("s21_out").collect().head
      val want = SparkEntry.queries("q145_table_checksum")(spark, sfSmoke)
        .collect().head
      assert(snap.getLong(0) == want.getLong(0))
      // the fixed-width-string fingerprint contract, batch == stream
      assert(snap.getString(1) == want.getString(1))
      assert(snap.getString(2) == want.getString(2))
      assert(snap.getString(1).matches("[0-9a-f]{16}"))
      assert(snap.getString(2).matches("[0-9]{39}"))
    } finally q.stop()
  }

  /** The s22 fixture feed: sfSmoke events as CapEvent rows, globally
    * (ts, event_id)-sorted so time-ordered slices model the
    * replayable-log deployment the batch-equality contract assumes. */
  private def capEvents() = graft.sources.Tables.events(spark, sfSmoke)
    .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
      col("event_id"), col("event_type"), col("value"))
    .as[StreamOps.CapEvent].collect()
    .sortBy(e => (e.ts_us, e.event_id)).toSeq

  test("s22 contribution cap converges to the q153 kept set under slicing") {
    val dir = java.nio.file.Files.createTempDirectory("s22_conv").toString
    val in = s"$dir/in"
    val all = capEvents()
    val cap = graft.operators.Wave14Queries.ContributionCap
    // three time-ordered slices of deliberately unequal size
    val cuts = Seq(all.length / 5, all.length / 2, all.length)
    var prev = 0
    cuts.zipWithIndex.foreach { case (c, i) =>
      feedFile(all.slice(prev, c).toDF(), in, s"f$i"); prev = c
    }
    val q = updateSink(StreamOps.contributionCapStream(
      spark.readStream.schema(all.toDF().schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
        .as[StreamOps.CapEvent], cap), s"$dir/out")
    try q.processAllAvailable() finally q.stop()
    val admitted = spark.read.parquet(s"$dir/out/rows")
      .select("user_id", "event_id", "event_type", "value", "seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getInt(4)))
    // exactly-once: no event admitted twice
    assert(admitted.map(_._2).distinct.length == admitted.length)
    // per-user: seq is 1..n, n <= cap
    admitted.groupBy(_._1).foreach { case (u, rs) =>
      assert(rs.length <= cap, s"user $u over cap")
      assert(rs.map(_._5).sorted.toSeq == (1 to rs.length).toSeq, s"user $u seq")
    }
    // the drained kept set equals the batch twin's: first cap per user
    val want = all.groupBy(_.user_id).flatMap { case (_, es) =>
      es.sortBy(e => (e.ts_us, e.event_id)).take(cap)
    }.map(_.event_id).toSet
    assert(admitted.map(_._2).toSet == want)
    // and the per-type aggregate of the admitted stream equals q153
    val byType = admitted.groupBy(_._3).map { case (t, rs) =>
      t -> (rs.length.toLong,
        rs.map(r => BigDecimal(r._4).setScale(2, BigDecimal.RoundingMode.HALF_UP))
          .sum.toDouble)
    }
    SparkEntry.queries("q153_contribution_cap")(spark, sfSmoke).collect()
      .foreach { r =>
        val t = r.getString(0)
        assert(byType.get(t).map(_._1).getOrElse(0L) == r.getLong(2), s"n_capped($t)")
        if (r.getLong(2) > 0)
          assert(byType(t)._2 == r.getDouble(5), s"sum_capped($t)")
      }
  }

  test("s22 contribution cap crash-replay re-admits identically, never over-caps") {
    val dir = java.nio.file.Files.createTempDirectory("s22_crash").toString
    val in = s"$dir/in"
    val all = capEvents()
    val cap = graft.operators.Wave14Queries.ContributionCap
    val third = all.length / 3
    def feed(i: Int): Unit =
      feedFile(all.slice(i * third,
        if (i == 2) all.length else (i + 1) * third).toDF(), in, s"f$i")
    def start() = updateSink(StreamOps.contributionCapStream(
      spark.readStream.schema(all.toDF().schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
        .as[StreamOps.CapEvent], cap), s"$dir/out")
    feed(0)
    val q1 = start()
    try { q1.processAllAvailable(); feed(1); q1.processAllAvailable() }
    finally q1.stop()
    // crash window: batch 1's admissions committed to the sink, the
    // checkpoint commit lost — the restarted query replays batch 1
    dropLastCommit(s"$dir/out/_ckpt")
    val q2 = start()
    try { q2.processAllAvailable(); feed(2); q2.processAllAvailable() }
    finally q2.stop()
    val admitted = spark.read.parquet(s"$dir/out/rows")
      .select("user_id", "event_id", "seq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // replay determinism: each admitted event carries ONE seq, appears once
    admitted.groupBy(_._2).foreach { case (id, rs) =>
      assert(rs.length == 1, s"event $id admitted ${rs.length} times")
    }
    // the cap survived the replay: nobody exceeds it, seqs stay dense
    admitted.groupBy(_._1).foreach { case (u, rs) =>
      assert(rs.length <= cap, s"user $u over cap after replay")
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length).toSeq, s"user $u seq")
    }
    // and the final kept set still equals the batch rule over all 3 slices
    val want = all.groupBy(_.user_id).flatMap { case (_, es) =>
      es.sortBy(e => (e.ts_us, e.event_id)).take(cap)
    }.map(_.event_id).toSet
    assert(admitted.map(_._2).toSet == want)
  }

  /** Driver-side replay of s23's reliability arithmetic for a closed
    * window fed with event ids/values known to the test. */
  private def calibRows(evs: Seq[(Long, Double)]): Map[Int, (Long, Double, Double, Double, Double)] = {
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    evs.map { case (id, v) =>
      val p = math.min(999L, math.max(0L, (v * 2).toLong))
      val y = if (h60(id.toString) % 1000 < p) 1L else 0L
      (p, y)
    }.groupBy(_._1 / 100).map { case (b, rs) =>
      val n = rs.size.toLong
      val sp = rs.map(_._1).sum
      val sy = rs.map(_._2).sum
      val sq = rs.map(r => (r._1 - 1000 * r._2) * (r._1 - 1000 * r._2)).sum
      b.toInt -> ((n, r6(sp / (n * 1000.0)), r6(sy.toDouble / n),
        r6(sp / (n * 1000.0) - sy.toDouble / n), r6(sq / (n * 1000000.0))))
    }
  }

  test("s23 calibration monitor matches a driver-side reliability replay") {
    val input = MemoryStream[Ev](spark)
    val q = StreamOps.calibrationStream(input.toDF())
      .writeStream.format("memory").queryName("s23_out")
      .outputMode(OutputMode.Append).start()
    try {
      // hour 0: values 1..450 span all ten deciles (p = 2v, up to 900)
      val evs = (1 to 450).map(i => ev(i, i % 60, value = i.toDouble))
      input.addData(evs: _*)
      q.processAllAvailable()
      input.addData(ev(9999, 400)) // close hour 0
      q.processAllAvailable()
      val rows = spark.table("s23_out").collect()
        .filter(_.getTimestamp(0) == ts(0))
        .map(r => r.getInt(1) -> ((r.getLong(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
      val want = calibRows((1 to 450).map(i => (i.toLong, i.toDouble)))
      assert(rows == want)
      assert(rows.keySet == (0 to 9).toSet, "clamped values must fill all deciles")
      assert(rows.values.map(_._1).sum == 450)
    } finally q.stop()
  }

  test("s23 calibration monitor crash-replay emits each window-decile once") {
    val rows = windowedCrashReplay("s23", StreamOps.calibrationStream)
    val h0 = rows.filter(_.getTimestamp(0) == ts(0))
    val want = calibRows((1 to 200).map(i => (i.toLong, i.toDouble)))
    assert(h0.length == want.size, s"hour-0 deciles emitted ${h0.length}")
    val got = h0.map(r => r.getInt(1) -> ((r.getLong(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got == want)
    // no (window, decile) pair emitted twice anywhere
    val keys = rows.map(r => (r.getTimestamp(0), r.getInt(1))).toSeq
    assert(keys.distinct.length == keys.length)
  }

  /** Fixture codebook for the s24 tests: exactly q37's rule — vectors
    * 0..B-1 with B = adaptiveCodebook(n). */
  private def s24Centroids() = {
    val n = graft.sources.Tables.embeddings(spark, sfSmoke).count()
    val b = graft.util.Geometry.adaptiveCodebook(n, 16, 32768)
    graft.sources.Tables.embeddings(spark, sfSmoke)
      .filter(col("vec_id") < b)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
  }

  /** Independent driver-side replay of the assignment rule: CosineSim's
    * exact arithmetic (strict left-to-right double fold, [-1,1] clamp),
    * Spark's HALF_UP round to 6, argmax by (csim, -cid). */
  private def s24Replay(): Map[Long, (Long, Double)] = {
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < a.length) {
        val xi = a(i).toDouble; val yi = b(i).toDouble
        dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
      }
      val v = dot / (math.sqrt(nx) * math.sqrt(ny))
      math.max(-1.0, math.min(1.0, v))
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = graft.sources.Tables.embeddings(spark, sfSmoke)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val cents = s24Centroids().collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).sortBy(_._1)
    vecs.map { case (id, e) =>
      val best = cents.map { case (cid, cv) => (r6(cos(e, cv)), -cid) }.max
      id -> (-best._2, best._1)
    }.toMap
  }

  test("s24 IVF assignment over the file source equals batch q37 assignment and a driver replay") {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s24_ckpt").toString
    val streamDir = java.nio.file.Files.createTempDirectory("graft_s24_in")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfSmoke/embeddings.parquet"),
      streamDir.resolve("part-00000.parquet"))
    val vecs = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>, label INT")
      .parquet(streamDir.toString)
    val q = StreamOps.ivfAssignStream(vecs, s24Centroids())
      .writeStream.format("memory").queryName("s24_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("s24_out").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // (a) the batch path through the SAME kernel (q37's index build)
    val batch = graft.operators.VectorOps.assignCells(
      graft.sources.Tables.embeddings(spark, sfSmoke),
      graft.operators.VectorOps.centroidArray(s24Centroids()))
      .select("vec_id", "cid", "csim").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(streamed == batch)
    // (b) an INDEPENDENT driver-side argmax replay (not the kernel)
    assert(streamed == s24Replay())
    assert(streamed.nonEmpty)
    // every centroid id emitted is a real codebook cell
    val b = s24Centroids().count()
    assert(streamed.values.forall(v => v._1 >= 0 && v._1 < b))
  }

  test("s24 crash-replay assigns every vector exactly once (file-sink metadata log)") {
    val dir = java.nio.file.Files.createTempDirectory("s24_crash").toString
    val in = s"$dir/in"
    val all = graft.sources.Tables.embeddings(spark, sfSmoke)
      .select("vec_id", "embedding", "label").collect()
    val ids = all.map(_.getLong(0)).sorted
    val third = ids.length / 3
    def feed(i: Int): Unit = {
      val lo = i * third
      val hi = if (i == 2) ids.length else (i + 1) * third
      val slice = ids.slice(lo, hi).toSet
      feedFile(graft.sources.Tables.embeddings(spark, sfSmoke)
        .filter(col("vec_id").isin(slice.toSeq: _*))
        .select("vec_id", "embedding", "label"), in, s"f$i")
    }
    def start() = StreamOps.ivfAssignStream(
      spark.readStream
        .schema("vec_id LONG, embedding ARRAY<FLOAT>, label INT")
        .option("maxFilesPerTrigger", "1").parquet(in),
      s24Centroids())
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append)
      .start()
    feed(0)
    val q1 = start()
    try { q1.processAllAvailable(); feed(1); q1.processAllAvailable() }
    finally q1.stop()
    // crash window: batch 1's rows committed to the sink, the checkpoint
    // commit lost — the restarted query replays batch 1; the file sink's
    // metadata log must swallow the duplicate
    dropLastCommit(s"$dir/ckpt")
    val q2 = start()
    try { q2.processAllAvailable(); feed(2); q2.processAllAvailable() }
    finally q2.stop()
    val out = spark.read.parquet(s"$dir/out")
      .select("vec_id", "cid", "csim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // exactly-once: every vector assigned exactly once despite the replay
    assert(out.map(_._1).distinct.length == out.length, "duplicate assignments")
    assert(out.map(_._1).sorted.toSeq == ids.toSeq, "missing assignments")
    // and the assignments equal the independent driver replay
    val want = s24Replay()
    assert(out.map(t => t._1 -> ((t._2, t._3))).toMap == want)
  }

  /** Fixture tombstone list for the s25 tests: every 7th user. */
  private def s25Tombstones() =
    graft.sources.Tables.events(spark, sfSmoke)
      .select(col("user_id")).filter(col("user_id") % 7 === 0).distinct()

  test("s25 tombstone filter over the file source equals the batch anti-join and a driver replay") {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("graft_s25_ckpt").toString
    val streamDir = java.nio.file.Files.createTempDirectory("graft_s25_in")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfSmoke/events.parquet"),
      streamDir.resolve("part-00000.parquet"))
    val q = StreamOps.tombstoneFilterStream(
      StreamOps.eventsFileStream(spark, streamDir.toString), s25Tombstones())
      .writeStream.format("memory").queryName("s25_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val streamed = spark.table("s25_out").collect()
      .map(_.getLong(0)).sorted.toSeq
    // (a) the batch path: the same anti-join on the static table
    val batch = graft.sources.Tables.events(spark, sfSmoke)
      .join(s25Tombstones(), Seq("user_id"), "left_anti")
      .select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed == batch)
    // (b) an INDEPENDENT driver-side replay of the rule (not a join)
    val want = graft.sources.Tables.events(spark, sfSmoke)
      .select(col("event_id"), col("user_id")).collect()
      .filter(_.getLong(1) % 7 != 0).map(_.getLong(0)).sorted.toSeq
    assert(streamed == want)
    assert(streamed.nonEmpty)
    // and at least one event was actually dropped
    val total = graft.sources.Tables.events(spark, sfSmoke).count()
    assert(streamed.length < total)
  }

  test("s25 crash-replay passes every surviving event exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("s25_crash").toString
    val in = s"$dir/in"
    val ev = graft.sources.Tables.events(spark, sfSmoke)
    val ids = ev.select("event_id").collect().map(_.getLong(0)).sorted
    val third = ids.length / 3
    def feed(i: Int): Unit = {
      val lo = i * third
      val hi = if (i == 2) ids.length else (i + 1) * third
      feedFile(ev.filter(col("event_id") >= ids(lo) &&
        (if (hi == ids.length) lit(true) else col("event_id") < ids(hi))),
        in, s"f$i")
    }
    def start() = StreamOps.tombstoneFilterStream(
      StreamOps.eventsFileStream(spark, in), s25Tombstones())
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode(OutputMode.Append)
      .start()
    feed(0)
    val q1 = start()
    try { q1.processAllAvailable(); feed(1); q1.processAllAvailable() }
    finally q1.stop()
    // crash window: batch 1 committed to the sink, checkpoint commit
    // lost — the restarted query replays batch 1; the file sink's
    // metadata log must swallow the duplicate
    dropLastCommit(s"$dir/ckpt")
    val q2 = start()
    try { q2.processAllAvailable(); feed(2); q2.processAllAvailable() }
    finally q2.stop()
    val out = spark.read.parquet(s"$dir/out")
      .select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_._1).distinct.length == out.length, "duplicate events")
    // exactly the survivors, each exactly once
    val want = ev.select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(_._2 % 7 != 0)
    assert(out.sorted.toSeq == want.sorted.toSeq)
    // no tombstoned user leaked through
    assert(out.forall(_._2 % 7 != 0))
  }

  test("s26 blocklist gate routes like a driver MD5 replay and survives crash-replay") {
    val dir = java.nio.file.Files.createTempDirectory("s26_crash").toString
    val in = s"$dir/in"
    val docs = graft.sources.Tables.documents(spark, sfSmoke)
      .select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val slices = docs.grouped(docs.length / 3 + 1).toSeq
    def feed(i: Int): Unit =
      feedFile(slices(i).toSeq.toDF("doc_id", "text"), in, s"f$i")
    def start() = StreamOps.blocklistGateStream(
      spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", "1").parquet(in), s"$dir/gate")
    feed(0)
    val q1 = start()
    try { q1.processAllAvailable(); feed(1); q1.processAllAvailable() }
    finally q1.stop()
    dropLastCommit(s"$dir/gate/_ckpt")
    val q2 = start()
    try { q2.processAllAvailable(); feed(2); q2.processAllAvailable() }
    finally q2.stop()
    val quarantined = spark.read.parquet(s"$dir/gate/quarantined")
      .select("doc_id", "n_blocked").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val clean = spark.read.parquet(s"$dir/gate/clean")
      .select("doc_id").collect().map(_.getLong(0))
    // partition of the fed set — the replayed batch duplicated nothing
    assert((quarantined.map(_._1) ++ clean).sorted.toSeq ==
      docs.map(_._1).sorted.toSeq)
    // independent driver-side replay of the PRF (MD5 by hand, not Spark)
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).take(8)
        .map(b => f"$b%02x").mkString.take(15), 16)
    val want = docs.map { case (id, text) =>
      id -> text.split(" ", -1).count(t => h60(t + ":bl") % 16 == 0).toLong
    }.toMap
    quarantined.foreach { case (id, nb) =>
      assert(nb == want(id) && nb > 0, s"doc $id") }
    clean.foreach(id => assert(want(id) == 0L, s"doc $id"))
    // and the quarantined blocked-counts agree with batch q175's totals
    val occ = SparkEntry.queries("q175_blocklist_audit")(spark, sfSmoke)
      .agg(org.apache.spark.sql.functions.sum("occ_blocked")).collect()
      .head.getLong(0)
    assert(quarantined.map(_._2).sum == occ)
  }

  /** The s27 fixture feed: sfSmoke events as (event_type, epoch-micros). */
  private def decayEvents() = graft.sources.Tables.events(spark, sfSmoke)
    .select(col("event_type"), unix_micros(col("ts")).as("ts_us"))
    .as[StreamOps.DecayEvent].collect().toSeq

  /** Independent driver-side replay of s27's contract: ref = max
    * half-life day per key, each event contributes 2^(bits − age),
    * zero beyond the bits horizon. */
  private def decayReplay(evs: Seq[StreamOps.DecayEvent], halfLifeDays: Int)
      : Map[String, (Long, Long, Long, Double)] = {
    val per = halfLifeDays.toLong * 86400000000L
    evs.groupBy(_.event_type).map { case (t, es) =>
      val days = es.map(e => Math.floorDiv(e.ts_us, per))
      val ref = days.max
      val mass = days.map { d =>
        val age = ref - d
        if (age > StreamOps.DecayBits) 0L
        else 1L << (StreamOps.DecayBits - age)
      }.sum
      val dn = BigDecimal(mass / (1L << StreamOps.DecayBits).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      t -> (ref, es.length.toLong, mass, dn)
    }
  }

  /** Final drained state: per key, the emission from its last batch. */
  private def lastDecayRows(outDir: String): Map[String, (Long, Long, Long, Double)] =
    spark.read.parquet(s"$outDir/rows")
      .select(col("event_type"), col("ref_day"), col("n_events"), col("mass"),
        col("decayed_n"), col("_batch").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
      .groupBy(_._1).map { case (t, rs) =>
        val last = rs.maxBy(_._6)
        t -> (last._2, last._3, last._4, last._5)
      }

  test("s27 decayed counts: drained state equals a driver replay under arbitrary slicing") {
    val dir = java.nio.file.Files.createTempDirectory("s27_conv").toString
    val in = s"$dir/in"
    val all = decayEvents()
    // deliberately NON-time-ordered slices: the absolute day grid makes
    // the drained mass order-independent (each event's contribution is
    // 2^(bits − final age) no matter when it arrived)
    (0 until 3).foreach(i =>
      feedFile(all.filter(_.ts_us % 3 == i).toDF(), in, s"f$i"))
    val q = updateSink(StreamOps.decayedCountsStream(
      spark.readStream.schema(all.toDF().schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
        .as[StreamOps.DecayEvent], 7), s"$dir/out")
    try q.processAllAvailable() finally q.stop()
    val got = lastDecayRows(s"$dir/out")
    val want = decayReplay(all, 7)
    assert(got == want, s"got=$got\nwant=$want")
    // decay only shrinks: decayed mass never exceeds the raw count, and
    // the fixture's most recent day keeps at least one full-weight event
    got.values.foreach { case (_, n, _, dn) => assert(dn <= n && dn > 0) }
  }

  test("s27 decayed counts crash-replay converges to the same state") {
    val dir = java.nio.file.Files.createTempDirectory("s27_crash").toString
    val in = s"$dir/in"
    val all = decayEvents()
    val third = all.length / 3
    def feed(i: Int): Unit =
      feedFile(all.slice(i * third,
        if (i == 2) all.length else (i + 1) * third).toDF(), in, s"f$i")
    def start() = updateSink(StreamOps.decayedCountsStream(
      spark.readStream.schema(all.toDF().schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
        .as[StreamOps.DecayEvent], 7), s"$dir/out")
    feed(0)
    val q1 = start()
    try { q1.processAllAvailable(); feed(1); q1.processAllAvailable() }
    finally q1.stop()
    // crash window: batch 1's rows committed, checkpoint commit lost —
    // the restarted query replays batch 1 from the pre-batch state and
    // overwrites its own partition (the updateSink contract)
    dropLastCommit(s"$dir/out/_ckpt")
    val q2 = start()
    try { q2.processAllAvailable(); feed(2); q2.processAllAvailable() }
    finally q2.stop()
    assert(lastDecayRows(s"$dir/out") == decayReplay(all, 7))
  }

  /** The s28 fixture feed: smoke documents as (doc_id, source, n_tokens),
    * doc_id order (= the time-ordered ingestion the contract scopes to). */
  private def mixDocs(): Seq[StreamOps.MixDoc] =
    graft.sources.Tables.documents(spark, sfSmoke)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .as[StreamOps.MixDoc].collect().toSeq.sortBy(_.doc_id)

  /** Per-source budgets at 40% of each source's total tokens — every
    * source gets both admits and rejects, and at least one straddle. */
  private def mixBudgets(docs: Seq[StreamOps.MixDoc]): Map[String, Long] =
    docs.groupBy(_.source).map { case (s, ds) =>
      s -> (ds.map(_.n_tokens).sum * 2 / 5) }

  /** The batch twin: per source in doc_id order, admit while the running
    * token sum BEFORE the doc is under budget (the q69 straddle rule). */
  private def mixReplay(docs: Seq[StreamOps.MixDoc],
      budgets: Map[String, Long]): Map[Long, (Boolean, Long)] =
    docs.groupBy(_.source).flatMap { case (s, ds) =>
      val budget = budgets.getOrElse(s, 0L)
      var tok = 0L
      ds.sortBy(_.doc_id).map { doc =>
        val admit = tok < budget
        if (admit) tok += doc.n_tokens
        doc.doc_id -> (admit, tok)
      }
    }

  private def mixRows(outDir: String): Map[Long, (Boolean, Long)] =
    spark.read.parquet(s"$outDir/rows")
      .select(col("doc_id"), col("admitted"), col("admitted_tokens_after"))
      .collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2))).toMap

  test("s28 mix router: drained admissions equal the batch prefix rule") {
    val dir = java.nio.file.Files.createTempDirectory("s28_conv").toString
    val in = s"$dir/in"
    val all = mixDocs()
    val budgets = mixBudgets(all)
    // time-ordered slices (doc_id thirds) — the contract's feed order
    val third = all.length / 3
    (0 until 3).foreach(i =>
      feedFile(all.slice(i * third,
        if (i == 2) all.length else (i + 1) * third).toDF(), in, s"f$i"))
    val q = updateSink(StreamOps.mixRouterStream(
      spark.readStream.schema(all.toDF().schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
        .as[StreamOps.MixDoc], budgets), s"$dir/out")
    try q.processAllAvailable() finally q.stop()
    val got = mixRows(s"$dir/out")
    val want = mixReplay(all, budgets)
    assert(got == want)
    // the budgets exercise the operator: every source both admits and
    // rejects, and each source's admitted mass crosses its budget once
    // (the straddle doc) but never twice
    all.groupBy(_.source).foreach { case (s, ds) =>
      val decisions = ds.map(d => got(d.doc_id)._1)
      assert(decisions.contains(true) && decisions.contains(false), s)
      val admittedTok = ds.filter(d => got(d.doc_id)._1).map(_.n_tokens).sum
      assert(admittedTok >= budgets(s), s)
      val admitted = ds.filter(d => got(d.doc_id)._1).sortBy(_.doc_id)
      assert(admittedTok - admitted.last.n_tokens < budgets(s), s)
    }
  }

  test("s28 mix router crash-replay converges to the same admissions") {
    val dir = java.nio.file.Files.createTempDirectory("s28_crash").toString
    val in = s"$dir/in"
    val all = mixDocs()
    val budgets = mixBudgets(all)
    val third = all.length / 3
    def feed(i: Int): Unit =
      feedFile(all.slice(i * third,
        if (i == 2) all.length else (i + 1) * third).toDF(), in, s"f$i")
    def start() = updateSink(StreamOps.mixRouterStream(
      spark.readStream.schema(all.toDF().schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
        .as[StreamOps.MixDoc], budgets), s"$dir/out")
    feed(0)
    val q1 = start()
    try { q1.processAllAvailable(); feed(1); q1.processAllAvailable() }
    finally q1.stop()
    // crash window: batch 1's rows committed, checkpoint commit lost —
    // the replayed batch recomputes from the pre-batch state and
    // overwrites its own partition (the updateSink contract)
    dropLastCommit(s"$dir/out/_ckpt")
    val q2 = start()
    try { q2.processAllAvailable(); feed(2); q2.processAllAvailable() }
    finally q2.stop()
    assert(mixRows(s"$dir/out") == mixReplay(all, budgets))
  }

  test("s29 PQ encode stream drains to the exact batch encode") {
    val dir = java.nio.file.Files.createTempDirectory("s29").toString
    val in = s"$dir/in"
    val books = graft.operators.Wave24Queries.trainBooks(spark, sfSmoke)
    val emb = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val rows = emb.collect()
    val third = rows.length / 3
    (0 until 3).foreach { i =>
      val slice = rows.slice(i * third,
        if (i == 2) rows.length else (i + 1) * third)
      feedFile(spark.createDataFrame(
        spark.sparkContext.parallelize(slice.toSeq), emb.schema), in, s"f$i")
    }
    val q = StreamOps.pqEncodeStream(
      spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1").parquet(in), books)
      .writeStream.format("memory").queryName("s29_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("s29_out").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val want = graft.operators.Wave24Queries
      .withCodes(graft.operators.Wave24Queries.qvecs(spark, sfSmoke), books)
      .select(col("vec_id"),
        concat_ws(",", expr("transform(codes, c -> CAST(c AS STRING))")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  // ---- s30 ADC search stream ----

  private val AdcQids = Seq(0L, 7L, 50L, 111L, 200L, 333L)
  private val AdcK = 10

  /** Driver-side exact replay of the ADC ranking: per query, the
    * staged M·K table from the query's milli vector, M lookups per
    * corpus row, (adc, nbr) order with top-k cut. */
  private def adcReplay(books: IndexedSeq[Seq[(Long, IndexedSeq[Long])]],
      milli: Map[Long, IndexedSeq[Long]], codes: Map[Long, Seq[Long]],
      qid: Long): Seq[(Long, Long, Int)] = {
    val M = 4; val S = 16
    val qv = milli(qid)
    val tabs = (0 until M).map { m =>
      val sv = qv.slice(m * S, (m + 1) * S)
      books(m).map { case (c, cv) =>
        c -> sv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
      }.toMap
    }
    codes.toSeq.filter(_._1 != qid)
      .map { case (nbr, cs) =>
        (nbr, (0 until M).map(m => tabs(m)(cs(m))).sum) }
      .sortBy { case (nbr, adc) => (adc, nbr) }
      .take(AdcK)
      .zipWithIndex.map { case ((nbr, adc), i) => (nbr, adc, i + 1) }
  }

  private def adcFixture(): (IndexedSeq[Seq[(Long, IndexedSeq[Long])]],
      Map[Long, IndexedSeq[Long]], Map[Long, Seq[Long]]) = {
    val books = graft.operators.Wave24Queries.trainBooks(spark, sfSmoke)
    val milli = graft.operators.Wave24Queries.qvecs(spark, sfSmoke)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq).toMap
    val codes = graft.operators.Wave24Queries
      .withCodes(graft.operators.Wave24Queries.qvecs(spark, sfSmoke), books)
      .select(col("vec_id"), col("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    (books, milli, codes)
  }

  private def adcRows(outDir: String): Map[Long, Seq[(Long, Long, Int)]] =
    spark.read.parquet(s"$outDir/rows")
      .select(col("q_id"), col("nbr"), col("adc_dist"), col("rank"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getInt(3))))
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.map(_._2).sortBy(_._3).toSeq }

  test("s30 ADC search stream: drained top-k equals the exact ADC ranking and q192") {
    val dir = java.nio.file.Files.createTempDirectory("s30_conv").toString
    val in = s"$dir/in"
    val (books, milli, codes) = adcFixture()
    val emb = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val qrows = emb.filter(col("vec_id").isin(AdcQids: _*)).collect()
    qrows.grouped(2).zipWithIndex.foreach { case (slice, i) =>
      feedFile(spark.createDataFrame(
        spark.sparkContext.parallelize(slice.toSeq), emb.schema), in, s"f$i")
    }
    val q = updateSink(StreamOps.adcSearchStream(
      spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1").parquet(in),
      emb, books, AdcK), s"$dir/out")
    try q.processAllAvailable() finally q.stop()
    val got = adcRows(s"$dir/out")
    assert(got.keySet == AdcQids.toSet)
    AdcQids.foreach { qid =>
      assert(got(qid) == adcReplay(books, milli, codes, qid), s"query $qid")
    }
    // the family's fixed probe matches batch q192 bit-for-bit
    val q192 = SparkEntry.queries("q192_pq_adc_topk")(spark, sfSmoke)
      .select(col("vec_id"), col("adc_dist")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got(0L).map(h => (h._1, h._2)) == q192)
  }

  test("s30 ADC search crash-replay re-emits the same per-query top-k") {
    val dir = java.nio.file.Files.createTempDirectory("s30_crash").toString
    val in = s"$dir/in"
    val (books, milli, codes) = adcFixture()
    val emb = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val qrows = emb.filter(col("vec_id").isin(AdcQids: _*)).collect()
    val slices = qrows.grouped(2).toSeq
    def feed(i: Int): Unit = feedFile(spark.createDataFrame(
      spark.sparkContext.parallelize(slices(i).toSeq), emb.schema), in, s"f$i")
    def start() = updateSink(StreamOps.adcSearchStream(
      spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1").parquet(in),
      emb, books, AdcK), s"$dir/out")
    feed(0)
    val q1 = start()
    try { q1.processAllAvailable(); feed(1); q1.processAllAvailable() }
    finally q1.stop()
    dropLastCommit(s"$dir/out/_ckpt")
    val q2 = start()
    try { q2.processAllAvailable(); feed(2); q2.processAllAvailable() }
    finally q2.stop()
    val got = adcRows(s"$dir/out")
    assert(got.keySet == AdcQids.toSet)
    AdcQids.foreach { qid =>
      assert(got(qid) == adcReplay(books, milli, codes, qid), s"query $qid")
    }
  }

  test("s32 IVFADC encode stream drains to the exact batch index") {
    val dir = java.nio.file.Files.createTempDirectory("s32").toString
    val in = s"$dir/in"
    val idx = graft.operators.Wave29Queries.buildIndex(spark, sfSmoke).get
    // the published model artifact: the centroid relation, collected —
    // exactly what an ingest tier receives as the coarse-codebook sidecar
    val centsSeq = idx.cents.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toIndexedSeq))
      .sortBy(_._1).toSeq
    val emb = spark.read.parquet(s"$sfSmoke/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val rows = emb.collect()
    val third = rows.length / 3
    (0 until 3).foreach { i =>
      val slice = rows.slice(i * third,
        if (i == 2) rows.length else (i + 1) * third)
      feedFile(spark.createDataFrame(
        spark.sparkContext.parallelize(slice.toSeq), emb.schema), in, s"f$i")
    }
    val q = StreamOps.ivfadcEncodeStream(
      spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1").parquet(in), centsSeq, idx.books)
      .writeStream.format("memory").queryName("s32_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("s32_out").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toMap
    val want = idx.coded
      .select(col("vec_id"), col("cid"),
        concat_ws(",", expr("transform(codes, c -> CAST(c AS STRING))")))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toMap
    assert(got == want)
    assert(got.nonEmpty)
    // the index is real: more than one cell is populated
    assert(got.values.map(_._1).toSet.size > 1)
  }

  // ---- s31 t-closeness monitor ----

  private def tvdRowsFixture(): Seq[StreamOps.TvdRow] =
    graft.sources.Tables.customer(spark, sfSmoke)
      .select(concat_ws(":", col("c_nationkey"),
          floor(col("c_acctbal") / 1000d).cast("bigint")).as("grp"),
        col("c_mktsegment").as("cat"))
      .as[StreamOps.TvdRow].collect().toSeq

  /** The batch twin: q204's exact-integer TVD math per group against
    * the published reference. */
  private def tvdReplay(rows: Seq[StreamOps.TvdRow],
      reference: Map[String, Long]): Map[String, (Long, Long, Double)] = {
    val nTot = reference.values.sum
    rows.groupBy(_.grp).map { case (g, rs) =>
      val counts = rs.groupBy(_.cat).map { case (c, xs) => c -> xs.length.toLong }
      val k = counts.values.sum
      val present = counts.map { case (c, n) =>
        math.abs(n * nTot - reference.getOrElse(c, 0L) * k) }.sum
      val absent = (nTot - counts.keys.map(reference.getOrElse(_, 0L)).sum) * k
      val num = present + absent
      val tvd = BigDecimal(num.toDouble / (2L * k * nTot).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      g -> (k, num, tvd)
    }
  }

  /** Per group, the latest emission (max `_batch` partition). */
  private def tvdDrained(outDir: String): Map[String, (Long, Long, Double)] =
    spark.read.parquet(s"$outDir/rows")
      .select(col("grp"), col("n_rows"), col("tvd_num"), col("tvd"),
        col("_batch").cast("long"))
      .collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getDouble(3)), r.getLong(4)))
      .groupBy(_._1).map { case (g, rs) => g -> rs.maxBy(_._3)._2 }

  test("s31 tvd monitor: drained per-group tvd equals the q204 kernel") {
    val dir = java.nio.file.Files.createTempDirectory("s31_conv").toString
    val in = s"$dir/in"
    val rows = tvdRowsFixture()
    val reference = rows.groupBy(_.cat)
      .map { case (c, rs) => c -> rs.length.toLong }
    // interleaved slices, so most groups SPAN micro-batches and the
    // state accumulates across them
    val slices = rows.zipWithIndex.groupBy(_._2 % 3)
      .toSeq.sortBy(_._1).map(_._2.map(_._1))
    slices.zipWithIndex.foreach { case (sl, i) =>
      feedFile(sl.toDF(), in, s"f$i") }
    val q = updateSink(StreamOps.tvdMonitorStream(
      spark.readStream.schema(rows.toDF().schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
        .as[StreamOps.TvdRow], reference), s"$dir/out")
    try q.processAllAvailable() finally q.stop()
    val got = tvdDrained(s"$dir/out")
    val want = tvdReplay(rows, reference)
    assert(got == want)
    // the fixture discriminates: small classes sit far from global
    assert(got.values.exists(_._3 > 0.2) && got.values.exists(_._3 < 0.8))
  }

  test("s31 tvd monitor crash-replay converges to the same sheet") {
    val dir = java.nio.file.Files.createTempDirectory("s31_crash").toString
    val in = s"$dir/in"
    val rows = tvdRowsFixture()
    val reference = rows.groupBy(_.cat)
      .map { case (c, rs) => c -> rs.length.toLong }
    val slices = rows.zipWithIndex.groupBy(_._2 % 3)
      .toSeq.sortBy(_._1).map(_._2.map(_._1))
    def feed(i: Int): Unit = feedFile(slices(i).toDF(), in, s"f$i")
    def start() = updateSink(StreamOps.tvdMonitorStream(
      spark.readStream.schema(rows.toDF().schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
        .as[StreamOps.TvdRow], reference), s"$dir/out")
    feed(0)
    val q1 = start()
    try { q1.processAllAvailable(); feed(1); q1.processAllAvailable() }
    finally q1.stop()
    dropLastCommit(s"$dir/out/_ckpt")
    val q2 = start()
    try { q2.processAllAvailable(); feed(2); q2.processAllAvailable() }
    finally q2.stop()
    assert(tvdDrained(s"$dir/out") == tvdReplay(rows, reference))
  }

  test("s34 footer stats publish once at close and equal the batch twin") {
    val input = MemoryStream[StreamOps.FileRow](spark)
    val q = StreamOps.fileStatsStream(input.toDS())
      .writeStream.format("memory").queryName("s34_out")
      .outputMode(OutputMode.Append).start()
    try {
      // two files interleaved, within-watermark disorder in file 1
      input.addData(
        StreamOps.FileRow(1L, 731L, ts(2)), StreamOps.FileRow(2L, 900L, ts(1)),
        StreamOps.FileRow(1L, 735L, ts(3)), StreamOps.FileRow(1L, 729L, ts(1)),
        StreamOps.FileRow(2L, 890L, ts(4)))
      q.processAllAvailable()
      // nothing may publish before the watermark proves the files closed
      assert(spark.table("s34_out").count() == 0L)
      // advance the watermark far past both files' close times; the
      // timeout fires on the batch AFTER the one that advances it
      input.addData(StreamOps.FileRow(9L, 1L, ts(300)))
      q.processAllAvailable()
      input.addData(StreamOps.FileRow(9L, 2L, ts(301)))
      q.processAllAvailable()
      val got = spark.table("s34_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // batch twin: groupBy(file_id).agg(min, max, count) on the same
      // rows — file 9 is still open (its close time is past the final
      // watermark), so exactly files 1 and 2 publish
      assert(got == Set((1L, 729L, 735L, 3L), (2L, 890L, 900L, 2L)))
    } finally q.stop()
  }

  test("s34 footer stats crash-replay publishes each footer exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("s34_crash").toString
    val in = s"$dir/in"
    val slices = Seq(
      Seq(StreamOps.FileRow(1L, 731L, ts(2)), StreamOps.FileRow(2L, 900L, ts(1))),
      Seq(StreamOps.FileRow(1L, 729L, ts(1)), StreamOps.FileRow(9L, 1L, ts(300))),
      Seq(StreamOps.FileRow(9L, 2L, ts(301))))
    def feed(i: Int): Unit = feedFile(slices(i).toDF(), in, s"f$i")
    // append-mode replay-idempotent sink (flatMapGroupsWithState(Append)
    // requires an Append-mode query — the s33 sink, not updateSink)
    def start() = StreamOps.fileStatsStream(
      spark.readStream.schema(slices.head.toDF().schema)
        .option("maxFilesPerTrigger", "1").parquet(in)
        .as[StreamOps.FileRow])
      .toDF().writeStream
      .option("checkpointLocation", s"$dir/out/_ckpt")
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        batch.withColumn("_batch", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch").parquet(s"$dir/out/rows")
      }
      .start()
    feed(0)
    val q1 = start()
    try { q1.processAllAvailable(); feed(1); q1.processAllAvailable() }
    finally q1.stop()
    dropLastCommit(s"$dir/out/_ckpt")
    val q2 = start()
    try { q2.processAllAvailable(); feed(2); q2.processAllAvailable() }
    finally q2.stop()
    val got = spark.read.parquet(s"$dir/out/rows")
      .select("file_id", "f_min", "f_max", "n_rows").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(got == Seq((1L, 729L, 731L, 2L), (2L, 900L, 900L, 1L)))
  }
}
