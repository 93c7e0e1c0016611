package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Structured Streaming semantics (SURVEY.md §2B stream_demo ◐ part):
  * watermark drops late rows in append mode across micro-batches. */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  test("stream_demo query matches the equivalent batch aggregation") {
    val streamed = SparkEntry.queries("stream_demo")(spark, sf)
    val batch = Tables(spark, sf, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("cnt"))
      .orderBy("hour_start", "event_type")
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("q80 streaming sessionize matches the batch q38 session windows") {
    // complete-mode session_window over the drained stream must hold
    // exactly the batch result — bit-parity, not just row counts
    val streamed = SparkEntry.queries("q80_stream_sessionize")(spark, sf)
    val batch = SparkEntry.queries("q38_win_session")(spark, sf)
    assert(streamed.collect().toSeq == batch.collect().toSeq)
  }

  test("mapGroupsWithState keeps per-key state across micro-batches") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val dir = Files.createTempDirectory("graft_state")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:01:00"), 1L),
        (ts("2024-01-01 10:02:00"), 2L))
      .toDF("ts", "user_id").coalesce(1).write.mode("append").parquet(dir.toString)

    val schema = spark.read.parquet(dir.toString).schema
    val counts = spark.readStream.schema(schema).parquet(dir.toString)
      .as[(java.sql.Timestamp, Long)]
      .groupByKey(_._2)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(java.sql.Timestamp, Long)],
         state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          (user, total)
      }.toDF("user_id", "total")
    val q = counts.writeStream.format("memory").queryName("graft_state_test")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val after1 = spark.table("graft_state_test")
        .as[(Long, Long)].collect().toSet
      assert(after1 == Set((1L, 2L), (2L, 1L)), s"batch1 state: $after1")

      Seq((ts("2024-01-01 10:05:00"), 1L))
        .toDF("ts", "user_id").coalesce(1).write.mode("append").parquet(dir.toString)
      q.processAllAvailable()
      val after2 = spark.table("graft_state_test")
        .as[(Long, Long)].collect().toSet
      assert(after2.contains((1L, 3L)),
             s"user 1 state must accumulate across batches: $after2")
    } finally q.stop()
  }

  test("flatMapGroupsWithState: custom sessionizer closes on event-time timeout") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val dir = Files.createTempDirectory("graft_fmgws")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: user 1 has a 2-event session at 10:00; user 2's 13:00
    // event pushes the watermark (10-min delay) far past the session's
    // 30-min timeout
    Seq((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:05:00"), 1L),
        (ts("2024-01-01 13:00:00"), 2L))
      .toDF("ts", "user_id").coalesce(1).write.mode("append").parquet(dir.toString)

    val schema = spark.read.parquet(dir.toString).schema
    def sessionize(user: Long, rows: Iterator[(java.sql.Timestamp, Long)],
                   state: GroupState[(Long, Long, Int)]): Iterator[(Long, Long, Int)] = {
      if (state.hasTimedOut) {
        val (st, la, n) = state.get
        state.remove()
        Iterator.single((user, la - st, n)) // closed session: duration + size
      } else {
        val times = rows.map(_._1.getTime).toList
        val (st, la, n) = state.getOption.getOrElse((times.min, times.max, 0))
        val upd = (math.min(st, times.min), math.max(la, times.max), n + times.size)
        state.update(upd)
        state.setTimeoutTimestamp(upd._2 + 30 * 60000L)
        Iterator.empty
      }
    }
    val out = spark.readStream.schema(schema).parquet(dir.toString)
      .withWatermark("ts", "10 minutes")
      .as[(java.sql.Timestamp, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(sessionize)
      .toDF("user_id", "dur_ms", "n")
    val q = out.writeStream.format("memory").queryName("graft_fmgws_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2 advances the clock again so the timeout fires
      Seq((ts("2024-01-01 13:05:00"), 2L))
        .toDF("ts", "user_id").coalesce(1).write.mode("append").parquet(dir.toString)
      q.processAllAvailable()
      val rows = spark.table("graft_fmgws_test")
        .as[(Long, Long, Int)].collect().toSet
      assert(rows.contains((1L, 300000L, 2)),
             s"user 1's 5-minute 2-event session should have closed: $rows")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark bounds state: in-horizon replays dedup, expired keys re-emit") {
    val dir = Files.createTempDirectory("graft_ddww")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def writeBatch(rows: Seq[(java.sql.Timestamp, Long)]): Unit =
      rows.toDF("ts", "event_id").coalesce(1)
        .write.mode("append").parquet(dir.toString)
    writeBatch(Seq((ts("2024-01-01 10:00:00"), 1L),
                   (ts("2024-01-01 10:00:00"), 2L)))
    val schema = spark.read.parquet(dir.toString).schema
    val out = spark.readStream.schema(schema).parquet(dir.toString)
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = out.writeStream.format("memory").queryName("graft_ddww_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: key 1 replayed while its state is alive (watermark is
      // still 09:50 from batch 1) — must dedup; key 3 at 12:00 advances
      // the watermark to 11:50, expiring keys 1 and 2 (10:00 + 10 min
      // horizon < 11:50)
      writeBatch(Seq((ts("2024-01-01 10:00:00"), 1L),
                     (ts("2024-01-01 12:00:00"), 3L)))
      q.processAllAvailable()
      // batch 3: key 2 arrives again at a fresh event time — its dedup
      // state was dropped with the watermark, so it RE-EMITS: that drop
      // is exactly what keeps state O(horizon) instead of O(all keys
      // ever seen), and why the declared q98 sizes the delay to the
      // replay horizon
      writeBatch(Seq((ts("2024-01-01 12:30:00"), 2L)))
      q.processAllAvailable()
      val got = spark.table("graft_ddww_test")
        .as[(java.sql.Timestamp, Long)].collect().toSeq
      assert(got.count(_._2 == 1L) == 1, s"in-horizon replay must dedup: $got")
      assert(got.count(_._2 == 2L) == 2, s"expired key must re-emit: $got")
      assert(got.length == 4, s"expected 4 sink rows: $got")
    } finally q.stop()
  }

  test("q98 watermarked dedup equals q89's unbounded dedup on in-horizon input") {
    // delay covers the staged replay horizon, so the bounded and
    // unbounded forms must agree bit-for-bit
    val a = SparkEntry.queries("q98_stream_dedup_watermark")(spark, sf)
      .collect().toSeq
    val b = SparkEntry.queries("q89_stream_dedup")(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("watermark drops late rows across micro-batches (append mode)") {
    val dir = Files.createTempDirectory("graft_stream_late")
    val in = dir.resolve("in"); Files.createDirectory(in)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def writeBatch(file: String, rows: Seq[(java.sql.Timestamp, Long)]): Unit =
      rows.toDF("ts", "user_id").coalesce(1).write.mode("append")
        .parquet(in.toString)

    // Batch 1: three rows in the 10:00 window, one at 12:00 that pushes
    // the watermark to 11:50 and finalizes the 10:00 window.
    writeBatch("b1", Seq(
      (ts("2024-01-01 10:00:10"), 1L),
      (ts("2024-01-01 10:03:00"), 1L),
      (ts("2024-01-01 10:07:00"), 2L),
      (ts("2024-01-01 12:00:00"), 3L)))

    val schema = spark.read.parquet(in.toString).schema
    val q = spark.readStream.schema(schema).parquet(in.toString)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("w"), col("cnt"))
      .writeStream.format("memory").queryName("graft_late_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val after1 = spark.table("graft_late_test")
        .as[(java.sql.Timestamp, Long)].collect().toMap
      assert(after1(ts("2024-01-01 10:00:00")) == 3L,
             s"10:00 window should have been finalized with 3 rows: $after1")

      // Batch 2: a LATE row for the closed 10:00 window (dropped) and a
      // 12:30 row that later finalizes the 12:00 window.
      writeBatch("b2", Seq(
        (ts("2024-01-01 10:04:00"), 9L),   // late: watermark is 11:50
        (ts("2024-01-01 12:30:00"), 3L)))
      q.processAllAvailable()
      val after2 = spark.table("graft_late_test")
        .as[(java.sql.Timestamp, Long)].collect()
      val tenOClock = after2.filter(_._1 == ts("2024-01-01 10:00:00"))
      assert(tenOClock.map(_._2).toSeq == Seq(3L),
             s"late row must not reopen or re-emit the 10:00 window: ${after2.toSeq}")
    } finally q.stop()
  }

  test("windowed agg is identical under the RocksDB state store (production backend)") {
    // the demos run on the default HDFS-backed store; at cluster scale the
    // state store is RocksDB — same results, disk-backed state
    val dir = Files.createTempDirectory("graft_rocksdb")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq((ts("2024-01-01 10:00:10"), 1L), (ts("2024-01-01 10:03:00"), 2L),
        (ts("2024-01-01 11:00:00"), 1L), (ts("2024-01-01 11:05:00"), 3L))
      .toDF("ts", "user_id").coalesce(1).write.parquet(s"$dir/in")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(s"$dir/in").schema
      val q = spark.readStream.schema(schema).parquet(s"$dir/in")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("w"), col("cnt"))
        .writeStream.format("memory").queryName("graft_rocksdb_test")
        .outputMode("complete").start()
      try {
        q.processAllAvailable()
        val got = spark.table("graft_rocksdb_test")
          .as[(java.sql.Timestamp, Long)].collect().toMap
        assert(got == Map(ts("2024-01-01 10:00:00") -> 2L,
                          ts("2024-01-01 11:00:00") -> 2L), got.toString)
      } finally q.stop()
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("restart from checkpoint recovers state and does not reprocess") {
    // memory sinks cannot recover from a checkpoint; the FILE sink is
    // the real exactly-once path (checkpoint + output commit log)
    val dir = Files.createTempDirectory("graft_ckpt")
    val in = dir.resolve("in"); Files.createDirectory(in)
    val cp = dir.resolve("cp").toString
    val out = dir.resolve("out").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def writeBatch(rows: Seq[(java.sql.Timestamp, Long)]): Unit =
      rows.toDF("ts", "user_id").coalesce(1).write.mode("append")
        .parquet(in.toString)
    val schema = { writeBatch(Seq((ts("2024-01-01 00:00:00"), 0L)))
                   spark.read.parquet(in.toString).schema }
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(in.toString)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("w"), col("cnt"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    def emitted(): Seq[(java.sql.Timestamp, Long)] =
      spark.read.parquet(out).as[(java.sql.Timestamp, Long)].collect().toSeq

    // Run 1: window 10:00 gets finalized (the 12:00 row pushes the
    // watermark); window 14:00 stays PENDING in the state store.
    writeBatch(Seq(
      (ts("2024-01-01 10:00:10"), 1L), (ts("2024-01-01 10:03:00"), 1L),
      (ts("2024-01-01 12:00:00"), 2L), (ts("2024-01-01 14:00:00"), 3L)))
    run()
    val run1 = emitted()
    assert(run1.contains((ts("2024-01-01 10:00:00"), 2L)), run1.toString)
    assert(!run1.exists(_._1 == ts("2024-01-01 14:00:00")), run1.toString)

    // Run 2, same checkpoint + output: a second 14:00-window row plus a
    // 16:00 row that finalizes it. The emitted count must include the
    // run-1 row (state recovered across the restart) and the 10:00
    // window must appear exactly ONCE (batch-1 files not reprocessed).
    writeBatch(Seq(
      (ts("2024-01-01 14:05:00"), 3L), (ts("2024-01-01 16:00:00"), 4L)))
    run()
    val run2 = emitted()
    assert(run2.contains((ts("2024-01-01 14:00:00"), 2L)),
           s"state must survive the restart: $run2")
    assert(run2.count(_._1 == ts("2024-01-01 10:00:00")) == 1,
           s"closed windows must not re-emit after restart: $run2")
  }

  test("q122: file-sink dedup stays exactly-once across restart; replays and empty restarts emit nothing") {
    // the q122 shape under the failure scenario it exists for: the
    // query stops with the upstream mid-replay, the REPLAY copy lands
    // while it is down, and the restarted query must recover its dedup
    // state from the checkpoint and commit nothing new to the sink
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft_q122_restart")
    val in = dir.resolve("in"); Files.createDirectory(in)
    val cp = dir.resolve("cp").toString
    val out = dir.resolve("out").toString
    val srcFile = java.nio.file.Paths.get(s"$sf/events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(srcFile.toString).schema
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(in.toString)
        .dropDuplicates("event_id")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination() finally q.stop()
    }
    def sinkTypeCounts(): Map[String, Long] =
      spark.read.parquet(out).groupBy("event_type").count()
        .as[(String, Long)].collect().toMap
    val batchCounts = Tables(spark, sf, "events")
      .groupBy("event_type").count().as[(String, Long)].collect().toMap

    // run 1: first delivery arrives, query drains it and stops
    Files.copy(srcFile, in.resolve("a.parquet"))
    run()
    assert(sinkTypeCounts() == batchCounts)
    // while the query is DOWN, the at-least-once upstream replays the
    // whole delivery; the restarted query recovers state from the
    // checkpoint and drops every replayed row — sink unchanged
    Files.copy(srcFile, in.resolve("b.parquet"))
    run()
    assert(sinkTypeCounts() == batchCounts,
           "replay after restart leaked duplicate rows into the sink")
    // a restart with NO new input must commit nothing (offset log):
    // same counts AND same sink file set
    val filesBefore = spark.read.parquet(out).inputFiles.toSet
    run()
    assert(sinkTypeCounts() == batchCounts)
    assert(spark.read.parquet(out).inputFiles.toSet == filesBefore,
           "empty restart re-committed a batch to the sink")
  }

  test("stream-stream join drops late rows once the watermark passes them") {
    val dir = Files.createTempDirectory("graft_ssjoin_late")
    val in = dir.resolve("in"); Files.createDirectory(in)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def writeBatch(rows: Seq[(Long, Long, java.sql.Timestamp, String)]): Unit =
      rows.toDF("event_id", "user_id", "ts", "event_type")
        .coalesce(1).write.mode("append").parquet(in.toString)

    // Batch 1: signup+click pair for user 1 (a match), plus rows at
    // 20:00 on BOTH streams pushing both watermarks to 19:00.
    writeBatch(Seq(
      (100L, 1L, ts("2024-01-01 10:00:00"), "signup"),
      (101L, 1L, ts("2024-01-01 10:30:00"), "click"),
      (102L, 6L, ts("2024-01-01 20:00:00"), "signup"),
      (103L, 5L, ts("2024-01-01 20:00:00"), "click")))

    val schema = spark.read.parquet(in.toString).schema
    def src = spark.readStream.schema(schema).parquet(in.toString)
    val clicks = src.where(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
      .withWatermark("cts", "1 hour")
    val signups = src.where(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id").as("su"),
              col("ts").as("sts"))
      .withWatermark("sts", "1 hour")
    val q = clicks.join(signups,
        col("cu") === col("su") &&
          col("cts") >= col("sts") &&
          col("cts") < col("sts") + expr("INTERVAL 1 HOUR"))
      .writeStream.format("memory").queryName("graft_ssjoin_late_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val after1 = spark.table("graft_ssjoin_late_test")
        .select("signup_id").as[Long].collect().toSeq
      assert(after1 == Seq(100L), s"batch1 matches: $after1")

      // Batch 2: a LATE click at 10:15 for user 1 — its event time is far
      // below the 19:00 watermark, so it must be dropped, never joined to
      // the (already evicted) 10:00 signup — and an on-time click at
      // 20:30 for user 6 that matches the 20:00 signup.
      writeBatch(Seq(
        (104L, 1L, ts("2024-01-01 10:15:00"), "click"),
        (105L, 6L, ts("2024-01-01 20:30:00"), "click")))
      q.processAllAvailable()
      val after2 = spark.table("graft_ssjoin_late_test")
        .select("signup_id").as[Long].collect().sorted.toSeq
      assert(after2 == Seq(100L, 102L),
             s"late click must be dropped, on-time click must join: $after2")
    } finally q.stop()
  }

  test("q164: restart resumes from committed offsets; double-fired batch commits never double-land") {
    // the q164 maintenance machinery under its two failure scenarios:
    // (1) the maintainer dies between deliveries — the restart must
    // resume from the checkpointed offset log and fold ONLY the new
    // delivery into the artifact (no batch re-run for the old one);
    // (2) foreachBatch re-invokes a batch that already committed
    // (Spark's at-least-once contract) — the batchId-keyed rename
    // commit must reject the second landing byte-for-byte.
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft_q164_restart")
    val in = dir.resolve("in"); Files.createDirectory(in)
    val root = dir.resolve("root")
    val art = root.resolve("art")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$sf/events.parquet")
    // two DISJOINT deliveries (even users, then odd users) so a broken
    // offset log is visible in the artifact's batch inventory
    def deliver(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = dir.resolve(s"stage_$name")
      df.coalesce(1).write.parquet(stage.toString)
      val part = Files.list(stage).iterator.asScala
        .find(_.toString.endsWith(".parquet")).get
      Files.move(part, in.resolve(name))
    }
    def batches: Set[String] = Files.list(art).iterator.asScala
      .map(_.getFileName.toString).filter(_.startsWith("batch=")).toSet
    def estimates(): Map[String, Long] =
      spark.read.parquet(art.toString).groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("e"))
        .as[(String, Long)].collect().toMap
    def exactDistinct(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.groupBy("event_type").agg(countDistinct(col("user_id")).as("nd"))
        .as[(String, Long)].collect().toMap
    def assertWithin(est: Map[String, Long], exact: Map[String, Long]): Unit = {
      assert(est.keySet == exact.keySet)
      for ((t, e) <- exact)
        assert(math.abs(est(t) - e).toDouble / e <= 0.05,
               s"$t: sketch ${est(t)} vs exact $e")
    }
    val evens = ev.where(pmod(col("user_id"), lit(2)) === 0)
    val odds = ev.where(pmod(col("user_id"), lit(2)) === 1)

    // delivery 1 drains, maintainer stops (the "kill")
    deliver(evens, "a.parquet")
    streaming.StreamOps.maintainSketchArtifact(spark, in.toString, root)
    assert(batches == Set("batch=0"), s"unexpected inventory: $batches")
    assertWithin(estimates(), exactDistinct(evens))
    // delivery 2 lands while the maintainer is DOWN; the restart folds
    // exactly the new delivery: one new batch dir, estimates now cover
    // the full user population
    deliver(odds, "b.parquet")
    streaming.StreamOps.maintainSketchArtifact(spark, in.toString, root)
    assert(batches == Set("batch=0", "batch=1"),
           s"restart must resume from offsets, saw: $batches")
    assertWithin(estimates(), exactDistinct(ev))
    // double-fire batch 0 with DIFFERENT content: the committed dir
    // must win (same file set afterwards — the retry landed nothing)
    val b0 = art.resolve("batch=0")
    val before = Files.list(b0).iterator.asScala.map(_.toString).toSet
    streaming.StreamOps.commitSketchPartial(art, 0L, odds
      .withColumn("day", to_date(graft.Tables.tsNorm(odds.schema("ts").dataType)))
      .groupBy("day", "event_type")
      .agg(hll_sketch_agg(col("user_id")).as("sk")))
    val after = Files.list(b0).iterator.asScala.map(_.toString).toSet
    assert(after == before, "a double-fired commit replaced batch=0")
    assertWithin(estimates(), exactDistinct(ev))
  }

  test("q89: doubled at-least-once input collapses to exactly-once counts") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val n = spark.read.parquet(s"$sf/events.parquet").count()
    // the staged stream input really is at-least-once: every event twice
    val staged = spark.read.parquet(
      streaming.StreamOps.stagedDupEventsDir(sf))
    assert(staged.count() == 2 * n, "staging must double the input")
    // ...and the deduped streaming output is exactly-once
    val total = SparkEntry.queries("q89_stream_dedup")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("cnt")).as[Long].collect().head
    assert(total == n, s"exactly-once total $total != $n")
  }

  test("q267 shape: alert suppression holds across batches and replays") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val dir = Files.createTempDirectory("graft_alert")
    // batch 1: user 1 spikes twice in hour 473400 (same batch) — the
    // second spike must be suppressed within the batch
    Seq((1L, 10L, 473400L * 3600000000L + 1L, 19000L),
        (1L, 11L, 473400L * 3600000000L + 2L, 20000L))
      .toDF("user_id", "event_id", "tus", "cents")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val alerts = spark.readStream.schema(schema).parquet(dir.toString)
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, Long, Long, Long)],
         state: GroupState[Set[Long]]) =>
          var seen = state.getOption.getOrElse(Set.empty[Long])
          val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
          for (e <- it.toSeq.sortBy(e => (e._3, e._2))) {
            val hour = e._3 / 3600000000L
            if (!seen.contains(hour)) {
              seen += hour
              out += ((uid, hour, seen.size))
            }
          }
          state.update(seen)
          out.iterator
      }.toDF("user_id", "hour_idx", "episode_idx")
    val q = alerts.writeStream.format("memory").queryName("graft_alert_t")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val after1 = spark.table("graft_alert_t")
        .as[(Long, Long, Int)].collect().toSet
      assert(after1 == Set((1L, 473400L, 1)),
             s"within-batch suppression: $after1")
      // batch 2: an upstream REPLAY of the hour-473400 spike (must stay
      // suppressed — state store, not batch-local dedup) + a new spike
      // in hour 473401 (episode 2)
      Seq((1L, 10L, 473400L * 3600000000L + 1L, 19000L),
          (1L, 12L, 473401L * 3600000000L + 5L, 21000L))
        .toDF("user_id", "event_id", "tus", "cents")
        .coalesce(1).write.mode("append").parquet(dir.toString)
      q.processAllAvailable()
      val after2 = spark.table("graft_alert_t")
        .as[(Long, Long, Int)].collect().toSet
      assert(after2 == Set((1L, 473400L, 1), (1L, 473401L, 2)),
             s"cross-batch suppression + episode counter: $after2")
    } finally q.stop()
  }

  test("q285 shape: CDC last-writer-wins state carries across batches") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val dir = Files.createTempDirectory("graft_cdc")
    def cdc = {
      val schema = spark.read.parquet(dir.toString).schema
      spark.readStream.schema(schema).parquet(dir.toString)
        .as[(Long, Long, Long, String, Long)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(
          OutputMode.Update, GroupStateTimeout.NoTimeout) {
          (uid: Long, it: Iterator[(Long, Long, Long, String, Long)],
           state: GroupState[(Long, Long, String, Long, Long)]) =>
            var st = state.getOption.getOrElse((Long.MinValue,
              Long.MinValue, "", 0L, 0L))
            for (e <- it.toSeq.sortBy(e => (e._3, e._2))) {
              val newer = e._3 > st._1 ||
                (e._3 == st._1 && e._2 > st._2)
              st = if (newer) (e._3, e._2, e._4, e._5, st._5 + 1)
                   else (st._1, st._2, st._3, st._4, st._5 + 1)
            }
            state.update(st)
            Iterator((uid, st._3, st._4, st._5))
        }.toDF("user_id", "op", "cents", "n_ops")
    }
    // batch 1: user 1 upserts twice (LWW keeps the later), user 2 upsert
    Seq((1L, 10L, 100L, "U", 500L), (1L, 11L, 200L, "U", 700L),
        (2L, 12L, 150L, "U", 900L))
      .toDF("user_id", "event_id", "tus", "op", "cents")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    val q = cdc.writeStream.format("memory").queryName("graft_cdc_t")
      .outputMode("update").start()
    def table() = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("n_ops").desc)
      spark.table("graft_cdc_t")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1 && col("op") === "U")
        .select("user_id", "cents", "n_ops")
        .as[(Long, Long, Long)].collect().toSet
    }
    try {
      q.processAllAvailable()
      assert(table() == Set((1L, 700L, 2L), (2L, 900L, 1L)), table())
      // batch 2: user 1 deleted (drops from the table), and user 2
      // receives a LATE op with an EARLIER event time — LWW is by
      // (ts, event_id), not arrival order, so the stored image must
      // win while the op count still advances
      Seq((1L, 13L, 300L, "D", 0L), (2L, 14L, 120L, "U", 111L))
        .toDF("user_id", "event_id", "tus", "op", "cents")
        .coalesce(1).write.mode("append").parquet(dir.toString)
      q.processAllAvailable()
      assert(table() == Set((2L, 900L, 2L)), table())
    } finally q.stop()
  }

  test("q298 shape: CDC snapshot commits survive kill/restart, time travel, double-fire") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val SnapshotLog = sources.PartitionedOps.SnapshotLog
    val dir = Files.createTempDirectory("graft_cdcsnap_src")
    val root = Files.createTempDirectory("graft_cdcsnap_tbl")
    val ckpt = Files.createTempDirectory("graft_cdcsnap_ck")
    def stream = {
      val schema = spark.read.parquet(dir.toString).schema
      spark.readStream.schema(schema).parquet(dir.toString)
        .as[(Long, Long, Long, String, Long)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(
          OutputMode.Update, GroupStateTimeout.NoTimeout) {
          (uid: Long, it: Iterator[(Long, Long, Long, String, Long)],
           state: GroupState[(Long, Long, String, Long, Long)]) =>
            var st = state.getOption.getOrElse((Long.MinValue,
              Long.MinValue, "", 0L, 0L))
            for (e <- it.toSeq.sortBy(e => (e._3, e._2))) {
              val newer = e._3 > st._1 ||
                (e._3 == st._1 && e._2 > st._2)
              st = if (newer) (e._3, e._2, e._4, e._5, st._5 + 1)
                   else (st._1, st._2, st._3, st._4, st._5 + 1)
            }
            state.update(st)
            Iterator((uid, st._3, st._4, st._5))
        }.toDF("user_id", "op", "cents", "n_ops")
    }
    // each run() is one PROCESS LIFETIME: start from the shared
    // checkpoint, drain, stop — the stop IS the kill, the next run()
    // the restart
    def run(): Unit = {
      val q = stream.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch { (b: DataFrame, id: Long) =>
          streaming.StreamOps.applyCdcBatch(b.sparkSession, root, id, b)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def tbl(v: Int) = SnapshotLog.read(spark, root, v)
      .select("user_id", "cents", "n_ops")
      .as[(Long, Long, Long)].collect().toSet
    // batch 1: users 1 and 2 upsert → v1
    Seq((1L, 10L, 100L, "U", 500L), (2L, 12L, 150L, "U", 900L))
      .toDF("user_id", "event_id", "tus", "op", "cents")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    run()
    assert(SnapshotLog.latest(root) == 1, "batch 1 did not commit v1")
    assert(tbl(1) == Set((1L, 500L, 1L), (2L, 900L, 1L)), tbl(1))
    // KILL happened (query stopped); batch 2 lands, RESTART drains it:
    // user 1 deleted, user 3 inserted → v2
    Seq((1L, 13L, 300L, "D", 0L), (3L, 14L, 120L, "U", 111L))
      .toDF("user_id", "event_id", "tus", "op", "cents")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    run()
    assert(SnapshotLog.latest(root) == 2, "restart did not commit v2")
    assert(tbl(2) == Set((2L, 900L, 1L), (3L, 111L, 1L)), tbl(2))
    // TIME TRAVEL: v1 still reads the pre-delete state after v2
    assert(tbl(1) == Set((1L, 500L, 1L), (2L, 900L, 1L)),
           "v1 no longer time-travel-readable")
    // v2 must SHARE v1's file for user 2's untouched bucket
    val shared = SnapshotLog.files(root, 1).toSet
      .intersect(SnapshotLog.files(root, 2).toSet)
    assert(shared.nonEmpty, "v2 re-referenced none of v1's files")
    // DOUBLE-FIRE batch 0 with DIFFERENT content: the committed
    // version must win (file list unchanged, no new version)
    val before = SnapshotLog.files(root, 1)
    streaming.StreamOps.applyCdcBatch(spark, root, 0L,
      Seq((9L, "U", 999L, 1L)).toDF("user_id", "op", "cents", "n_ops"))
    assert(SnapshotLog.latest(root) == 2 &&
             SnapshotLog.files(root, 1) == before,
           "a double-fired batch replaced v1")
  }

  test("q371 shape: admitted log is split-invariant, idempotent, and crash-tolerant") {
    val SnapshotLog = sources.PartitionedOps.SnapshotLog
    val simx = operators.SimilarityExtOps
    // the committer's input shape: odd arrivals assigned through the
    // PINNED gate model's two-level router (r18 — one assigner for
    // the whole family; the spec drives the committer against the
    // same modelRoot the production drain pins)
    val modelRoot = streaming.StreamOps.gateModelRoot(spark, sf, upTo = 1)
    val pin = streaming.StreamOps.gateModelPin(modelRoot)
    val model = SnapshotLog.read(spark, modelRoot, pin)
    val cents = model.where(col("kind") === "c")
      .select(col("id").as("cid"), col("xi").as("ci"))
    val arr = simx.twoLevelAssign(
        simx.latticeFrame(spark, sf, Long.MaxValue)
          .where(col("vec_id") % 2 === 1), cents)
      .select("vec_id", "xi", "cid", "nv")
      .persist()
    try {
      val mid = 250L
      def logSet(root: java.nio.file.Path) =
        SnapshotLog.read(spark, root, SnapshotLog.latest(root))
          .select("vec_id", "cid").as[(Long, Long)].collect().toSet
      // one-batch drain vs a two-batch drain at an arbitrary id split:
      // the one-level admit rule (admission judged against the corpus
      // snapshot only) makes the final log split-INVARIANT
      val r1 = Files.createTempDirectory("graft_gateadm_one")
      streaming.StreamOps.applyGateBatch(spark, modelRoot, pin, r1, 0L, arr)
      val r2 = Files.createTempDirectory("graft_gateadm_two")
      streaming.StreamOps.applyGateBatch(spark, modelRoot, pin, r2, 0L,
        arr.where(col("vec_id") < mid))
      streaming.StreamOps.applyGateBatch(spark, modelRoot, pin, r2, 1L,
        arr.where(col("vec_id") >= mid))
      assert(SnapshotLog.latest(r1) == 1 && SnapshotLog.latest(r2) == 2)
      assert(logSet(r1) == logSet(r2),
             "admitted set depends on the batch split")
      assert(logSet(r1).nonEmpty, "gate admitted nothing — vacuous test")
      // double-fire batch 1 with DIFFERENT content: the committed
      // version wins (file list unchanged, no new version)
      val before = SnapshotLog.files(r2, 2)
      streaming.StreamOps.applyGateBatch(spark, modelRoot, pin, r2, 1L,
        arr.limit(3))
      assert(SnapshotLog.latest(r2) == 2 &&
               SnapshotLog.files(r2, 2) == before,
             "a double-fired batch replaced v2")
      // crash window: files added WITHOUT a manifest are invisible
      // (latest stays put) and the replayed commit lands the same
      // content — files-then-manifest, q298's discipline
      val r3 = Files.createTempDirectory("graft_gateadm_crash")
      streaming.StreamOps.applyGateBatch(spark, modelRoot, pin, r3, 0L,
        arr.where(col("vec_id") < mid))
      SnapshotLog.addFiles(spark, r3, "b0-v2",
        arr.where(col("vec_id") >= mid).limit(1)
          .select("vec_id", "cid", "nv", "xi"))
      assert(SnapshotLog.latest(r3) == 1,
             "orphan files must not advance the log")
      streaming.StreamOps.applyGateBatch(spark, modelRoot, pin, r3, 1L,
        arr.where(col("vec_id") >= mid))
      assert(logSet(r3) == logSet(r1), "crash+replay lost or doubled admits")
    } finally arr.unpersist()
  }

  test("q383 shape: multi-batch admit drain leaves superseded versions; keep-1 GC is invisible to the latest readback") {
    val SnapshotLog = sources.PartitionedOps.SnapshotLog
    val live = streaming.StreamOps.gateAdmitRoot(spark, sf)
    // the r18 drain geometry: dup-staged source, one file per trigger
    // → at least two committed versions (batch 2 = pure redelivery)
    val vs = SnapshotLog.versions(live)
    assert(vs.size >= 2, s"admit drain committed only $vs — the " +
      "multi-batch at-least-once geometry regressed to a single batch")
    // redelivery idempotence END TO END: versions only GROW the
    // admitted set (an already-admitted arrival redelivered later must
    // not double-insert or retract). Superset, not equality — with a
    // multi-part staged layout the first trigger may hold only part of
    // copy 1's arrivals (stageParts interleaves copies by mtime), so
    // v1 ⊂ v_last is legitimate geometry; only v_first ⊄ v_last would
    // be a correctness bug (r18 ADVICE: the first==last assertion was
    // single-file-geometry-dependent, not a product claim)
    def setOf(root: java.nio.file.Path, v: Int) =
      SnapshotLog.read(spark, root, v)
        .select("vec_id", "cid").as[(Long, Long)].collect().toSet
    assert(setOf(live, vs.head).subsetOf(setOf(live, vs.last)),
           "a later version lost or rewrote earlier admits")
    // keep-1 vacuum on a copy: drops all but the latest, collects the
    // superseded bucket files, and the latest reads back IDENTICAL
    val copy = Files.createTempDirectory("graft_admitlog_vac_spec")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(live).iterator.asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .foreach { p =>
        val rel = live.relativize(p)
        val dst = copy.resolve(rel.toString)
        java.nio.file.Files.createDirectories(dst.getParent)
        java.nio.file.Files.copy(p, dst)
      }
    val before = setOf(copy, SnapshotLog.latest(copy))
    val (dead, dropped) = SnapshotLog.vacuum(copy, keep = 1)
    assert(dropped == vs.dropRight(1), s"dropped $dropped, expected " +
      s"all but the latest of $vs")
    assert(dead.nonEmpty, "no superseded bucket files were collected")
    assert(setOf(copy, SnapshotLog.latest(copy)) == before,
           "retention disturbed the latest version's readback")
    // and the LIVE log is untouched
    assert(SnapshotLog.versions(live) == vs, "q383 touched the live log")
  }

  test("q330 shape: PIT enrichment is batch-equal under multi-batch drains") {
    // the declared q330 drains its staged dir in one AvailableNow
    // batch at test SF; the row-local claim ("any micro-batch split
    // yields the batch answer") is exercised HERE: 3 part files
    // drained one per trigger through the same stream-static join
    val dir = Files.createTempDirectory("graft_q330_split").toString
    Tables(spark, sf, "orders").repartition(3)
      .write.mode("overwrite").parquet(dir)
    val dim = operators.AdvancedOps.segmentDim(spark, sf)
    val schema = spark.read.parquet(dir).schema
    val o = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val enriched = o.join(dim, o("o_custkey") === dim("sk") &&
        (dim("valid_from").isNull ||
         dim("valid_from") <= o("o_orderdate")) &&
        (dim("valid_to").isNull || o("o_orderdate") < dim("valid_to")))
      .select(o("o_orderkey"), dim("segment").as("seg_at_order"),
              dim("version").as("dim_version"))
    val q0 = enriched.writeStream.format("memory")
      .queryName("graft_q330_split").outputMode("append").start()
    try {
      q0.processAllAvailable()
      assert(q0.recentProgress.count(_.numInputRows > 0) >= 2,
             "split drain must span multiple micro-batches")
      val got = spark.table("graft_q330_split")
        .groupBy("seg_at_order", "dim_version")
        .agg(count(lit(1)).as("orders"))
        .orderBy("seg_at_order", "dim_version").collect().toSeq
      val want = SparkEntry.queries("q330_stream_pit_enrich")(spark, sf)
        .collect().toSeq
      assert(got == want)
    } finally q0.stop()
  }

  test("q317 streaming top-k equals the batch top-10 (exact lane merge)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val want = Tables(spark, sf, "events")
      .groupBy(get_json_object(col("props"), "$.k").as("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(10)
      .as[(String, Long)].collect().toSeq
    val got = SparkEntry.queries("q317_stream_topk")(spark, sf)
      .as[(String, Long)].collect().toSeq
    assert(got == want)
  }
}
