package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.EventStreams

/** Runs the EventStreams transforms as REAL streaming queries (file source,
  * multiple micro-batches, memory sink) and asserts batch/stream parity. */
class StreamingSpec extends GraftSuite {

  // Stage the events fixture as 4 TIME-ORDERED parquet chunks, written
  // sequentially so the file source replays them in event-time order —
  // random chunking would make whole micro-batches arrive "late" behind
  // the watermark and get dropped (partial windows ≠ batch result).
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("graft-stream-").toString
    val w = org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")
    val chunked = Tables.events(spark, sf)
      .withColumn("chunk", ntile(4).over(w))
    (1 to 4).foreach { q =>
      chunked.filter(col("chunk") === q).drop("chunk")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    dir
  }

  private def runStream(name: String, out: DataFrame => DataFrame,
      mode: String): DataFrame = {
    val q = out(EventStreams.readEventStream(spark, streamDir))
      .writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  test("tumbling window: streaming result equals batch result") {
    val streamed = runStream("t_tumbling", EventStreams.tumblingCounts,
      "append")
    val batch = EventStreams.tumblingCounts(Tables.events(spark, sf))
    // append mode emits only watermark-closed windows; every emitted row
    // must match batch, and most windows must have been emitted.
    val diff = streamed.exceptAll(batch).count()
    assert(diff === 0, "streamed rows not found in batch result")
    assert(streamed.count() >= batch.count() - 5)
  }

  test("trending top-k ranked over streamed finalized windows equals batch") {
    // the stateful stage streams (tumbling counts, append = finalized
    // windows only); the rank is the foreachBatch step — applying it to
    // the emitted rows must reproduce the batch ranking exactly, which
    // also proves windows emit atomically (a partial window would rank
    // differently and fail exceptAll)
    val streamedCounts = runStream("t_trend", EventStreams.tumblingCounts,
      "append")
    val streamedRank = EventStreams.trendingTopK(streamedCounts, k = 2)
    val batch = EventStreams.trendingTopK(
      EventStreams.tumblingCounts(Tables.events(spark, sf)), k = 2)
    assert(streamedRank.exceptAll(batch).count() === 0)
    assert(streamedRank.count() > 0)
  }

  test("seasonal alerts: in-stream static join matches the batch dual") {
    val batchEvents = Tables.events(spark, sf)
    val expectation = EventStreams.seasonalExpectation(batchEvents)
    // the static expectation joins INSIDE the streaming query (the
    // deployment shape: re-broadcast per micro-batch after the
    // watermark-finalized window agg)
    val streamed = runStream("t_seasonal",
      ev => EventStreams.seasonalAlerts(
        EventStreams.tumblingCounts(ev), expectation),
      "append")
    val batch = EventStreams.seasonalAlerts(
      EventStreams.tumblingCounts(batchEvents), expectation)
    assert(streamed.exceptAll(batch).count() === 0,
      "streamed alert rows must all appear in the batch dual")
    assert(streamed.count() >= batch.count() - 5)
  }

  test("seasonal alerts: a cell with no historical baseline still alerts") {
    // Deployment shape: the expectation table comes from a HISTORICAL
    // corpus, so a brand-new event type has no baseline row. An inner
    // join silently dropped exactly that highest-lift anomaly (round-15
    // review); the left join must surface it with null expected and
    // alert=true, while baselined cells keep their computed lift.
    val batchEvents = Tables.events(spark, sf)
    val knownTypes = EventStreams.seasonalExpectation(batchEvents)
      .select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    val expectation = EventStreams.seasonalExpectation(batchEvents)
    val withNovel = EventStreams.tumblingCounts(batchEvents)
      .unionByName(EventStreams.tumblingCounts(
        batchEvents.withColumn("event_type", lit("never_seen_probe"))))
    val alerts = EventStreams.seasonalAlerts(withNovel, expectation)
    val novel = alerts.filter(col("event_type") === "never_seen_probe")
    assert(novel.count() > 0, "unbaselined cells must not be dropped")
    assert(novel.filter(!col("alert") || col("expected").isNotNull)
      .count() === 0, "unbaselined cells alert with null expected")
    // baselined rows unchanged by the join-type change
    assert(alerts.filter(col("event_type").isin(knownTypes.toSeq: _*) &&
      col("expected").isNull).count() === 0)
  }

  test("sliding window: streaming rows are a watermark-closed subset of batch") {
    val streamed = runStream("t_sliding", EventStreams.slidingCounts, "append")
    val batch = EventStreams.slidingCounts(Tables.events(spark, sf))
    assert(streamed.exceptAll(batch).count() === 0)
    assert(streamed.count() > 0)
  }

  test("session window: streaming rows match batch sessionization") {
    val streamed = runStream("t_session", EventStreams.sessionCounts, "append")
    val batch = EventStreams.sessionCounts(Tables.events(spark, sf))
    assert(streamed.exceptAll(batch).count() === 0)
    assert(streamed.count() > 0)
  }

  test("stream-stream interval join emits a subset equal to batch rows") {
    val streamed = runStream("t_interval",
      EventStreams.purchaseViewInterval, "append")
    val batch = EventStreams.purchaseViewInterval(Tables.events(spark, sf))
    assert(streamed.exceptAll(batch).count() === 0,
      "streamed join rows must all appear in the batch join")
    // most of the join output must have been emitted (tail withheld by
    // the final watermark is allowed)
    assert(streamed.count() >= (batch.count() * 0.9).toLong)
  }

  test("left-outer interval join emits null rows only after watermark expiry") {
    val streamed = runStream("t_interval_outer",
      EventStreams.purchaseViewIntervalOuter, "append")
    val batch = EventStreams.purchaseViewIntervalOuter(
      Tables.events(spark, sf))
    // every emitted row (matched or null-padded) must appear in batch
    assert(streamed.exceptAll(batch).count() === 0,
      "streamed outer-join rows must all appear in the batch result")
    // the outer semantics actually fired: null view rows were emitted for
    // purchases whose match window the watermark closed (the stream tail
    // may withhold some, so compare against batch with slack)
    val batchNulls = batch.filter(col("v_id").isNull).count()
    val streamedNulls = streamed.filter(col("v_id").isNull).count()
    assert(batchNulls > 0, "fixture should contain view-less purchases")
    assert(streamedNulls >= batchNulls / 2,
      s"expected most null rows emitted: $streamedNulls of $batchNulls")
  }

  test("stream-static enrichment equals the batch join exactly") {
    // Stateless stream-static join: no watermark withholding, so the
    // streamed result must equal the batch dual row-for-row.
    val dim = EventStreams.typeDim(spark)
    val streamed = runStream("t_enrich",
      ev => EventStreams.enrichWithTypeDim(ev, dim), "append")
    val batch = EventStreams.enrichWithTypeDim(
      Tables.events(spark, sf), dim)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
    assert(streamed.count() === batch.count())
  }

  test("stream-static anti-join dedup passes only unseen keys") {
    // incremental-ingest dedup: the static historic digest set filters
    // the stream per micro-batch; stateless, so streamed ≡ batch dual
    val historic = Tables.events(spark, sf)
      .filter(col("event_id") % 3 === 0).select("event_id")
    val streamed = runStream("t_ingest_dedup",
      ev => EventStreams.streamDedupAgainst(ev, historic, "event_id"),
      "append")
    val batch = EventStreams.streamDedupAgainst(
      Tables.events(spark, sf), historic, "event_id")
    assert(streamed.count() === batch.count())
    assert(streamed.filter(col("event_id") % 3 === 0).count() === 0)
    assert(streamed.exceptAll(batch).count() === 0)
  }

  test("streaming bloom gate: micro-batch verdicts equal the batch dual") {
    // The incoming crawl batch (doc_id % 5 == 0) staged as 3 parquet
    // chunks → 3 micro-batches; the Bloom artifact is built ONCE from
    // the corpus snapshot (doc_id % 5 != 0) and reused per batch. The
    // union of per-micro-batch verdicts must equal the batch operator's
    // verdict over the whole incoming set — exactness is per-doc, so the
    // batching is invisible.
    val docs = Tables.documents(spark, sf)
    val existing = docs.filter(col("doc_id") % 5 =!= 0)
    val incoming = docs.filter(col("doc_id") % 5 === 0)
    val dir = Files.createTempDirectory("graft-bloomstream-").toString
    (0 to 2).foreach { c =>
      incoming.filter(col("doc_id") % 3 === c)
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val key = substring(col("text"), 1, 64)
    val bloom = graft.ops.Dedup.buildDigestBloom(
      existing, key, expectedItems = 1000L)
    val got = collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    val q = EventStreams.streamBloomGate(
        EventStreams.readEventStream(spark, dir), existing,
        col("doc_id"), key, bloom) { verdicts =>
      got ++= verdicts.collect().map(r => (r.getLong(0), r.getBoolean(2)))
    }
    q.processAllAvailable()
    q.stop()
    val batch = graft.ops.Dedup.bloomIngestGate(
        existing, incoming, col("doc_id"), key, bloom)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toSet
    assert(got.size === batch.size, "micro-batches must cover every doc once")
    assert(got.toSet === batch)
    assert(batch.exists(_._2), "fixture should contain cross-split dups")
  }

  test("streaming dedup drops re-delivered events") {
    // Duplicate every event into a second file set → re-delivery.
    val dir = Files.createTempDirectory("graft-dedup-").toString
    val ev = Tables.events(spark, sf).limit(1000)
    ev.write.mode("overwrite").parquet(dir)
    ev.write.mode("append").parquet(dir) // same event_ids again
    val q = EventStreams.dedupEvents(
        EventStreams.readEventStream(spark, dir))
      .writeStream.format("memory").queryName("t_dedup")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("t_dedup").count() === 1000)
  }

  test("dedup divergence envelope: out-of-horizon re-delivery kept by " +
      "streaming, dropped by the batch dual (documented divergence)") {
    // dropDuplicatesWithinWatermark evicts a key once the watermark
    // passes first-seen + delay (10 min here) — that eviction is what
    // bounds state at 100 TB (round-15 fix). The flip side is the
    // divergence ENVELOPE this spec pins (the house documented-divergence
    // pattern, like the reference's int-division avg): a re-delivery
    // LATER than the horizon is treated as a brand-new event by the
    // stream, while the batch dual's plain dropDuplicates — global, no
    // horizon — still drops it. In-window re-deliveries agree (spec
    // above); out-of-window ones diverge BY DESIGN.
    import java.sql.Timestamp
    import spark.implicits._
    def ev(id: Long, t: String): (Long, Timestamp, Long, String, Double) =
      (id, Timestamp.valueOf(t), id % 7, "view", 1.0)
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    // batch 1: first delivery of id 1; batch 2 advances the watermark to
    // 00:20, past id 1's eviction point (00:00 + 10 min); batch 3 runs
    // WITH that watermark and evicts id 1's state at its end (eviction
    // lags the advance by one batch — measured, and consistent with
    // state cleanup running per-batch against the batch's watermark);
    // batch 4 re-delivers id 1 with an on-time ts → its state is gone,
    // so the stream emits it AGAIN
    val files = Seq(
      Seq(ev(1L, "2024-01-01 00:00:00")),
      Seq(ev(2L, "2024-01-01 00:30:00")),
      Seq(ev(3L, "2024-01-01 00:32:00")),
      Seq(ev(1L, "2024-01-01 00:33:00")))
    val dir = Files.createTempDirectory("graft-dedup-div-").toString
    files.foreach { rows =>
      rows.toDF(cols: _*).coalesce(1).write.mode("append").parquet(dir)
      Thread.sleep(50) // distinct mod-times: one file per micro-batch, in order
    }
    val q = EventStreams.dedupEvents(EventStreams.readEventStream(spark, dir))
      .writeStream.format("memory").queryName("t_dedup_div")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamedIds = spark.table("t_dedup_div")
      .select("event_id").collect().map(_.getLong(0)).toSeq.sorted
    // streaming: id 1 emitted twice (out-of-horizon re-delivery)
    assert(streamedIds === Seq(1L, 1L, 2L, 3L),
      s"stream must re-emit the evicted key, got $streamedIds")
    // batch dual: global dedup keeps exactly one row per id
    val batchIds = EventStreams.dedupEvents(
        spark.read.parquet(dir))
      .select("event_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(batchIds === Seq(1L, 2L, 3L))
  }

  test("watermark drops late out-of-order events exactly like the batch dual's filter") {
    // Evidence for the late-data story beyond parity on ordered fixtures:
    // drive the SAME file-source path through a directory where a later
    // file re-delivers events far behind the watermark, and assert the
    // dropped set is exactly what filtering them from the batch input
    // predicts. One file per micro-batch (readEventStream sets
    // maxFilesPerTrigger=1); the file source replays files in
    // modification-time order, so the watermark advances between files.
    import java.sql.Timestamp
    def ev(id: Long, t: String, typ: String): (Long, Timestamp, Long, String, Double) =
      (id, Timestamp.valueOf(t), id % 7, typ, 1.5)
    val f1 = (1L to 10L).map(i => ev(i, s"2024-01-01 00:${10 + i}:00", "view")) :+
      ev(11L, "2024-01-01 01:30:00", "view")
    // f2 advances the watermark to 03:30 - 10min = 03:20, closing (and
    // emitting) every window ending before it — including [00:00, 01:00).
    val f2 = Seq(ev(20L, "2024-01-01 03:00:00", "view"),
                 ev(21L, "2024-01-01 03:30:00", "view"))
    // f3's first two rows land in the already-closed [00:00, 01:00) window
    // → dropped; the 05:00 row is on time and pushes the watermark to
    // 04:50, closing the [03:00, 04:00) window too.
    val late = Seq(ev(30L, "2024-01-01 00:15:00", "view"),
                   ev(31L, "2024-01-01 00:45:00", "view"))
    val f3 = late :+ ev(32L, "2024-01-01 05:00:00", "view")

    import spark.implicits._
    val dir = Files.createTempDirectory("graft-late-").toString
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    Seq(f1, f2, f3).foreach { rows =>
      rows.toDF(cols: _*).coalesce(1).write.mode("append").parquet(dir)
    }
    val q = EventStreams.tumblingCounts(EventStreams.readEventStream(spark, dir))
      .writeStream.format("memory").queryName("t_late")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_late")

    val lateIds = late.map(_._1).toSet
    val all = (f1 ++ f2 ++ f3).toDF(cols: _*)
    val batchOnTime = EventStreams.tumblingCounts(
      all.filter(!col("event_id").isin(lateIds.toSeq: _*)))
    // every emitted row matches the batch dual over the on-time rows only
    assert(streamed.exceptAll(batchOnTime).count() === 0,
      "streamed output diverges from the late-filtered batch dual")
    // the targeted window counts only its 10 on-time events...
    val w0 = streamed
      .filter(col("window_start") === Timestamp.valueOf("2024-01-01 00:00:00"))
      .select("n_events").collect().map(_.getLong(0))
    assert(w0.toSeq === Seq(10L), s"late rows leaked into the closed window: ${w0.toSeq}")
    // ...and the test is discriminating: WITH the late rows the batch dual
    // says 12, so a watermark that failed to drop them would not pass.
    val w0All = EventStreams.tumblingCounts(all)
      .filter(col("window_start") === Timestamp.valueOf("2024-01-01 00:00:00"))
      .select("n_events").collect().map(_.getLong(0))
    assert(w0All.toSeq === Seq(12L))
  }

  test("foreachBatch upsert materializes the latest row per key") {
    val stateDir = Files.createTempDirectory("graft-upsert-").toString
    val q = EventStreams.upsertLatestByKey(
      EventStreams.readEventStream(spark, streamDir),
      keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
      stateDir = stateDir)
    q.processAllAvailable()
    q.stop()
    val got = EventStreams.readUpsertState(spark, stateDir)
    // batch dual: newest event per user over the whole fixture
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val expected = Tables.events(spark, sf)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    assert(got.count() === expected.count())
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("foreachBatch upsert resumes over existing state after a restart") {
    // Second lifecycle of the state table: a NEW query over a grown
    // source directory must merge onto the committed versions left by
    // the first run (pointer read path), and the final state must equal
    // the batch dual regardless of how batches were re-cut.
    val srcDir = Files.createTempDirectory("graft-upsert2-src-").toString
    val stateDir = Files.createTempDirectory("graft-upsert2-").toString
    val ev = Tables.events(spark, sf)
    val first = ev.filter(col("event_id") % 2 === 0)
    val second = ev.filter(col("event_id") % 2 === 1)
    first.coalesce(1).write.mode("append").parquet(srcDir)
    def run(): Unit = {
      val q = EventStreams.upsertLatestByKey(
        EventStreams.readEventStream(spark, srcDir),
        keyCol = "user_id", tsCol = "ts", tieCol = "event_id",
        stateDir = stateDir)
      q.processAllAvailable(); q.stop()
    }
    def committedVersion(): Long = {
      val p = new org.apache.hadoop.fs.Path(stateDir, "LATEST")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      val s = try new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
      finally in.close()
      s.stripPrefix("v=").toLong
    }
    run()
    assert(EventStreams.readUpsertState(spark, stateDir).count() ===
      first.select("user_id").distinct().count())
    val vAfterFirst = committedVersion()
    second.coalesce(1).write.mode("append").parquet(srcDir)
    run() // fresh query, same state dir
    // The restarted lifecycle resets streaming batchIds to 0, but version
    // numbers must keep increasing past the committed pointer — a write
    // into the live version dir would destroy the state being read.
    assert(committedVersion() > vAfterFirst,
      "restarted query must never reuse (and overwrite) a committed state version")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val expected = ev.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    val got = EventStreams.readUpsertState(spark, stateDir)
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("file sink with checkpoint recovers exactly-once across a restart") {
    // The durable-sink contract at scale: a stopped query restarted on
    // the same checkpoint must neither re-emit rows it already committed
    // nor miss rows that arrived while it was down.
    val srcDir = Files.createTempDirectory("graft-ck-src-").toString
    val outDir = Files.createTempDirectory("graft-ck-out-").toString
    val ckDir = Files.createTempDirectory("graft-ck-").toString
    val ev = Tables.events(spark, sf)
    val first = ev.filter(col("event_id") % 2 === 0)
    val second = ev.filter(col("event_id") % 2 === 1)
    first.coalesce(1).write.mode("append").parquet(srcDir)
    def start() = EventStreams.readEventStream(spark, srcDir)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .outputMode("append").start()
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(outDir).count() === first.count())
    // new data lands while the query is down; restart from the checkpoint
    second.coalesce(1).write.mode("append").parquet(srcDir)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val out = spark.read.parquet(outDir)
    assert(out.count() === ev.count(), "rows lost or duplicated on restart")
    assert(out.select("event_id").exceptAll(ev.select("event_id")).count() === 0)
    assert(ev.select("event_id").exceptAll(out.select("event_id")).count() === 0)
  }

  test("flatMapGroupsWithState keeps running per-user totals across batches") {
    import spark.implicits._
    val ds = EventStreams.readEventStream(spark, streamDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.Ev]
    val q = EventStreams.userRunningTotals(ds)
      .writeStream.format("memory").queryName("t_state")
      .outputMode("update").start()
    q.processAllAvailable()
    q.stop()
    // last update per user must equal the batch per-user totals
    val lastPerUser = spark.table("t_state")
      .groupBy("user_id").agg(max(col("n_events")).as("n_events"))
    val batch = Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    assert(lastPerUser.exceptAll(batch).count() === 0)
    assert(lastPerUser.count() === batch.count())
  }

  test("streaming anomaly flags match the batch expanding-mean dual") {
    import spark.implicits._
    val ds = EventStreams.readEventStream(spark, streamDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.Ev]
    val q = EventStreams.anomalyFlags(ds)
      .writeStream.format("memory").queryName("t_anomaly")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("t_anomaly")
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = EventStreams.anomalyFlagsBatch(Tables.events(spark, sf))
      .select("user_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty, "fixture should contain at least one spike")
  }

  test("streaming contribution cap matches the batch day-rank dual") {
    // streamDir's chunks are (ts, event_id)-ordered, so arrival respects
    // event time and the online rank must equal the batch window rank —
    // including state carried across micro-batch boundaries (a (user,
    // day) whose events straddle chunks keeps counting, not restart).
    import spark.implicits._
    val ds = EventStreams.readEventStream(spark, streamDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.Ev]
    val q = EventStreams.contributionCapStream(ds, maxPerDay = 3)
      .writeStream.format("memory").queryName("t_capstream")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("user_id", "day", "event_id", "day_rank", "admitted")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    val streamed = rows(spark.table("t_capstream"))
    val batch = rows(SparkEntry.queries("st15_contribution_cap")(spark, sf))
    assert(streamed === batch)
    assert(batch.exists(!_._5), "fixture should contain clipped events")
  }

  test("sessionize assigns gap-rule session indices per user") {
    import spark.implicits._
    val base = 1700000000000L
    def ts(min: Int) = new java.sql.Timestamp(base + min * 60000L)
    val ev = Seq(
      (1L, 1L, ts(0)),   // u1 s1
      (2L, 1L, ts(10)),  // u1 s1 (10 min gap)
      (3L, 1L, ts(60)),  // u1 s2 (50 min gap)
      (4L, 1L, ts(60)),  // u1 s2 (duplicate ts — event_id breaks the tie)
      (5L, 2L, ts(0)),   // u2 s1
      (6L, 3L, ts(0)),   // u3 s1
      (7L, 3L, ts(30))   // u3 s1: exactly 30 min is NOT > 30 min (strict,
                         // matching the session_window boundary)
    ).toDF("event_id", "user_id", "ts")
    val got = EventStreams.sessionize(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
      5L -> 1L, 6L -> 1L, 7L -> 1L))
  }

  test("idle user's running-total state expires after maxIdle") {
    import spark.implicits._
    // four micro-batches with explicit file mtimes so the file source
    // replays them in exactly this order (one file per trigger):
    //   1) A @ t0          -> A state created, timeout t0 + 30min
    //   2) B @ t0 + 120min -> watermark advances to t0 + 110min
    //   3) B @ t0 + 130min -> A's timeout (t0+30 < wm) fires: state freed
    //   4) A @ t0 + 135min -> A starts FRESH (n=1, not 2)
    val dir = Files.createTempDirectory("graft-idle-").toString
    val base = 1700000000000L
    var seen = Set.empty[String]
    var stamp = base
    def emit(id: Long, user: Long, minutes: Int): Unit = {
      Seq((id, new java.sql.Timestamp(base + minutes * 60000L), user,
          "view", 1.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(dir)
      val fresh = new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && !seen(f.getName))
      stamp += 60000
      fresh.foreach(f => f.setLastModified(stamp))
      seen ++= fresh.map(_.getName)
    }
    emit(1L, 1L, 0)
    emit(2L, 2L, 120)
    emit(3L, 2L, 130)
    emit(4L, 1L, 135)
    val ds = EventStreams.readEventStream(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.Ev]
    val q = EventStreams.userRunningTotals(ds, maxIdle = "30 minutes")
      .writeStream.format("memory").queryName("t_idle")
      .outputMode("update").start()
    q.processAllAvailable()
    q.stop()
    val aCounts = spark.table("t_idle").filter(col("user_id") === 1L)
      .select("n_events").collect().map(_.getLong(0)).toSeq
    // two updates for A, BOTH n=1: the second event found no prior state
    // (without expiry this would be Seq(1, 2))
    assert(aCounts.sorted === Seq(1L, 1L))
    // B stayed within maxIdle and accumulated normally
    val bMax = spark.table("t_idle").filter(col("user_id") === 2L)
      .agg(max("n_events")).collect().head.getLong(0)
    assert(bMax === 2L)
  }
}
