package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming slice over the events schema — the capability the
  * reference has none of (SURVEY.md §2g). Transform functions are written
  * against plain DataFrames so the SAME code runs in batch (oracle-checked
  * in StreamingQueries) and as a streaming query (exercised in
  * StreamingSpec via file-source + memory-sink); that batch/stream parity
  * is exactly Structured Streaming's contract.
  *
  * Scale notes: watermarks bound state; windowed aggregates shuffle on
  * (window, key); dedup state is pruned via dropDuplicatesWithinWatermark
  * (plain dropDuplicates would only prune if the event-time column were a
  * dedup key). The stateful session operator uses flatMapGroupsWithState
  * with event-time timeout — state per active user only.
  */
object EventStreams {

  /** Tumbling 1-hour windows per event type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // Exact decimal accumulation, double on the way out: the compared
        // value renders identically across engines (see OracleSafe).
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding 1-hour windows every 15 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Per-window trending top-k: rank event types inside each tumbling
    * 1-hour window by count (ties to the first type name) and keep the
    * top `k`. On a BATCH frame this is the full window agg + rank. On a
    * stream, rank-over-window isn't incrementally computable — the
    * streaming deployment keeps [[tumblingCounts]] as the stateful
    * (watermark-bounded) stage and applies this ranking per finalized
    * window in `foreachBatch` (append mode emits every (window, type)
    * row of a window together once the watermark passes its end, so the
    * per-batch rank is exact — StreamingSpec drives exactly that shape).
    * Shuffle keys on (window, type) then window — never a global
    * partition. */
  def trendingTopK(windowCounts: DataFrame, k: Int = 2): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"))
      .orderBy(col("n_events").desc, col("event_type").asc)
    windowCounts
      .select("window_start", "event_type", "n_events")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Session windows: 30-minute inactivity gap per user. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("session_start"), col("user_id"),
        col("n_events"))

  /** Batch sessionization: label every EVENT with its per-user session
    * index under the inactivity-gap rule (a new session starts when the
    * user's previous event is more than `gapMinutes` older — strictly,
    * matching [[sessionCounts]]'s boundary). [[sessionCounts]] aggregates
    * per session; this keeps event granularity — the form downstream
    * feature pipelines join on. Gaps-and-islands: one `lag` to flag
    * boundaries, one running sum to number them; both windows are
    * PARTITIONED by user (shuffle on user_id, no global window), totally
    * ordered by (ts, event_id) so duplicate timestamps sessionize
    * deterministically. Batch-only — lag/running-sum windows don't exist
    * on streams; the streaming analog of event labeling is
    * flatMapGroupsWithState keyed on user. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevTs = lag(col("ts"), 1).over(order)
    events.select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("_new_session",
        when(prevTs.isNull ||
          unix_micros(col("ts")) - unix_micros(prevTs) >
            gapMinutes * 60L * 1000000L, 1L)
        .otherwise(0L))
      .withColumn("session_idx", sum(col("_new_session")).over(running))
      .drop("_new_session")
  }

  /** Stream-stream interval join: each purchase joined to the same user's
    * views from the preceding hour. In streaming, BOTH sides carry
    * watermarks and the join condition bounds event-time distance, so
    * state for each side is pruned once the other side's watermark passes
    * — the only way a stream-stream join stays bounded at scale. The same
    * code runs in batch (oracle-checked as st6). */
  def purchaseViewInterval(events: DataFrame): DataFrame =
    purchaseViewIntervalJoin(events, "inner")

  /** LEFT OUTER variant: purchases with no view in the preceding hour
    * are still emitted, with null view columns — in streaming the null
    * row can only be emitted once the VIEW side's watermark passes the
    * purchase's match window (until then a matching view could still
    * arrive), which is exactly the state-expiry semantics the watermark
    * encodes. Batch dual is the plain left join (oracle-checked as st9). */
  def purchaseViewIntervalOuter(events: DataFrame): DataFrame =
    purchaseViewIntervalJoin(events, "left_outer")

  private def purchaseViewIntervalJoin(
      events: DataFrame, joinType: String): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("v_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "10 minutes")
    purchases.join(views,
      col("user_id") === col("v_user") &&
      col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
      col("v_ts") <= col("p_ts"), joinType)
      .select(col("p_id"), col("user_id"), col("p_ts"), col("v_id"),
        col("v_ts"))
  }

  /** Exactly-once-ish dedup on event_id within the watermark horizon.
    *
    * `dropDuplicatesWithinWatermark`, not `dropDuplicates`: with the
    * plain variant the watermark only evicts dedup state when the
    * EVENT-TIME column is part of the dedup key, so keying on event_id
    * alone would grow state forever on a unique-id stream (every id ever
    * seen retained — the exact leak the watermark exists to prevent;
    * round-15 review). The within-watermark variant evicts each key once
    * the watermark passes its first-seen event time + delay, which is
    * precisely the "re-delivery happens within the horizon" contract
    * this operator documents. Spark rejects the within-watermark variant
    * on BATCH frames outright, so the st4 oracle dual branches to the
    * plain dropDuplicates — which in batch is exactly the semantics the
    * streaming side guarantees for re-deliveries inside the horizon
    * (global dedup on event_id; a batch job has no late data). */
  def dedupEvents(events: DataFrame): DataFrame = {
    val wm = events.withWatermark("ts", "10 minutes")
    if (events.isStreaming) wm.dropDuplicatesWithinWatermark("event_id")
    else wm.dropDuplicates("event_id")
  }

  /** Incremental-ingest dedup: keep only stream rows whose key is NOT in
    * the static historic set — a stream-static LEFT ANTI join, the shape
    * every continuous crawl/ingest pipeline runs in front of the corpus.
    * The static side is consulted per micro-batch under Spark's
    * stream-static contract, so at 100 TB that side must be the compact
    * DIGEST table (content hashes, ~32 B/row, bucketed on the hash), not
    * raw documents — the same key discipline as `Dedup.exactDedup`.
    * Batch dual = the identical anti join (st12 oracle). */
  def streamDedupAgainst(
      stream: DataFrame, historicKeys: DataFrame, key: String): DataFrame =
    stream.join(historicKeys, Seq(key), "left_anti")

  /** Tiny per-event-type weight dimension shared by the st7 batch dual
    * and the streaming spec. Weights are dyadic-exact doubles so the
    * enrichment product is bit-identical across engines. */
  def typeDim(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(("view", 0.25), ("click", 0.5), ("signup", 1.0),
      ("purchase", 2.0), ("error", 0.0)).toDF("event_type", "weight")
  }

  /** Stream-static enrichment join: the event stream joined to a static
    * dimension on event_type. The static side is (re-)broadcast per
    * micro-batch — no state, no watermark needed; this is the standard
    * way to attach dimension attributes to a stream at scale (a dim too
    * big to broadcast becomes a bucketed static table instead). The
    * same code runs in batch (oracle-checked as st7). */
  def enrichWithTypeDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("user_id"),
        col("value"), col("weight"),
        (col("value") * col("weight")).as("weighted_value"))

  // ---- custom state: flatMapGroupsWithState ------------------------------

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)
  case class UserAgg(user_id: Long, n_events: Long, total_value: Double)

  /** Running per-user totals via explicit state — the reference's A3
    * generic-aggregate contract (init/update/merge/emit) done as managed
    * streaming state. Update-mode output: one row per user per batch.
    *
    * State is BOUNDED: event-time timeout drops a user's state once the
    * watermark passes their last event by `maxIdle` (a `NoTimeout`
    * version would hold one state entry per user forever — fine on a
    * fixture, an unbounded leak on a 100 TB event stream). A user who
    * returns after expiry restarts from zero — `maxIdle` is the
    * retention horizon, sized to the analysis window (the default is
    * deliberately generous; an hourly-engagement pipeline would use
    * hours). The timeout anchors to `max(last event, watermark)` so a
    * straggler group whose events are already behind the watermark still
    * gets a valid (future) expiry rather than an analysis error. */
  def userRunningTotals(
      events: Dataset[Ev], maxIdle: String = "30 days"): Dataset[UserAgg] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, rows: Iterator[Ev], state: GroupState[UserAgg]) => {
          if (state.hasTimedOut) {
            // no events for maxIdle past the watermark: free the state;
            // emit nothing (the last update already carried the totals)
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(UserAgg(uid, 0L, 0.0))
            var n = prev.n_events
            var tot = prev.total_value
            var maxTs = Long.MinValue
            rows.foreach { e =>
              n += 1; tot += e.value
              if (e.ts.getTime > maxTs) maxTs = e.ts.getTime
            }
            val next = UserAgg(uid, n, tot)
            state.update(next)
            state.setTimeoutTimestamp(
              math.max(maxTs, state.getCurrentWatermarkMs + 1), maxIdle)
            Iterator.single(next)
          }
        })
  }

  case class Anomaly(user_id: Long, event_id: Long, value: Double,
    prev_mean: Double, n_prev: Long)

  /** Streaming anomaly detection: flag an event whose value exceeds
    * `k ×` the SAME USER'S running mean over at least `minPrev` prior
    * events — the streaming dual of the batch `ev3_spikes` detector,
    * with the trailing window replaced by explicit running state
    * (count + exact total; the mean derives, so state is two numbers
    * per user, not a value buffer).
    *
    * Same bounded-state discipline as [[userRunningTotals]]: event-time
    * timeout drops idle users once the watermark passes `maxIdle`, and
    * the timeout anchors to `max(last event, watermark)`. Within a
    * micro-batch, rows are folded in (ts, event_id) order so replayed
    * batches make identical decisions — flags depend on fold order, and
    * iterator order inside a batch is not otherwise guaranteed. The sort
    * key is the FULL-precision instant (epoch second, nano), not
    * Timestamp.getTime: getTime truncates to milliseconds, so two events
    * in the same millisecond would fold in event_id order while the
    * batch dual orders by the microsecond ts — a parity break on
    * sub-millisecond fixtures (round-15 review). */
  def anomalyFlags(
      events: Dataset[Ev], k: Double = 3.0, minPrev: Long = 3,
      maxIdle: String = "30 days"): Dataset[Anomaly] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, rows: Iterator[Ev], state: GroupState[UserAgg]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var agg = state.getOption.getOrElse(UserAgg(uid, 0L, 0.0))
            var maxTs = Long.MinValue
            val out = Vector.newBuilder[Anomaly]
            rows.toSeq.sortBy(e => (e.ts.toInstant.getEpochSecond,
                e.ts.toInstant.getNano, e.event_id)).foreach { e =>
              if (agg.n_events >= minPrev) {
                val mean = agg.total_value / agg.n_events
                if (e.value > k * mean)
                  out += Anomaly(uid, e.event_id, e.value, mean, agg.n_events)
              }
              agg = UserAgg(uid, agg.n_events + 1, agg.total_value + e.value)
              if (e.ts.getTime > maxTs) maxTs = e.ts.getTime
            }
            state.update(agg)
            state.setTimeoutTimestamp(
              math.max(maxTs, state.getCurrentWatermarkMs + 1), maxIdle)
            out.result().iterator
          }
        })
  }

  /** Batch dual of [[anomalyFlags]]: the expanding-mean flag as a plain
    * window program (per-user strict-preceding DECIMAL-exact running sum
    * and count), oracle-checkable cross-engine. The streaming path folds
    * plain doubles in state, so a value sitting within an ulp of the
    * k·mean boundary could in principle flag differently — parity tests
    * use clear margins; the DECISION RULE is identical. */
  def anomalyFlagsBatch(
      events: DataFrame, k: Double = 3.0, minPrev: Long = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("n_prev", count(lit(1)).over(w))
      .withColumn("prev_mean",
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .over(w).cast("double") / col("n_prev").cast("double"))
      .where(col("n_prev") >= minPrev && col("value") > lit(k) * col("prev_mean"))
      .select(col("user_id"), col("event_id"), col("value"),
        col("prev_mean"), col("n_prev"))
  }

  /** Streaming upsert (CDC-style "latest row per key" materialization)
    * via foreachBatch — the standard pattern for maintaining a keyed
    * state table on a plain-file sink without a transactional format.
    * Each micro-batch merges its rows over the current state and keeps
    * the newest row per key (event-time desc, `tieCol` desc for exact
    * determinism).
    *
    * Crash safety: each merge writes a FRESH version dir
    * `stateDir/v=<n>` where n is derived monotonically from the
    * committed pointer (`n = committed + 1`), never from the streaming
    * batchId — a restarted query (fresh checkpoint) restarts batchIds at
    * 0, and naming versions after batchIds would make batch 0 overwrite
    * the very directory it is reading (Spark's overwrite deletes the
    * target before the new write commits → total state loss). The
    * invariant is: the dir LATEST points at is NEVER a write target.
    * Only after the new version is fully durable does the pointer
    * advance, via write-to-temp + atomic rename (`LATEST.tmp` →
    * `LATEST`), so a crash at ANY point leaves the old pointer and the
    * old state intact. Re-running a batch after a failure merges the
    * same rows again — latest-per-key is idempotent, so the replay
    * commits a new version with identical content, which is what makes
    * foreachBatch's at-least-once delivery exactly-once in effect. A
    * missing state is detected EXPLICITLY via the pointer file — real
    * read errors propagate instead of silently resetting months of
    * state to empty.
    *
    * Rename atomicity holds on HDFS and local filesystems; object
    * stores (S3 & co.) emulate rename as copy+delete — there, point
    * `stateDir` at an HDFS/consistent volume or use a transactional
    * table format for the pointer.
    *
    * Scale note: state size = distinct keys, not event history; the
    * merge is one window over (current ∪ batch) shuffled on the key. A
    * production deployment at 100 TB would partition the state dir by
    * key range and rewrite only touched partitions. */
  def upsertLatestByKey(
      stream: DataFrame, keyCol: String, tsCol: String, tieCol: String,
      stateDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    stream.writeStream.outputMode("update").foreachBatch {
      (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val hconf = s.sparkContext.hadoopConfiguration
        val pointer = new org.apache.hadoop.fs.Path(stateDir, "LATEST")
        val fs = pointer.getFileSystem(hconf)
        val currentVersion: Option[String] =
          if (!fs.exists(pointer)) None
          else {
            val in = fs.open(pointer)
            try Some(new String(
              org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
            finally in.close()
          }
        val current = currentVersion match {
          case Some(v) => s.read.parquet(s"$stateDir/$v")
          case None => batch.limit(0)
        }
        val w = Window.partitionBy(col(keyCol))
          .orderBy(col(tsCol).desc, col(tieCol).desc)
        val next = current.unionByName(batch)
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
        // Monotonic successor of the COMMITTED version — never the
        // batchId (restart resets batchIds to 0) and therefore never the
        // directory `current` is reading from. A replay after a crash
        // between version-write and pointer-advance re-derives the same
        // successor and overwrites only the uncommitted dir.
        val newVersion =
          s"v=${currentVersion.map(_.stripPrefix("v=").toLong + 1L).getOrElse(0L)}"
        require(!currentVersion.contains(newVersion),
          s"refusing to overwrite live state version $newVersion")
        next.write.mode("overwrite").parquet(s"$stateDir/$newVersion")
        // commit: advance the pointer only after the version is durable,
        // via temp-file + atomic rename (a truncate-in-place create()
        // would leave an empty/partial pointer if we crash mid-write)
        val tmp = new org.apache.hadoop.fs.Path(stateDir, "LATEST.tmp")
        val out = fs.create(tmp, true)
        try out.write(newVersion.getBytes("UTF-8")) finally out.close()
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          fs.makeQualified(tmp).toUri, hconf)
        fc.rename(fs.makeQualified(tmp), fs.makeQualified(pointer),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        // best-effort cleanup of versions older than the previous one
        // (the previous stays as the rollback target)
        fs.listStatus(new org.apache.hadoop.fs.Path(stateDir))
          .filter(_.isDirectory)
          .map(_.getPath)
          .filter(p => p.getName.startsWith("v=") &&
            p.getName != newVersion && !currentVersion.contains(p.getName))
          .foreach(p => fs.delete(p, true))
    }.start()
  }

  /** Read the current committed state written by [[upsertLatestByKey]]
    * (resolves the LATEST pointer to its version directory). */
  def readUpsertState(spark: SparkSession, stateDir: String): DataFrame = {
    val pointer = new org.apache.hadoop.fs.Path(stateDir, "LATEST")
    val fs = pointer.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(pointer), s"no committed state under $stateDir")
    val in = fs.open(pointer)
    val v =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
      finally in.close()
    spark.read.parquet(s"$stateDir/$v")
  }

  /** Hour-of-week expectation table from a HISTORICAL batch corpus — the
    * static side of [[seasonalAlerts]] (ev21's baseline resolved to an
    * expected-count-per-window-occurrence): cell count / number of dates
    * that weekday occurs in the corpus. ≤ types·168 rows; at scale a
    * periodically refreshed table, here recomputed per run. Exact longs,
    * one closing division. */
  def seasonalExpectation(events: DataFrame): DataFrame = {
    val cells = events.select(col("event_type"),
        (weekday(to_date(col("ts"))) + 1).as("dow"),
        hour(col("ts")).as("hour"))
      .groupBy("event_type", "dow", "hour")
      .agg(count(lit(1)).as("cell_n"))
    val dows = events.select(to_date(col("ts")).as("d")).distinct()
      .select((weekday(col("d")) + 1).as("dow"))
      .groupBy("dow").agg(count(lit(1)).as("n_occurrences"))
    cells.join(dows, "dow")
      .select(col("event_type"), col("dow"), col("hour"),
        (col("cell_n").cast("double") / col("n_occurrences").cast("double"))
          .as("expected"))
  }

  /** Streaming seasonal-baseline alerting — the live half of ev21's
    * story: each finalized tumbling-hour window count ([[tumblingCounts]],
    * the watermark-bounded stateful stage) stream-static-joins the
    * broadcast expectation table on its (type, weekday, hour) cell, and
    * observed/expected ≥ k raises the alert. The static side re-broadcasts
    * per micro-batch (≤ types·168 rows — constant at any corpus size);
    * the same code runs in batch and is oracle-checked as st13.
    *
    * LEFT join, not inner (round-15 review): in deployment the
    * expectation table comes from a HISTORICAL corpus, so a brand-new
    * event type (or a never-seen (type, dow, hour) cell) has no baseline
    * row — an inner join would silently drop exactly the
    * highest-lift anomaly the detector exists for. A cell with traffic
    * but no baseline alerts unconditionally (null expected/lift, alert
    * true). On the st13 fixture both tables derive from the same corpus,
    * so every cell matches and the dual is unchanged. */
  def seasonalAlerts(
      windowCounts: DataFrame, expectation: DataFrame,
      k: Double = 2.0): DataFrame =
    windowCounts
      .withColumn("dow", weekday(to_date(col("window_start"))) + 1)
      .withColumn("hour", hour(col("window_start")))
      .join(broadcast(expectation), Seq("event_type", "dow", "hour"), "left")
      .select(col("window_start"), col("event_type"), col("n_events"),
        col("expected"),
        (col("n_events").cast("double") / col("expected"))
          .as("observed_lift"))
      .withColumn("alert",
        coalesce(col("observed_lift") >= lit(k), lit(true)))

  /** File-source streaming read from a directory of (µs-timestamp) parquet
    * files, one file per micro-batch — the standard way to drive a
    * streaming query from static fixtures. Schema is taken from a batch
    * read of the same directory. */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)
  }

  case class CapDecision(user_id: Long, day: Long, event_id: Long,
    day_rank: Long, admitted: Boolean)

  /** Streaming per-(user, UTC day) contribution cap — the ingest-time
    * form of [[graft.ops.EventAnalytics.contributionCap]]: admit at most
    * `maxPerDay` events per user per day AT ARRIVAL, so the bound holds
    * online (the batch form can only report what should have been
    * clipped after the fact). Per-event decision record
    * (user, day, event_id, day_rank, admitted).
    *
    * State is ONE counter per active (user, day) key — the minimum any
    * rate-limit can carry — expired by event-time timeout once the
    * watermark passes `maxIdle` beyond the day's last event, so state
    * size tracks the active-user×day working set, never history. Within
    * a micro-batch, rows fold in (ts, event_id) order; across batches,
    * rank follows arrival order — identical to the batch dual whenever
    * arrival respects event time (the parity StreamingSpec pins), and
    * the honest online semantics when it doesn't (a late event spends
    * whatever budget is left, which is what an ingest gate must do).
    * Day = exact floor division of epoch-ms, same day numbering as the
    * batch operator. */
  def contributionCapStream(
      events: Dataset[Ev], maxPerDay: Int,
      maxIdle: String = "2 days"): Dataset[CapDecision] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(e => (e.user_id, Math.floorDiv(e.ts.getTime, 86400000L)))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: (Long, Long), rows: Iterator[Ev], state: GroupState[Long]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var n = state.getOption.getOrElse(0L)
            var maxTs = Long.MinValue
            // full-precision instant, not ms-truncated getTime — same
            // batch-parity rationale as the anomalyFlags fold order
            val out = rows.toSeq.sortBy(e => (e.ts.toInstant.getEpochSecond,
                e.ts.toInstant.getNano, e.event_id))
              .map { e =>
                n += 1
                if (e.ts.getTime > maxTs) maxTs = e.ts.getTime
                CapDecision(key._1, key._2, e.event_id, n, n <= maxPerDay)
              }
            state.update(n)
            state.setTimeoutTimestamp(
              math.max(maxTs, state.getCurrentWatermarkMs + 1), maxIdle)
            out.iterator
          }
        })
  }

  /** The streaming form of [[graft.ops.Dedup.bloomIngestGate]] — the
    * continuous-crawl front door the batch operator is named for. The
    * gate contains a batch-side aggregation (candidate distinct) and a
    * broadcast of a query-derived frame, neither of which a single
    * continuous query supports, so it runs under `foreachBatch`: each
    * micro-batch is a plain batch DataFrame, the per-batch probe+verify
    * is the UNMODIFIED batch operator, and `sink` receives its exact
    * verdict frame. The Bloom artifact is built ONCE from the corpus
    * snapshot and reused across every micro-batch (`bloom` parameter —
    * rebuild-per-batch would re-scan the corpus each trigger); the
    * existing-side digest scan in the verify step is the stream-static
    * contract st12 documents: at 100 TB it is the compact digest table,
    * consulted per micro-batch, never raw documents. Batch dual = the
    * identical operator on the whole batch (st14 oracle). */
  def streamBloomGate(
      stream: DataFrame, existing: DataFrame,
      id: org.apache.spark.sql.Column, key: org.apache.spark.sql.Column,
      bloom: org.apache.spark.util.sketch.BloomFilter)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.outputMode("update").foreachBatch {
      (batch: DataFrame, _: Long) =>
        sink(graft.ops.Dedup.bloomIngestGate(existing, batch, id, key, bloom))
    }.start()
}
