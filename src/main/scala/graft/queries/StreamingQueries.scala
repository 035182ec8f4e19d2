package graft.queries

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.sources.Tables

/** Batch duals of the streaming transforms — the exact same
  * EventStreams.* code applied to the static events table (Structured
  * Streaming's batch/stream parity makes this a meaningful check), with
  * DuckDB oracles: tumbling = date_trunc, sliding = unnested bucket list,
  * session = gaps-and-islands. StreamingSpec runs the same transforms as
  * real streams (file source → memory sink) and asserts equality with
  * these batch results.
  */
object StreamingQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    // Batch dual of the streaming per-(user, day) contribution cap
    // (EventStreams.contributionCapStream): per-event admit/reject by
    // (ts, event_id) day-rank — identical decisions whenever arrival
    // respects event time (StreamingSpec pins the parity).
    "st15_contribution_cap" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          floor(unix_micros(col("ts")) / lit(86400000000L))
            .cast("long").as("day"))
        .withColumn("day_rank", row_number().over(w).cast("long"))
        .select(col("user_id"), col("day"), col("event_id"),
          col("day_rank"), (col("day_rank") <= 3).as("admitted"))
        .orderBy("user_id", "day", "day_rank")
    }),

    "st1_tumbling_window" -> ((s, d) =>
      EventStreams.tumblingCounts(Tables.events(s, d))
        .orderBy("window_start", "event_type")),

    "st2_sliding_window" -> ((s, d) =>
      EventStreams.slidingCounts(Tables.events(s, d))
        .orderBy("window_start", "event_type")),

    "st3_session_window" -> ((s, d) =>
      EventStreams.sessionCounts(Tables.events(s, d))
        .orderBy("user_id", "session_start")),

    "st4_dedup_events" -> ((s, d) =>
      EventStreams.dedupEvents(Tables.events(s, d))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_distinct_events"))
        .orderBy("event_type")),

    // Event-level sessionization (gaps-and-islands): every event labeled
    // with its per-user session index — st3 aggregates sessions, this
    // keeps event granularity for downstream feature joins.
    "st8_sessionize" -> ((s, d) =>
      EventStreams.sessionize(Tables.events(s, d))
        .orderBy("user_id", "ts", "event_id")),

    // Stream-stream interval join, batch dual (purchases × prior-hour
    // views per user).
    "st6_interval_join" -> ((s, d) =>
      EventStreams.purchaseViewInterval(Tables.events(s, d))
        .orderBy("p_id", "v_id")),

    // LEFT OUTER stream-stream interval join, batch dual: unmatched
    // purchases keep null view columns — streaming emits these on
    // watermark expiry (StreamingSpec proves the streamed rows match
    // this batch result).
    "st9_interval_join_outer" -> ((s, d) =>
      EventStreams.purchaseViewIntervalOuter(Tables.events(s, d))
        .orderBy(col("p_id"), col("v_id").asc_nulls_first)),

    // Stream-static enrichment join, batch dual: per-type weights from a
    // tiny static dim (broadcast per micro-batch when streaming).
    "st7_stream_enrich" -> ((s, d) =>
      EventStreams.enrichWithTypeDim(
        Tables.events(s, d), EventStreams.typeDim(s))
        .orderBy("event_id")),

    // Incremental-ingest dedup (batch dual of the stream-static LEFT
    // ANTI join): events whose id is NOT in the simulated historic
    // digest set (id % 3 = 0), counted per type.
    // Batch dual of the streaming Bloom ingest gate (foreachBatch form,
    // EventStreams.streamBloomGate): per-source verdict counts over the
    // same corpus/batch split as dd22. The verdict is exact (bloom false
    // positives die in the verification), so the dual is plain SQL.
    "st14_bloom_ingest_gate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.ops.Dedup.bloomIngestGate(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          col("doc_id"), substring(col("text"), 1, 64),
          expectedItems = 1000L)
        .join(docs.select(col("doc_id").as("incoming_id"), col("source")),
          "incoming_id")
        .groupBy("source", "is_dup")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("source", "is_dup")
    }),

    "st12_ingest_dedup" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val historic = ev.filter(col("event_id") % 3 === 0)
        .select("event_id")
      EventStreams.streamDedupAgainst(ev, historic, "event_id")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_new_events"))
        .orderBy("event_type")
    }),

    // Gap-filled hourly series: generate the full hour spine between min
    // and max event time, left-join the actual counts, fill zeros — the
    // standard time-series densification (spine generation is one tiny
    // driver-free sequence + explode; the join shuffles on the hour key).
    "st5_gap_fill" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val hourly = ev
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_events"))
      val bounds = ev.agg(
        date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
      val spine = bounds.select(
        explode(expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
      spine.join(hourly, Seq("hour"), "left_outer")
        .select(col("hour"), coalesce(col("n_events"), lit(0L)).as("n_events"))
        .orderBy("hour")
    }),

    // Trending top-2 event types per tumbling hour, batch dual — the
    // streaming deployment ranks finalized windows in foreachBatch
    // (StreamingSpec proves stream/batch parity).
    "st10_trending" -> ((s, d) =>
      EventStreams.trendingTopK(
        EventStreams.tumblingCounts(Tables.events(s, d)), k = 2)
        .orderBy("window_start", "rank")),

    // Expanding-mean anomaly flags, batch dual of the stateful streaming
    // detector (EventStreams.anomalyFlags — StreamingSpec proves parity).
    "st11_anomaly_flags" -> ((s, d) =>
      EventStreams.anomalyFlagsBatch(Tables.events(s, d))
        .orderBy("user_id", "event_id")),

    // Seasonal-baseline alerting, batch dual — live tumbling-hour counts
    // vs the hour-of-week expectation (ev21's baseline as an expected
    // count per window occurrence), alert at 2× lift. The streaming
    // deployment broadcast-joins the static expectation per micro-batch
    // (StreamingSpec proves stream/batch parity).
    "st13_seasonal_alerts" -> ((s, d) => {
      val ev = Tables.events(s, d)
      EventStreams.seasonalAlerts(
        EventStreams.tumblingCounts(ev),
        EventStreams.seasonalExpectation(ev), k = 2.0)
        .orderBy("window_start", "event_type")
    })
  )

  val oracle: Map[String, String] = Map(
    "st1_tumbling_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "st2_sliding_window" ->
      """WITH buckets AS (
           SELECT event_type,
             unnest([time_bucket(INTERVAL '15 minutes', ts) - INTERVAL (k*15) MINUTE
                     for k in range(0, 4)]) AS window_start,
             ts
           FROM events)
         SELECT window_start, event_type, count(*) AS n_events
         FROM buckets
         WHERE ts < window_start + INTERVAL '1 hour'
         GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "st3_session_window" ->
      """WITH ordered AS (
           SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
           FROM events),
         flagged AS (
           SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                    OR ts - prev_ts > INTERVAL '30 minutes' THEN 1
                  ELSE 0 END AS new_session
           FROM ordered),
         numbered AS (
           SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id
               ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_no
           FROM flagged)
         SELECT min(ts) AS session_start, user_id, count(*) AS n_events
         FROM numbered GROUP BY user_id, session_no
         ORDER BY user_id, session_start""",
    "st14_bloom_ingest_gate" ->
      """SELECT i.source,
           EXISTS (SELECT 1 FROM documents e
                   WHERE e.doc_id % 5 <> 0
                     AND substr(e.text, 1, 64) = substr(i.text, 1, 64))
             AS is_dup,
           CAST(count(*) AS BIGINT) AS n_docs
         FROM documents i WHERE i.doc_id % 5 = 0
         GROUP BY 1, 2 ORDER BY source, is_dup""",
    "st12_ingest_dedup" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_new_events
         FROM events WHERE event_id % 3 <> 0
         GROUP BY event_type ORDER BY event_type""",
    // day = exact integer-µs floor division (never a DATE cast); BIGINT
    // casts on the rank and day
    "st15_contribution_cap" ->
      """WITH o AS (SELECT user_id, ts, event_id,
            CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
          FROM events),
          r AS (SELECT user_id, day, event_id,
            CAST(row_number() OVER (PARTITION BY user_id, day
              ORDER BY ts, event_id) AS BIGINT) AS day_rank
          FROM o)
          SELECT user_id, day, event_id, day_rank,
            day_rank <= 3 AS admitted
          FROM r ORDER BY user_id, day, day_rank""",
    "st4_dedup_events" ->
      """SELECT event_type, count(DISTINCT event_id) AS n_distinct_events
         FROM events GROUP BY event_type ORDER BY event_type""",
    "st8_sessionize" ->
      """WITH ordered AS (
           SELECT event_id, user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
           FROM events),
         flagged AS (
           SELECT event_id, user_id, ts,
             CASE WHEN prev_ts IS NULL
                    OR ts - prev_ts > INTERVAL '30 minutes' THEN 1
                  ELSE 0 END AS new_session
           FROM ordered),
         numbered AS (
           SELECT event_id, user_id, ts,
             CAST(sum(new_session) OVER (PARTITION BY user_id
               ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_idx
           FROM flagged)
         SELECT event_id, user_id, ts, session_idx FROM numbered
         ORDER BY user_id, ts, event_id""",
    "st6_interval_join" ->
      """SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts,
           v.event_id AS v_id, v.ts AS v_ts
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         JOIN (SELECT * FROM events WHERE event_type = 'view') v
           ON p.user_id = v.user_id
          AND v.ts >= p.ts - INTERVAL '1 hour' AND v.ts <= p.ts
         ORDER BY p_id, v_id""",
    "st9_interval_join_outer" ->
      """SELECT p.event_id AS p_id, p.user_id, p.ts AS p_ts,
           v.event_id AS v_id, v.ts AS v_ts
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
           ON p.user_id = v.user_id
          AND v.ts >= p.ts - INTERVAL '1 hour' AND v.ts <= p.ts
         ORDER BY p_id, v_id NULLS FIRST""",
    "st7_stream_enrich" ->
      """SELECT event_id, e.event_type, user_id, value, weight,
           value * weight AS weighted_value
         FROM events e JOIN (VALUES
           ('view', CAST(0.25 AS DOUBLE)), ('click', CAST(0.5 AS DOUBLE)),
           ('signup', CAST(1.0 AS DOUBLE)), ('purchase', CAST(2.0 AS DOUBLE)),
           ('error', CAST(0.0 AS DOUBLE))) AS dim(event_type, weight)
           ON e.event_type = dim.event_type
         ORDER BY event_id""",
    "st5_gap_fill" ->
      """WITH hourly AS (
           SELECT date_trunc('hour', ts) AS hour, count(*) AS n_events
           FROM events GROUP BY 1),
         bounds AS (
           SELECT date_trunc('hour', min(ts)) AS lo,
                  date_trunc('hour', max(ts)) AS hi FROM events),
         spine AS (
           SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hour
           FROM bounds)
         SELECT spine.hour, coalesce(hourly.n_events, 0) AS n_events
         FROM spine LEFT JOIN hourly ON spine.hour = hourly.hour
         ORDER BY spine.hour""",
    "st10_trending" ->
      """WITH c AS (SELECT date_trunc('hour', ts) AS window_start,
             event_type, count(*) AS n_events
           FROM events GROUP BY 1, 2),
         r AS (SELECT window_start, event_type, n_events,
             CAST(row_number() OVER (PARTITION BY window_start
               ORDER BY n_events DESC, event_type ASC) AS INT) AS rank
           FROM c)
         SELECT window_start, event_type, n_events, rank FROM r
         WHERE rank <= 2 ORDER BY window_start, rank""",
    // same cell keys (isodow ≡ weekday()+1), expectation = cell count /
    // dates of that weekday; lift and alert as single double steps
    "st13_seasonal_alerts" ->
      """WITH wc AS (SELECT date_trunc('hour', ts) AS window_start,
             event_type, CAST(count(*) AS BIGINT) AS n_events
           FROM events GROUP BY 1, 2),
         cells AS (SELECT event_type, isodow(CAST(ts AS DATE)) AS dow,
             EXTRACT(hour FROM ts) AS hour,
             CAST(count(*) AS BIGINT) AS cell_n
           FROM events GROUP BY 1, 2, 3),
         dows AS (SELECT isodow(d) AS dow,
             CAST(count(*) AS BIGINT) AS n_occurrences
           FROM (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events)
           GROUP BY 1),
         e AS (SELECT c.event_type, c.dow, c.hour,
             CAST(c.cell_n AS DOUBLE) / CAST(o.n_occurrences AS DOUBLE)
               AS expected
           FROM cells c JOIN dows o USING (dow))
         SELECT wc.window_start, wc.event_type, wc.n_events, e.expected,
           CAST(wc.n_events AS DOUBLE) / e.expected AS observed_lift,
           COALESCE((CAST(wc.n_events AS DOUBLE) / e.expected) >= 2.0,
             TRUE) AS alert
         FROM wc LEFT JOIN e ON e.event_type = wc.event_type
           AND e.dow = isodow(CAST(wc.window_start AS DATE))
           AND e.hour = EXTRACT(hour FROM wc.window_start)
         ORDER BY wc.window_start, wc.event_type""",
    // strict-preceding exact-decimal running mean, identical flag rule
    "st11_anomaly_flags" ->
      """WITH x AS (
           SELECT user_id, event_id, value,
             count(*) OVER w AS n_prev,
             CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS prev_sum
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         SELECT user_id, event_id, value,
           prev_sum / CAST(n_prev AS DOUBLE) AS prev_mean,
           CAST(n_prev AS BIGINT) AS n_prev
         FROM x
         WHERE n_prev >= 3 AND value > 3.0 * (prev_sum / CAST(n_prev AS DOUBLE))
         ORDER BY user_id, event_id"""
  )
}
