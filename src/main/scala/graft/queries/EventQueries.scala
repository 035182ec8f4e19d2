package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.EventAnalytics
import graft.sources.Tables

/** Batch behavioral analytics over the events table — funnels, cohort
  * retention, trailing-window anomaly flags (the §2g streaming slice's
  * batch duals; the reference engine has no analog). All three are
  * oracle-checked hash-exact: integer ratios, epoch-anchored week
  * arithmetic, and exact-decimal trailing means keep every compared cell
  * engine-independent.
  */
object EventQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    // Ordered funnel: earliest-event chain view -> click -> purchase.
    "ev1_funnel" -> ((s, d) =>
      EventAnalytics.funnel(
        Tables.events(s, d), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))),

    // Cohort retention matrix on epoch-anchored week indexes (no
    // calendar-week rules — engine-portable integer arithmetic).
    "ev2_retention" -> ((s, d) =>
      EventAnalytics.retentionCohorts(Tables.events(s, d), "user_id", "ts")
        .orderBy("cohort_week", "week_offset")),

    // Trailing-window spike flags: value > 3x the user's exact-decimal
    // mean of the previous 10 events (>= 3 prior events).
    "ev3_spikes" -> ((s, d) =>
      EventAnalytics.trailingSpikes(
        Tables.events(s, d), "event_id", "user_id", "ts", "value",
        lookback = 10, minPrev = 3, k = 3.0)
        .orderBy("user_id", "ts", "event_id")),

    // SCD Type-2 history: per-user event_type transition intervals with
    // consecutive-equal collapse and open current rows.
    "ev4_scd2_history" -> ((s, d) =>
      EventAnalytics.scd2History(
        Tables.events(s, d), "user_id", "ts", "event_id", "event_type")
        .orderBy("user_id", "valid_from", "event_type")),

    // First-order Markov transition matrix: per-user lag-1 successor
    // pairs, counted and normalized to P(to|from). Both longs are exact,
    // so the single double division is bit-identical cross-engine.
    "ev5_transition_matrix" -> ((s, d) =>
      EventAnalytics.transitionMatrix(
        Tables.events(s, d), "user_id", "ts", "event_id", "event_type")
        .orderBy("from_type", "to_type")),

    // Markov sequence-anomaly score: per-user mean −ln P(next|prev)
    // under the corpus transition matrix — the ORDER-based bot detector
    // that composes with the volume caps (ev16/ev26).
    "ev27_sequence_anomaly" -> ((s, d) =>
      EventAnalytics.sequenceAnomaly(
        Tables.events(s, d), "user_id", "ts", "event_id", "event_type")
        .orderBy("user_id")),

    // First-touch / last-touch conversion attribution: each purchase
    // credits the user's first and last preceding non-purchase event;
    // no preceding touch → "(direct)".
    "ev6_attribution" -> ((s, d) =>
      EventAnalytics.attribution(
        Tables.events(s, d), "user_id", "ts", "event_id", "event_type",
        conversionType = "purchase")
        .orderBy("model", "channel")),

    // CUSUM level-shift detection on per-type daily counts — the
    // changepoint complement to ev3's spike detector. Exact-long running
    // sum minus k·mean keeps the doubles bit-identical cross-engine.
    "ev7_cusum_changepoint" -> ((s, d) =>
      EventAnalytics.cusumDaily(Tables.events(s, d), "ts", "event_type")
        .orderBy("event_type", "day")),

    // Length-2 sequential-pattern support ("a then eventually b"): per-user
    // per-type spans (one keyed agg), k×k span self-join per user —
    // cost ∝ users·k², never events².
    "ev8_seq_patterns" -> ((s, d) =>
      EventAnalytics.sequencePatternSupport(
        Tables.events(s, d), "user_id", "ts", "event_type")
        .orderBy("first_type", "then_type")),

    // Funnel latency: first view → first purchase strictly after it,
    // one stats row (count / exact-ratio mean / exact median / min / max).
    "ev9_time_to_convert" -> ((s, d) =>
      EventAnalytics.timeToConvert(
        Tables.events(s, d), "user_id", "ts", "event_type",
        fromType = "view", toType = "purchase")),

    // User growth curve: first-seen users per day + cumulative distinct
    // users to date, running-summed over the day-grain frame via the
    // two-phase prefix machinery (no SinglePartition window).
    "ev10_user_growth" -> ((s, d) =>
      EventAnalytics.userGrowth(Tables.events(s, d), "user_id", "ts")
        .orderBy("day")),

    // Time-weighted average value per user (TWAP over irregular samples):
    // each observation weighted by its hold time until the next event.
    "ev11_time_weighted_avg" -> ((s, d) =>
      EventAnalytics.timeWeightedAvg(
        Tables.events(s, d), "user_id", "ts", "event_id", "value")
        .orderBy("user_id")),

    // RFM segmentation: recency/frequency/monetary per user, each scored
    // 1–4 against broadcast exact-quartile thresholds (no global window;
    // equal metrics always share a bucket, unlike ntile).
    "ev12_rfm_scores" -> ((s, d) =>
      EventAnalytics.rfmScores(Tables.events(s, d), "user_id", "ts", "value")
        .orderBy("user_id")),

    // Lorenz/Pareto concentration: activity-ranked users with cumulative
    // event share — rank and running sum both two-phase (no single-task
    // stage, PlanSpec-asserted).
    "ev13_lorenz_curve" -> ((s, d) =>
      EventAnalytics.lorenzCurve(Tables.events(s, d), "user_id")
        .orderBy("rank")),

    // EWMA (α=1/2, trailing 16): every weight an exact power of two +
    // ordered fold ⇒ hash-exact float smoothing; bounded trailing frame.
    "ev14_ewma" -> ((s, d) =>
      EventAnalytics.ewma(
        Tables.events(s, d), "event_id", "user_id", "ts", "value",
        lookback = 16)
        .orderBy("user_id", "ts", "event_id")),

    // Bot-likeness: CV of inter-event gaps per user (metronome timing ⇒
    // bot) — exact-µs gaps, decimal moments, one fixed double formula.
    "ev19_gap_regularity" -> ((s, d) =>
      EventAnalytics.gapRegularity(
        Tables.events(s, d), "user_id", "ts", "event_id",
        minGaps = 5L, botCv = 0.3)
        .orderBy("user_id")),

    // Kaplan–Meier survival for time-to-first-error per user (censored
    // at the user's last event) — the unbiased how-long-until estimator
    // when not every user has errored yet.
    "ev24_survival_curve" -> ((s, d) =>
      EventAnalytics.kaplanMeier(
        Tables.events(s, d), "user_id", "ts", "event_type", "error")
        .orderBy("duration_h")),

    // Longest consecutive-day streak per user: gaps-and-islands on
    // distinct active days, all windows user-partitioned.
    "ev17_streaks" -> ((s, d) =>
      EventAnalytics.longestStreaks(Tables.events(s, d), "user_id", "ts")
        .orderBy("user_id")),

    // Rolling 7-day active users: sliding DISTINCT via day-grain fan-out
    // (distinct (user,day) → N probe days → re-distinct → count) — every
    // shuffle keyed, no global-order window.
    "ev16_rolling_wau" -> ((s, d) =>
      EventAnalytics.rollingActiveUsers(
        Tables.events(s, d), "user_id", "ts", windowDays = 7)
        .orderBy("day")),

    // Daily-count autocorrelation at lags 1..7 (seasonality detector):
    // day-grain collapse, then an equi-join on day+k — exact-decimal
    // moments, one fixed double expression per lag.
    "ev15_acf" -> ((s, d) =>
      EventAnalytics.autocorrelation(Tables.events(s, d), "ts", maxLag = 7)
        .orderBy("lag")),

    // Day-of-week seasonality + chi-square uniformity per event type —
    // the humanlike-vs-cron traffic detector; the (7·Σn² − T²)/T
    // identity keeps everything integer until one closing division.
    "ev20_dow_chi2" -> ((s, d) =>
      EventAnalytics.dowSeasonality(Tables.events(s, d), "event_type", "ts")
        .orderBy("event_type"))
,
    // Funnel step conversions with Wilson 95% confidence intervals —
    // the "is the step-2 drop real or noise" reading of ev1: p̂ and its
    // score interval per step, n = the previous stage's cohort. The CI
    // is one fixed double expression (1.96 literal, sqrt correctly
    // rounded) replicated structurally in the oracle → hash-exact. The
    // 3-row stage chain joins to itself on stage-1 (no window — a
    // single-partition window over even 3 rows is a banned shape here).
    "ev25_funnel_ci" -> ((s, d) => {
      val f = EventAnalytics.funnel(
        Tables.events(s, d), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      val prev = f.select((col("stage") + 1).as("stage"),
        col("users").as("prev_users"))
      val n = col("prev_users").cast("double")
      val p = col("users").cast("double") / n
      val z2 = lit(1.96) * lit(1.96)
      val denom = lit(1.0) + z2 / n
      val center = (p + z2 / (n * lit(2.0))) / denom
      val half = (lit(1.96) *
        sqrt(p * (lit(1.0) - p) / n + z2 / (n * n * lit(4.0)))) / denom
      f.join(prev, Seq("stage"), "left")
        .select(col("stage"), col("step"), col("users"), col("prev_users"),
          when(col("prev_users").isNotNull, p).as("conv_rate"),
          when(col("prev_users").isNotNull, center - half).as("ci_low"),
          when(col("prev_users").isNotNull, center + half).as("ci_high"))
        .orderBy("stage")
    }),

    // Hour-of-week seasonal baseline per event type: count, lift over
    // the uniform 168-cell expectation, exact-decimal mean value, hot
    // flag — the baseline an alerting system compares live traffic
    // against (ev20 detects seasonality, ev21 hands over the profile).
    "ev21_seasonal_baseline" -> ((s, d) =>
      EventAnalytics.seasonalProfile(
        Tables.events(s, d), "event_type", "ts", "value")
        .orderBy("event_type", "dow", "hour")),

    // Transition concentration (Herfindahl over event-type transitions)
    // — the sequence-determinism bot signal; rational by design, the
    // ev19 timing companion.
    "ev23_transition_conc" -> ((s, d) =>
      EventAnalytics.transitionConcentration(
        Tables.events(s, d), "user_id", "ts", "event_id", "event_type",
        minTransitions = 5L)
        .orderBy("user_id")),

    // Windowed funnel: each stage must convert within 24 h of the
    // previous stage's earliest completion — the realistic funnel form
    // (ev1 is the unbounded variant; windowed counts are ≤ ev1's).
    "ev22_windowed_funnel" -> ((s, d) =>
      EventAnalytics.funnel(
        Tables.events(s, d), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"),
        maxGapUs = 24L * 3600 * 1000000)),

    // Batch sessionization at a 30-minute inactivity gap — the
    // gaps-and-islands twin of the streaming session window, over the
    // historical log; user-keyed windows only, exact-µs arithmetic.
    "ev18_sessions" -> ((s, d) =>
      EventAnalytics.sessionize(
        Tables.events(s, d), "user_id", "ts", "event_id",
        gapUs = 30L * 60 * 1000000)
        .orderBy("user_id", "session_idx")),

    // Per-user contribution cap: at most 3 events per (user, UTC day)
    // kept — the bounded-sensitivity primitive of DP-style prep and the
    // whale/bot normalizer; per-user audit record, exact integers.
    "ev26_contribution_cap" -> ((s, d) =>
      EventAnalytics.contributionCap(
        Tables.events(s, d), "user_id", "ts", "event_id", maxPerDay = 3)
        .orderBy("user_id"))
  )

  val oracle: Map[String, String] = Map(
    // ev24: identical per-user reduction + integer-hour div; the
    // survival product is a RECURSIVE CTE so multiplication is
    // guaranteed sequential ascending (IEEE products are
    // order-sensitive; a window product's association is unspecified).
    "ev24_survival_curve" ->
      """WITH RECURSIVE u AS (SELECT user_id,
             epoch_us(min(ts)) AS s0,
             epoch_us(min(CASE WHEN event_type = 'error' THEN ts END))
               AS tgt,
             epoch_us(max(ts)) AS lastt
           FROM events GROUP BY user_id),
         dur AS (SELECT
             (coalesce(tgt, lastt) - s0) // 3600000000 AS duration_h,
             tgt IS NOT NULL AS observed
           FROM u),
         g AS (SELECT duration_h,
             CAST(sum(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
               AS d,
             CAST(sum(CASE WHEN observed THEN 0 ELSE 1 END) AS BIGINT)
               AS c
           FROM dur GROUP BY duration_h),
         k AS (SELECT duration_h, d, c,
             CAST(sum(d + c) OVER (ORDER BY duration_h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS BIGINT) AS n,
             CAST(row_number() OVER (ORDER BY duration_h) AS BIGINT)
               AS rn
           FROM g),
         sv AS (
           SELECT rn, duration_h, n, d, c,
             1.0 - CAST(d AS DOUBLE) / CAST(n AS DOUBLE) AS s
           FROM k WHERE rn = 1
           UNION ALL
           SELECT k.rn, k.duration_h, k.n, k.d, k.c,
             sv.s * (1.0 - CAST(k.d AS DOUBLE) / CAST(k.n AS DOUBLE))
           FROM k JOIN sv ON k.rn = sv.rn + 1)
         SELECT duration_h, n AS n_at_risk, d AS d_events,
           c AS c_censored, s AS survival
         FROM sv ORDER BY duration_h""",
    // same lag pairing (ts, event_id tie-break), exact integer Σn²,
    // two single divisions.
    "ev23_transition_conc" ->
      """WITH p AS (SELECT user_id,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS from_type,
             event_type AS to_type
           FROM events),
         c AS (SELECT user_id, from_type, to_type,
             CAST(count(*) AS BIGINT) AS n
           FROM p WHERE from_type IS NOT NULL
           GROUP BY user_id, from_type, to_type),
         u AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS n_transitions,
             CAST(count(*) AS BIGINT) AS n_distinct_pairs,
             CAST(sum(n * n) AS BIGINT) AS sum_sq
           FROM c GROUP BY user_id
           HAVING sum(n) >= 5)
         SELECT user_id, n_transitions, n_distinct_pairs,
           CAST(sum_sq AS DOUBLE) /
             CAST(n_transitions * n_transitions AS DOUBLE) AS herfindahl,
           CAST(n_transitions * n_transitions AS DOUBLE) /
             CAST(sum_sq AS DOUBLE) AS effective_transitions
         FROM u ORDER BY user_id""",
    // ev1's chained-min CTEs with the added 24 h epoch_us bound per
    // stage (first-touch anchoring on the previous stage's earliest).
    "ev22_windowed_funnel" ->
      """WITH s1 AS (SELECT user_id AS u, min(ts) AS t FROM events
             WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT e.user_id AS u, min(e.ts) AS t FROM events e
             JOIN s1 ON e.user_id = s1.u
             WHERE e.event_type = 'click' AND e.ts > s1.t
               AND epoch_us(e.ts) - epoch_us(s1.t) <= 86400000000
             GROUP BY e.user_id),
         s3 AS (SELECT e.user_id AS u, min(e.ts) AS t FROM events e
             JOIN s2 ON e.user_id = s2.u
             WHERE e.event_type = 'purchase' AND e.ts > s2.t
               AND epoch_us(e.ts) - epoch_us(s2.t) <= 86400000000
             GROUP BY e.user_id),
         c AS (
           SELECT 1 AS stage, 'view' AS step,
             (SELECT count(*) FROM s1) AS users
           UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
           UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
         SELECT CAST(stage AS INT) AS stage, step,
           CAST(users AS BIGINT) AS users
         FROM c ORDER BY stage""",
    // identical gaps-and-islands: lag flag, running flag sum, keyed agg;
    // epoch_us both sides, (ts, event_id) tie-break.
    "ev18_sessions" ->
      """WITH o AS (SELECT user_id, ts, event_id, epoch_us(ts) AS t
            FROM events),
          f AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
                OR t - lag(t) OVER w > 1800000000 THEN 1 ELSE 0 END AS nw
            FROM o WINDOW w AS (PARTITION BY user_id
              ORDER BY ts, event_id)),
          s AS (SELECT *, sum(nw) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
            FROM f)
          SELECT user_id, CAST(sid AS BIGINT) AS session_idx,
            min(ts) AS session_start, max(ts) AS session_end,
            CAST(count(*) AS BIGINT) AS n_events,
            CAST(max(t) - min(t) AS BIGINT) AS duration_us
          FROM s GROUP BY user_id, sid ORDER BY user_id, session_idx""",
    // day = exact integer-µs floor division (never a DATE cast), keyed
    // rank with (ts, event_id) tie-break, exact BIGINT counts —
    // hash-exact
    "ev26_contribution_cap" ->
      """WITH o AS (SELECT user_id, ts, event_id,
            epoch_us(ts) // 86400000000 AS day FROM events),
          r AS (SELECT user_id, day,
            row_number() OVER (PARTITION BY user_id, day
              ORDER BY ts, event_id) AS rn
            FROM o)
          SELECT user_id,
            CAST(count(*) AS BIGINT) AS n_events,
            CAST(sum(CASE WHEN rn <= 3 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_kept,
            CAST(sum(CASE WHEN rn > 3 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_clipped,
            CAST(count(DISTINCT day) AS BIGINT) AS n_days
          FROM r GROUP BY user_id ORDER BY user_id""",
    // isodow ≡ Spark weekday()+1; the chi-square identity needs only the
    // nonzero cells, so absent weekdays need no zero-fill; peak ties
    // break to the earliest weekday on both engines.
    "ev20_dow_chi2" ->
      """WITH e AS (SELECT event_type, isodow(CAST(ts AS DATE)) AS dow
            FROM events),
         c AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS n
            FROM e GROUP BY event_type, dow),
         a AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total,
              CAST(sum(n * n) AS BIGINT) AS sum_sq, max(n) AS max_n
            FROM c GROUP BY event_type),
         p AS (SELECT c.event_type, CAST(min(c.dow) AS INT) AS peak_dow,
              max(c.n) AS peak_count
            FROM c JOIN a ON a.event_type = c.event_type AND c.n = a.max_n
            GROUP BY c.event_type)
         SELECT a.event_type, a.total, p.peak_dow, p.peak_count,
           CAST(7 * a.sum_sq - a.total * a.total AS DOUBLE) / a.total
             AS chi2_uniform
         FROM a JOIN p ON p.event_type = a.event_type
         ORDER BY a.event_type""",
    // the ev1 stage chain + a stage-1 self-join; the Wilson expression
    // mirrors the Spark tree op-for-op (e-notation literals so DuckDB
    // types them DOUBLE, sqrt correctly rounded on both)
    "ev25_funnel_ci" ->
      """WITH s1 AS (SELECT user_id AS u, min(ts) AS t FROM events
             WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT e.user_id AS u, min(e.ts) AS t FROM events e
             JOIN s1 ON e.user_id = s1.u
             WHERE e.event_type = 'click' AND e.ts > s1.t
             GROUP BY e.user_id),
         s3 AS (SELECT e.user_id AS u, min(e.ts) AS t FROM events e
             JOIN s2 ON e.user_id = s2.u
             WHERE e.event_type = 'purchase' AND e.ts > s2.t
             GROUP BY e.user_id),
         f AS (
           SELECT 1 AS stage, 'view' AS step,
             (SELECT count(*) FROM s1) AS users
           UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
           UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)),
         j AS (SELECT f.stage, f.step, f.users, p.users AS prev_users
           FROM f LEFT JOIN f p ON p.stage = f.stage - 1),
         w AS (SELECT stage, step, CAST(users AS BIGINT) AS users,
             CAST(prev_users AS BIGINT) AS prev_users,
             CAST(users AS DOUBLE) / CAST(prev_users AS DOUBLE) AS p,
             CAST(prev_users AS DOUBLE) AS n
           FROM j)
         SELECT CAST(stage AS INT) AS stage, step, users, prev_users,
           CASE WHEN prev_users IS NOT NULL THEN p END AS conv_rate,
           CASE WHEN prev_users IS NOT NULL THEN
             (p + (1.96e0 * 1.96e0) / (n * 2.0e0)) /
               (1.0e0 + (1.96e0 * 1.96e0) / n) -
             (1.96e0 * sqrt(p * (1.0e0 - p) / n +
               (1.96e0 * 1.96e0) / (n * n * 4.0e0))) /
               (1.0e0 + (1.96e0 * 1.96e0) / n) END AS ci_low,
           CASE WHEN prev_users IS NOT NULL THEN
             (p + (1.96e0 * 1.96e0) / (n * 2.0e0)) /
               (1.0e0 + (1.96e0 * 1.96e0) / n) +
             (1.96e0 * sqrt(p * (1.0e0 - p) / n +
               (1.96e0 * 1.96e0) / (n * n * 4.0e0))) /
               (1.0e0 + (1.96e0 * 1.96e0) / n) END AS ci_high
         FROM w ORDER BY stage""",
    // same cell keys (isodow ≡ weekday()+1, hour), same DECIMAL(18,6)
    // value sum, lift/mean as single divisions of exact inputs
    "ev21_seasonal_baseline" ->
      """WITH c AS (
           SELECT event_type, isodow(CAST(ts AS DATE)) AS dow,
             EXTRACT(hour FROM ts) AS hour,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(value AS DECIMAL(18,6))) AS v_sum
           FROM events GROUP BY 1, 2, 3),
         t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total
           FROM c GROUP BY event_type)
         SELECT c.event_type, CAST(c.dow AS INT) AS dow,
           CAST(c.hour AS INT) AS hour, c.n,
           CAST(c.n * 168 AS DOUBLE) / CAST(t.total AS DOUBLE) AS lift,
           CAST(c.v_sum AS DOUBLE) / CAST(c.n AS DOUBLE) AS mean_value,
           (CAST(c.n * 168 AS DOUBLE) / CAST(t.total AS DOUBLE)) >= 2.0
             AS hot
         FROM c JOIN t ON t.event_type = c.event_type
         ORDER BY c.event_type, dow, hour""",
    // stage-by-stage earliest-completion chain, identical to
    // EventAnalytics.funnel
    "ev1_funnel" ->
      """WITH s1 AS (SELECT user_id AS u, min(ts) AS t FROM events
             WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT e.user_id AS u, min(e.ts) AS t FROM events e
             JOIN s1 ON e.user_id = s1.u
             WHERE e.event_type = 'click' AND e.ts > s1.t
             GROUP BY e.user_id),
         s3 AS (SELECT e.user_id AS u, min(e.ts) AS t FROM events e
             JOIN s2 ON e.user_id = s2.u
             WHERE e.event_type = 'purchase' AND e.ts > s2.t
             GROUP BY e.user_id),
         c AS (
           SELECT 1 AS stage, 'view' AS step,
             (SELECT count(*) FROM s1) AS users
           UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
           UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
         SELECT CAST(stage AS INT) AS stage, step,
           CAST(users AS BIGINT) AS users
         FROM c ORDER BY stage""",
    "ev2_retention" ->
      """WITH base AS (SELECT user_id AS u,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
           FROM events WHERE user_id IS NOT NULL),
         m AS (SELECT min(d) AS d0 FROM base),
         weekly AS (SELECT DISTINCT u,
             CAST(floor((d - d0) / 7) AS INT) AS w
           FROM base CROSS JOIN m),
         cohort AS (SELECT u, min(w) AS cohort_week FROM weekly GROUP BY u)
         SELECT cohort_week, w - cohort_week AS week_offset,
           CAST(count(*) AS BIGINT) AS users
         FROM weekly JOIN cohort USING (u)
         GROUP BY cohort_week, week_offset
         ORDER BY cohort_week, week_offset""",
    // same frame, same DECIMAL(18,6) trailing sum -> bit-identical means
    "ev3_spikes" ->
      """SELECT event_id, user_id, ts, value,
           CAST(count(*) OVER w AS BIGINT) AS n_prev,
           CASE WHEN count(*) OVER w >= 3 THEN
             CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) /
               CAST(count(*) OVER w AS DOUBLE) END AS trailing_mean,
           coalesce(value > (CASE WHEN count(*) OVER w >= 3 THEN
             CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) /
               CAST(count(*) OVER w AS DOUBLE) END) * 3.0, false)
             AS is_spike
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
         ORDER BY user_id, ts, event_id""",
    // gaps-and-islands identical to EventAnalytics.scd2History; lead()
    // ordered by run_id so boundary-timestamp ties stay deterministic
    "ev4_scd2_history" ->
      """WITH flagged AS (SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w <> event_type
               THEN 1 ELSE 0 END AS chg
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         runs AS (SELECT user_id, ts, event_id, event_type,
             sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS run_id
           FROM flagged),
         grouped AS (SELECT user_id, run_id, event_type,
             min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
           FROM runs GROUP BY user_id, run_id, event_type)
         SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
             AS valid_to,
           n_events,
           (lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
             IS NULL) AS is_current
         FROM grouped
         ORDER BY user_id, valid_from, event_type""",
    // lag-1 successor per user (ts, event_id tie-break), k×k rollup,
    // per-from normalization — identical to EventAnalytics.transitionMatrix
    "ev5_transition_matrix" ->
      """WITH steps AS (
           SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS to_type
           FROM events),
         counts AS (
           SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
           FROM steps WHERE to_type IS NOT NULL
           GROUP BY from_type, to_type)
         SELECT from_type, to_type, n_transitions,
           CAST(n_transitions AS DOUBLE) /
             CAST(sum(n_transitions) OVER (PARTITION BY from_type) AS DOUBLE) AS p
         FROM counts
         ORDER BY from_type, to_type""",
    // identical pair construction and count ratios as ev5; −ln of the
    // exact ratio per row, DECIMAL(18,9)-quantized order-independent
    // mean (the ta28 OLS discipline), BIGINT count casts
    "ev27_sequence_anomaly" ->
      """WITH steps AS (
           SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS to_type
           FROM events),
         s2 AS (SELECT user_id, from_type, to_type FROM steps
           WHERE to_type IS NOT NULL),
         counts AS (
           SELECT from_type, to_type,
             CAST(count(*) AS BIGINT) AS n_pair
           FROM s2 GROUP BY from_type, to_type),
         probs AS (
           SELECT from_type, to_type, n_pair,
             CAST(sum(n_pair) OVER (PARTITION BY from_type) AS BIGINT)
               AS n_from
           FROM counts),
         scored AS (
           SELECT s2.user_id,
             -ln(CAST(p.n_pair AS DOUBLE) / CAST(p.n_from AS DOUBLE))
               AS nll
           FROM s2 JOIN probs p USING (from_type, to_type))
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_transitions,
           CAST(sum(CAST(nll AS DECIMAL(18,9))) AS DOUBLE) / count(*)
             AS mean_nll
         FROM scored GROUP BY user_id ORDER BY user_id""",
    // strict-preceding IGNORE NULLS first/last per user, (ts,id)-ordered
    "ev6_attribution" ->
      """WITH touched AS (
           SELECT event_type,
             first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS) OVER w AS first_touch,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS) OVER w AS last_touch
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         conv AS (SELECT * FROM touched WHERE event_type = 'purchase')
         SELECT model, channel, conversions FROM (
           SELECT 'first_touch' AS model,
             coalesce(first_touch, '(direct)') AS channel,
             CAST(count(*) AS BIGINT) AS conversions
           FROM conv GROUP BY 2
           UNION ALL
           SELECT 'last_touch', coalesce(last_touch, '(direct)'),
             CAST(count(*) AS BIGINT)
           FROM conv GROUP BY 2)
         ORDER BY model, channel""",
    // daily counts → exact-long running sum − k·mean (same double ops)
    "ev7_cusum_changepoint" ->
      """WITH daily AS (
           SELECT event_type,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS INT)
               AS day,
             CAST(count(*) AS BIGINT) AS n_events
           FROM events GROUP BY 1, 2)
         SELECT event_type, day, n_events,
           CAST(sum(n_events) OVER (PARTITION BY event_type) AS DOUBLE) /
             CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE)
             AS mean_daily,
           CAST(sum(n_events) OVER (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS DOUBLE) -
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS DOUBLE) *
             (CAST(sum(n_events) OVER (PARTITION BY event_type) AS DOUBLE) /
              CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE))
             AS cusum
         FROM daily
         ORDER BY event_type, day""",
    // per-user per-type spans; ∃ a-before-b ⟺ min_ts(a) < max_ts(b)
    "ev8_seq_patterns" ->
      """WITH spans AS (
           SELECT user_id AS u, event_type AS t,
             min(ts) AS t_min, max(ts) AS t_max
           FROM events GROUP BY 1, 2),
         n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
           FROM events)
         SELECT a.t AS first_type, b.t AS then_type,
           CAST(count(*) AS BIGINT) AS n_users_support,
           CAST(count(*) AS DOUBLE) / CAST(n.n_users AS DOUBLE) AS support
         FROM spans a JOIN spans b ON a.u = b.u AND a.t_min < b.t_max
         CROSS JOIN n
         GROUP BY a.t, b.t, n.n_users
         ORDER BY first_type, then_type""",
    "ev9_time_to_convert" ->
      """WITH ff AS (
           SELECT user_id AS u, min(ts) AS t_from
           FROM events WHERE event_type = 'view' GROUP BY 1),
         ft AS (
           SELECT e.user_id AS u, ff.t_from, min(e.ts) AS t_to
           FROM events e JOIN ff ON e.user_id = ff.u
           WHERE e.event_type = 'purchase' AND e.ts > ff.t_from
           GROUP BY 1, 2),
         lat AS (
           SELECT epoch_us(t_to) - epoch_us(t_from) AS latency_us
           FROM ft)
         SELECT CAST(count(*) AS BIGINT) AS n_converted,
           CAST(sum(latency_us) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS mean_us,
           quantile_cont(latency_us, 0.5) AS p50_us,
           min(latency_us) AS min_us,
           max(latency_us) AS max_us
         FROM lat""",
    "ev10_user_growth" ->
      """WITH fs AS (
           SELECT user_id,
             min(CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS INT)) AS day
           FROM events GROUP BY user_id),
         nu AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users
           FROM fs GROUP BY day),
         ad AS (SELECT DISTINCT
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS INT)
               AS day
           FROM events),
         daily AS (
           SELECT ad.day, coalesce(nu.new_users, 0) AS new_users
           FROM ad LEFT JOIN nu USING (day))
         SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
             AS BIGINT) AS users_to_date
         FROM daily ORDER BY day""",
    // hold-until-next spans in whole seconds (identical integer floor),
    // DECIMAL(18,6)-exact weighted sum, one double division
    "ev11_time_weighted_avg" ->
      """WITH spans AS (
           SELECT user_id, value,
             (lead(epoch_us(ts)) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) - epoch_us(ts)) // 1000000 AS dt
           FROM events),
         s2 AS (SELECT * FROM spans WHERE dt IS NOT NULL)
         SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(dt) AS BIGINT) AS total_s,
           CAST(sum(CAST(value AS DECIMAL(18,6)) * dt) AS DOUBLE) /
             CAST(sum(dt) AS DOUBLE) AS twap
         FROM s2 GROUP BY user_id
         HAVING sum(dt) > 0
         ORDER BY user_id""",
    // same user-grain metrics, same exact-quartile thresholds, same
    // 1 + Σ(comparisons) scoring
    "ev12_rfm_scores" ->
      """WITH per AS (
           SELECT user_id,
             max(CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS INT)) AS last_day,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS monetary
           FROM events GROUP BY user_id),
         mx AS (SELECT max(last_day) AS max_day FROM per),
         perr AS (
           SELECT user_id, max_day - last_day AS recency_days,
             frequency, monetary
           FROM per CROSS JOIN mx),
         cuts AS (
           SELECT quantile_cont(recency_days, [0.25, 0.5, 0.75]) AS r_cuts,
             quantile_cont(frequency, [0.25, 0.5, 0.75]) AS f_cuts,
             quantile_cont(monetary, [0.25, 0.5, 0.75]) AS m_cuts
           FROM perr)
         SELECT user_id, recency_days, frequency, monetary,
           1 + CAST(recency_days <= r_cuts[3] AS INT)
             + CAST(recency_days <= r_cuts[2] AS INT)
             + CAST(recency_days <= r_cuts[1] AS INT) AS r_score,
           1 + CAST(frequency >= f_cuts[1] AS INT)
             + CAST(frequency >= f_cuts[2] AS INT)
             + CAST(frequency >= f_cuts[3] AS INT) AS f_score,
           1 + CAST(monetary >= m_cuts[1] AS INT)
             + CAST(monetary >= m_cuts[2] AS INT)
             + CAST(monetary >= m_cuts[3] AS INT) AS m_score
         FROM perr CROSS JOIN cuts
         ORDER BY user_id""",
    "ev13_lorenz_curve" ->
      """WITH per AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
           FROM events GROUP BY user_id),
         t AS (SELECT CAST(sum(n_events) AS BIGINT) AS total_events FROM per)
         SELECT user_id,
           CAST(row_number() OVER w AS BIGINT) AS rank,
           n_events,
           CAST(sum(n_events) OVER (ORDER BY n_events DESC, user_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_events,
           CAST(sum(n_events) OVER (ORDER BY n_events DESC, user_id
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) /
             CAST(t.total_events AS DOUBLE) AS cum_share
         FROM per CROSS JOIN t
         WINDOW w AS (ORDER BY n_events DESC, user_id)
         ORDER BY rank""",
    // Mirrors EventAnalytics.ewma exactly: frame list is (ts, event_id)-
    // ordered, terms x·2^−j are lossless scalings, list_sum folds
    // oldest-first exactly like Spark's aggregate(), denominator is the
    // closed form 2 − 2^(1−n) — one final IEEE division.
    "ev14_ewma" ->
      """WITH w AS (
           SELECT event_id, user_id, ts, value,
             list(CAST(value AS DOUBLE)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) AS xs
           FROM events)
         SELECT event_id, user_id, ts, value,
           CAST(len(xs) AS INT) AS n_window,
           list_sum([xs[i] * pow(0.5, len(xs) - i)
                     for i in range(1, len(xs) + 1)]) /
             (2.0 - pow(2.0, 1.0 - len(xs))) AS ewma
         FROM w
         ORDER BY user_id, ts, event_id""",
    // epoch_us gaps ≡ unix_micros lead diffs; moments and the CV formula
    // written identically to the Spark expression tree
    "ev19_gap_regularity" ->
      """WITH o AS (SELECT user_id, epoch_us(ts) AS t, event_id
           FROM events),
         g AS (SELECT user_id,
             lead(t) OVER (PARTITION BY user_id
               ORDER BY t, event_id) - t AS gap
           FROM o),
         s AS (SELECT user_id, CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(gap AS DECIMAL(18,0))) AS DOUBLE) AS sx,
             -- DECIMAL(19) forces int128 backing: 18-wide decimals are
             -- int64-backed in DuckDB and the square overflows BEFORE
             -- widening; values are identical either way
             CAST(sum(CAST(gap AS DECIMAL(19,0))
                      * CAST(gap AS DECIMAL(19,0))) AS DOUBLE) AS sx2
           FROM g WHERE gap IS NOT NULL GROUP BY user_id
           HAVING count(*) >= 5)
         SELECT user_id, CAST(n AS BIGINT) AS n_gaps,
           sx / n AS mean_gap_us,
           sqrt(sx2 / n - (sx / n) * (sx / n)) / (sx / n) AS cv_gap,
           sqrt(sx2 / n - (sx / n) * (sx / n)) / (sx / n) < 0.3 AS is_bot
         FROM s ORDER BY user_id""",
    "ev17_streaks" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS INT) AS day
           FROM events),
         isl AS (SELECT u, day,
             day - CAST(row_number() OVER (PARTITION BY u ORDER BY day)
               AS INT) AS island
           FROM ud),
         st AS (SELECT u, island, CAST(count(*) AS BIGINT) AS len,
             min(day) AS start
           FROM isl GROUP BY u, island),
         ranked AS (SELECT u, len, start,
             row_number() OVER (PARTITION BY u
               ORDER BY len DESC, start ASC) AS rn,
             CAST(sum(len) OVER (PARTITION BY u) AS BIGINT) AS n_active_days
           FROM st)
         SELECT u AS user_id, n_active_days, len AS longest_streak,
           start AS streak_start_day
         FROM ranked WHERE rn = 1 ORDER BY user_id""",
    "ev16_rolling_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id AS u,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS INT) AS day
           FROM events),
         pr AS (SELECT DISTINCT u, day + CAST(r.k AS INT) AS probe_day
           FROM ud CROSS JOIN range(0, 7) r(k)),
         pd AS (SELECT DISTINCT day AS probe_day FROM ud)
         SELECT probe_day AS day, CAST(count(*) AS BIGINT) AS wau
         FROM pr JOIN pd USING (probe_day)
         GROUP BY probe_day ORDER BY day""",
    // same epoch-day idiom as ev10; moments as exact DECIMAL sums, r_k
    // one fixed double expression — mirrors EventAnalytics.autocorrelation
    "ev15_acf" ->
      """WITH daily AS (
           SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS INT) AS day,
             CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY day),
         p AS (
           SELECT CAST(r.k AS INT) AS lag, a.x AS xa, b.x AS xb
           FROM range(1, 8) r(k)
           CROSS JOIN daily a
           JOIN daily b ON b.day = a.day + CAST(r.k AS INT)),
         s AS (
           SELECT lag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(xa AS DECIMAL(18,0))) AS DOUBLE) AS sx,
             CAST(sum(CAST(xb AS DECIMAL(18,0))) AS DOUBLE) AS sy,
             CAST(sum(CAST(xa AS DECIMAL(18,0)) * CAST(xb AS DECIMAL(18,0)))
               AS DOUBLE) AS sxy,
             CAST(sum(CAST(xa AS DECIMAL(18,0)) * CAST(xa AS DECIMAL(18,0)))
               AS DOUBLE) AS sxx,
             CAST(sum(CAST(xb AS DECIMAL(18,0)) * CAST(xb AS DECIMAL(18,0)))
               AS DOUBLE) AS syy
           FROM p GROUP BY lag)
         SELECT lag, CAST(n AS BIGINT) AS n_pairs,
           (n * sxy - sx * sy) /
             sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS acf
         FROM s ORDER BY lag"""
  )
}
