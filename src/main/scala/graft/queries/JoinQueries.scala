package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Joins
import graft.sources.Tables

/** SURVEY.md §2c coverage (J1-J5) plus every join type the reference lacks
  * (outer/semi/anti/theta — SURVEY §2c "not implemented anywhere").
  *
  * Scale notes: dim sides (region/nation/customer/supplier) are broadcast
  * where the query is fact-to-dim, so the fact scan never shuffles; outer
  * joins that could produce nulls either aggregate them away or order with
  * explicit NULLS FIRST to stay hash-deterministic cross-engine.
  */
object JoinQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    // J1 — equi inner join (Microbase.scala:686-719; build-right hash there,
    // Catalyst/AQE-chosen here).
    "j1_join_inner" -> ((s, d) =>
      Joins.inner(Tables.orders(s, d), Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_custkey", "c_mktsegment")
        .orderBy("o_orderkey", "c_custkey", "c_mktsegment")),

    // J1 + explicit broadcast of the dim side: zero-shuffle map-side join.
    "j1_join_broadcast" -> ((s, d) =>
      Joins.broadcastInner(Tables.lineitem(s, d), Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(count(lit(1)).as("n_lines"))
        .orderBy("s_suppkey")),

    // J2 — cartesian product (M:688-695).
    "j2_join_cross" -> ((s, d) =>
      Joins.cross(Tables.region(s, d), Tables.nation(s, d))
        .select("r_regionkey", "n_nationkey")
        .orderBy("r_regionkey", "n_nationkey")),

    // J3 — NATURAL JOIN lowering (M:148-154): common-column resolution done
    // by Spark's analyzer (ResolveNaturalAndUsingJoin).
    "j3_join_natural" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT custkey, o_orderkey, c_mktsegment
               FROM (SELECT o_custkey AS custkey, o_orderkey FROM orders) o
               NATURAL JOIN
               (SELECT c_custkey AS custkey, c_mktsegment FROM customer) c
               ORDER BY custkey, o_orderkey, c_mktsegment""")
    }),

    // J4 — self join; the reference re-aliases by hand (M:124-146), Spark
    // DeduplicateRelations handles it. Pairs of orders by the same customer.
    "j4_join_self" -> ((s, d) => {
      val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      Joins.self(o, "a", "b",
          col("a.o_custkey") === col("b.o_custkey") &&
          col("a.o_orderkey") < col("b.o_orderkey"))
        .select(col("a.o_custkey").as("custkey"),
                col("a.o_orderkey").as("k1"), col("b.o_orderkey").as("k2"))
        .orderBy("custkey", "k1", "k2")
    }),

    // LEFT OUTER — aggregate form: customers with their order count (0 kept).
    "j6_join_left_outer" -> ((s, d) =>
      Joins.left(Tables.customer(s, d), Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"))
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy("c_custkey")),

    // RIGHT OUTER — suppliers kept even with zero lineitems.
    "j7_join_right_outer" -> ((s, d) =>
      Joins.right(Tables.lineitem(s, d), Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_suppkey")
        .agg(count(col("l_orderkey")).as("n_lines"))
        .orderBy("s_suppkey")),

    // FULL OUTER — row-level with explicit NULLS FIRST ordering on both
    // sides (Spark default asc = nulls first; DuckDB default = nulls last,
    // so the oracle says NULLS FIRST explicitly).
    "j8_join_full_outer" -> ((s, d) => {
      val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("fkey")).distinct()
      val p = Tables.orders(s, d).filter(col("o_orderstatus") === "P")
        .select(col("o_custkey").as("pkey")).distinct()
      Joins.full(f, p, col("fkey") === col("pkey"))
        .orderBy(col("fkey").asc_nulls_first, col("pkey").asc_nulls_first)
    }),

    // SEMI (EXISTS) — customers having at least one urgent order.
    "j9_join_semi" -> ((s, d) =>
      Joins.semi(Tables.customer(s, d),
          Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"))
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // ANTI (NOT EXISTS) — customers with no orders at all.
    "j10_join_anti" -> ((s, d) =>
      Joins.anti(Tables.customer(s, d), Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"))
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")),

    // AS-OF join — for each purchase event, the user's most recent prior
    // view event. Spark lacks a native as-of join; per the custom-operator
    // preference order this is COMPOSED from built-ins (range join +
    // row_number) rather than a custom SparkPlan — the composition
    // decorrelates into a shuffle on user_id plus a per-purchase window,
    // which scales (candidates bounded per user, no driver state).
    "j12_asof_join" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("p_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("v_id"),
          col("ts").as("v_ts"))
      val w = Window.partitionBy(col("p_id"))
        .orderBy(col("v_ts").desc, col("v_id").desc)
      purchases.join(views, Seq("user_id"))
        .filter(col("v_ts") <= col("p_ts"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("p_id", "user_id", "p_ts", "v_id", "v_ts")
        .orderBy("p_id")
    }),

    // RANGE join (point-in-interval) via bin bucketing — events counted
    // into each purchase's 30-minute follow-up window. The bins turn the
    // inequality join into an equi join on bin keys (Joins.rangeJoin);
    // a naive BETWEEN join would plan a nested-loop scan. Oracle-exact:
    // micros arithmetic is precision-lossless on both engines.
    "j14_range_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val windows = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"),
          unix_micros(col("ts")).as("w_start"),
          (unix_micros(col("ts")) + lit(1800L * 1000000L)).as("w_end"))
      val points = ev.select(col("event_id").as("e_id"),
        unix_micros(col("ts")).as("e_ts"))
      Joins.rangeJoin(points, windows,
          col("e_ts"), col("w_start"), col("w_end"),
          binSize = 1800L * 1000000L)
        .groupBy("p_id")
        .agg(count(lit(1)).as("n_events"))
        .orderBy("p_id")
    }),

    // AS-OF join, NATIVE operator (graft.plans.AsOfJoin → AsOfJoinExec):
    // the same question as j12 through the custom SparkPlan — one shuffle
    // per side on user_id, one forward merge pass per partition. LEFT
    // semantics (the operator's contract): purchases with no prior view
    // keep null view columns.
    "j13_asof_native" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("p_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("event_id").as("v_id"),
          col("ts").as("v_ts"))
      Joins.asOf(purchases, views,
          keys = Seq("user_id" -> "v_user"),
          leftTime = "p_ts", rightTime = "v_ts",
          rightTieBreak = Seq("v_id"))
        .select("p_id", "user_id", "p_ts", "v_id", "v_ts")
        .orderBy("p_id")
    }),

    // INTERVAL-OVERLAP join (interval×interval) via bin replication —
    // concurrent shipment windows of the same part. Windows are derived in
    // exact integer day math ([ship, ship + quantity days], epoch days), so
    // the overlap test is lossless on both engines. A naive overlap theta
    // join is O(n·m) nested-loop; Intervals.overlapJoin keys both sides on
    // covered 64-day bins and meets each qualifying pair EXACTLY once (met
    // bin pinned to the lowest shared bin), so the count below needs no
    // dedup pass.
    "j15_interval_overlap" -> ((s, d) => {
      def windows(prefix: String) = Tables.lineitem(s, d).select(
          col("l_partkey").as(s"${prefix}_pk"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as(s"${prefix}_id"),
          unix_date(to_date(col("l_shipdate"))).as(s"${prefix}_start"),
          (unix_date(to_date(col("l_shipdate"))) +
            col("l_quantity").cast("int")).as(s"${prefix}_end"))
      val a = windows("a")
      val b = windows("b")
      graft.ops.Intervals.overlapJoin(a, b,
          col("a_start"), col("a_end"), col("b_start"), col("b_end"),
          binSize = 64L,
          extraCond = col("a_pk") === col("b_pk") && col("a_id") < col("b_id"))
        .groupBy(col("a_pk").as("partkey"))
        .agg(count(lit(1)).as("n_overlaps"))
        .orderBy("partkey")
    }),

    // Point-in-time (temporal) join — the feature-store lookup: for each
    // (user, day) probe at the last microsecond of the day, the state
    // (latest event type at or before the probe). Runs on the NATIVE
    // as-of operator: one shuffle keyed on user, no inequality
    // nested-loop, deterministic (ts, id) tie-break.
    "j16_temporal_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val day = datediff(to_date(col("ts")), lit("1970-01-01"))
      val probes = ev.select(col("user_id"), day.as("day")).distinct()
        .withColumn("probe_ts",
          expr("timestamp_micros((day + 1) * 86400000000 - 1)"))
      val hist = ev.select(col("user_id").as("h_user"),
        col("ts").as("state_since"), col("event_id").as("h_id"),
        col("event_type").as("state"))
      Joins.asOf(probes, hist,
          keys = Seq("user_id" -> "h_user"),
          leftTime = "probe_ts", rightTime = "state_since",
          rightTieBreak = Seq("h_id"))
        .select("user_id", "day", "state", "state_since")
        .orderBy("user_id", "day")
    }),

    // FORWARD as-of join with tolerance (Joins.asOfForward — the native
    // backward operator over a negated time axis): for each purchase, the
    // NEXT view at ts >= purchase ts; matches further than 1 hour are
    // nulled out (row survives, pandas merge_asof(tolerance) semantics).
    // Ties on v_ts pick the greatest v_id — the operator's contract.
    "j17_asof_forward" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("p_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("event_id").as("v_id"),
          col("ts").as("v_ts"))
      Joins.asOfForward(purchases, views,
          keys = Seq("user_id" -> "v_user"),
          leftTime = "p_ts", rightTime = "v_ts",
          rightTieBreak = Seq("v_id"),
          toleranceMicros = Some(3600L * 1000000L))
        .select("p_id", "user_id", "p_ts", "v_id", "v_ts")
        .orderBy("p_id")
    }),

    // THETA — non-equi conjunct in the join condition (the reference could
    // only leave these as residual filters, SURVEY §2c): nation pairs in
    // the same region, ordered pair.
    "j11_join_theta" -> ((s, d) => {
      val n = Tables.nation(s, d)
      Joins.theta(n.alias("a"), n.alias("b"),
          col("a.n_regionkey") === col("b.n_regionkey") &&
          col("a.n_nationkey") < col("b.n_nationkey"))
        .select(col("a.n_regionkey").as("rkey"),
                col("a.n_name").as("n1"), col("b.n_name").as("n2"))
        .orderBy("rkey", "n1", "n2")
    })
  )

  val oracle: Map[String, String] = Map(
    "j1_join_inner" ->
      """SELECT o_orderkey, c_custkey, c_mktsegment
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey, c_custkey, c_mktsegment""",
    "j1_join_broadcast" ->
      """SELECT s_suppkey, s_name, count(*) AS n_lines
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_suppkey, s_name ORDER BY s_suppkey""",
    "j2_join_cross" ->
      """SELECT r_regionkey, n_nationkey FROM region CROSS JOIN nation
         ORDER BY r_regionkey, n_nationkey""",
    "j3_join_natural" ->
      """SELECT custkey, o_orderkey, c_mktsegment
         FROM (SELECT o_custkey AS custkey, o_orderkey FROM orders) o
         NATURAL JOIN
         (SELECT c_custkey AS custkey, c_mktsegment FROM customer) c
         ORDER BY custkey, o_orderkey, c_mktsegment""",
    "j4_join_self" ->
      """SELECT a.o_custkey AS custkey, a.o_orderkey AS k1, b.o_orderkey AS k2
         FROM orders a JOIN orders b
           ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
         ORDER BY custkey, k1, k2""",
    "j6_join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "j7_join_right_outer" ->
      """SELECT s_suppkey, count(l_orderkey) AS n_lines
         FROM lineitem RIGHT JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_suppkey ORDER BY s_suppkey""",
    "j8_join_full_outer" ->
      """SELECT fkey, pkey FROM
         (SELECT DISTINCT o_custkey AS fkey FROM orders WHERE o_orderstatus = 'F') f
         FULL JOIN
         (SELECT DISTINCT o_custkey AS pkey FROM orders WHERE o_orderstatus = 'P') p
         ON fkey = pkey
         ORDER BY fkey NULLS FIRST, pkey NULLS FIRST""",
    "j9_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "j10_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "j11_join_theta" ->
      """SELECT a.n_regionkey AS rkey, a.n_name AS n1, b.n_name AS n2
         FROM nation a JOIN nation b
           ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
         ORDER BY rkey, n1, n2""",
    "j12_asof_join" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
                    FROM events WHERE event_type = 'purchase'),
            v AS (SELECT user_id, event_id AS v_id, ts AS v_ts
                  FROM events WHERE event_type = 'view'),
            c AS (SELECT p.p_id, p.user_id, p.p_ts, v.v_id, v.v_ts,
                    row_number() OVER (PARTITION BY p.p_id
                      ORDER BY v.v_ts DESC, v.v_id DESC) AS rn
                  FROM p JOIN v ON p.user_id = v.user_id
                  WHERE v.v_ts <= p.p_ts)
         SELECT p_id, user_id, p_ts, v_id, v_ts FROM c WHERE rn = 1
         ORDER BY p_id""",
    "j13_asof_native" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
                    FROM events WHERE event_type = 'purchase'),
            v AS (SELECT user_id AS v_user, event_id AS v_id, ts AS v_ts
                  FROM events WHERE event_type = 'view'),
            c AS (SELECT p.p_id, p.user_id, p.p_ts, v.v_id, v.v_ts,
                    row_number() OVER (PARTITION BY p.p_id
                      ORDER BY v.v_ts DESC, v.v_id DESC) AS rn
                  FROM p LEFT JOIN v
                    ON p.user_id = v.v_user AND v.v_ts <= p.p_ts)
         SELECT p_id, user_id, p_ts, v_id, v_ts FROM c WHERE rn = 1
         ORDER BY p_id""",
    "j14_range_join" ->
      """SELECT p_id, count(*) AS n_events
         FROM (SELECT event_id AS p_id, ts AS p_ts
               FROM events WHERE event_type = 'purchase') p
           JOIN events e
             ON e.ts >= p.p_ts AND e.ts <= p.p_ts + INTERVAL 30 MINUTE
         GROUP BY p_id ORDER BY p_id""",
    // The oracle states the overlap join as the naive theta join the
    // binned operator replaces — identical pairs, exactly once each.
    "j15_interval_overlap" ->
      """WITH l AS (SELECT l_partkey AS pk,
              l_orderkey * 10 + l_linenumber AS id,
              CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS s,
              CAST(l_shipdate AS DATE) - DATE '1970-01-01'
                + CAST(l_quantity AS INT) AS e
            FROM lineitem)
         SELECT a.pk AS partkey, CAST(count(*) AS BIGINT) AS n_overlaps
         FROM l a JOIN l b
           ON a.pk = b.pk AND a.id < b.id AND a.s <= b.e AND b.s <= a.e
         GROUP BY a.pk ORDER BY partkey""",
    // naive statement of the point-in-time join: latest event at or
    // before each (user, end-of-day) probe, (ts, id) tie-break
    "j16_temporal_join" ->
      """WITH probes AS (SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
               AS INT) AS day
           FROM events),
         c AS (SELECT p.user_id, p.day, e.event_type AS state,
             e.ts AS state_since,
             row_number() OVER (PARTITION BY p.user_id, p.day
               ORDER BY e.ts DESC, e.event_id DESC) AS rn
           FROM probes p JOIN events e ON e.user_id = p.user_id
             AND e.ts <= make_timestamp(
               CAST(p.day + 1 AS BIGINT) * 86400000000 - 1))
         SELECT user_id, day, state, state_since FROM c WHERE rn = 1
         ORDER BY user_id, day""",
    // forward row_number over ts >= probe, tolerance nulled out at the
    // final SELECT (v columns only — the probe row survives)
    "j17_asof_forward" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts
                    FROM events WHERE event_type = 'purchase'),
            v AS (SELECT user_id AS v_user, event_id AS v_id, ts AS v_ts
                  FROM events WHERE event_type = 'view'),
            c AS (SELECT p.p_id, p.user_id, p.p_ts, v.v_id, v.v_ts,
                    row_number() OVER (PARTITION BY p.p_id
                      ORDER BY v.v_ts ASC, v.v_id DESC) AS rn
                  FROM p LEFT JOIN v
                    ON p.user_id = v.v_user AND v.v_ts >= p.p_ts)
         SELECT p_id, user_id, p_ts,
           CASE WHEN v_ts <= p_ts + INTERVAL 1 HOUR THEN v_id END AS v_id,
           CASE WHEN v_ts <= p_ts + INTERVAL 1 HOUR THEN v_ts END AS v_ts
         FROM c WHERE rn = 1
         ORDER BY p_id"""
  )
}
