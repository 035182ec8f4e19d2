package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import OracleSafe._

/** Window functions — entirely absent from the reference (SURVEY.md §2e
  * "not implemented"); a required analytics surface for parity with any
  * real engine. All built-ins: rank family, frames, lag/lead, top-k per
  * group (the distributed replacement for the reference's sort+limit).
  *
  * Scale notes: window partitions shuffle once on partitionBy keys; frames
  * evaluate within partitions with no driver state. Every window ordering
  * is made total (unique tiebreaker) so ranks and running values are
  * deterministic cross-engine.
  */
object WindowQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    // rank / dense_rank / row_number per group.
    "w1_rank_family" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .withColumn("rk", rank().over(w))
        .withColumn("drk", dense_rank().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn", "rk", "drk")
        .orderBy("o_custkey", "rn")
    }),

    // Running sum — ROWS frame, total order inside the partition.
    "w2_running_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
                 col("l_linenumber").asc, col("l_quantity").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .withColumn("running_qty", sum(col("l_quantity")).over(w))
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity",
                "running_qty")
        // running_qty must be a sort key too: duplicate (suppkey, orderkey,
        // linenumber, quantity) rows carry different running values whose
        // relative output order would otherwise be nondeterministic.
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity",
                 "running_qty")
    }),

    // lag / lead over each customer's order history.
    "w3_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
        .select(col("o_custkey"), col("o_orderkey"),
                to_date(col("o_orderdate")).as("order_date"),
                col("o_totalprice"), col("prev_price"), col("next_price"))
        .orderBy("o_custkey", "order_date", "o_orderkey")
    }),

    // Distribution functions — percent_rank / cume_dist / ntile.
    "w4_distribution" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("nt", ntile(4).over(w))
        .select("o_orderstatus", "o_orderkey", "o_totalprice", "pr", "cd", "nt")
        .orderBy("o_orderstatus", "o_totalprice", "o_orderkey")
    }),

    // RANGE frame — sum of order values within 5000 of the current price
    // (value-based frame, not row-based). Decimal sum keeps it exact; the
    // compared column goes out as DOUBLE (see OracleSafe).
    "w5_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice").asc)
        .rangeBetween(-5000L, 0L)
      Tables.orders(s, d)
        .withColumn("nearby_sum",
          sum(dec(col("o_totalprice"))).over(w).cast("double"))
        .select("o_orderstatus", "o_orderkey", "o_totalprice", "nearby_sum")
        .orderBy("o_orderstatus", "o_totalprice", "o_orderkey")
    }),

    // first/last/nth value over the full-partition frame.
    "w7_first_last_nth" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .withColumn("first_order", first(col("o_orderkey")).over(w))
        .withColumn("last_order", last(col("o_orderkey")).over(w))
        .withColumn("second_order", nth_value(col("o_orderkey"), 2).over(w))
        .select("o_custkey", "o_orderkey", "first_order", "last_order",
          "second_order")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Gaps-and-islands interval coalescing (Intervals.mergeIntervals):
    // per-supplier shipment windows [ship, ship + quantity days] merged
    // into maximal busy spans via a running-max window — the classic
    // validity-interval consolidation every temporal warehouse needs.
    // Exact integer day math end to end; one shuffle on the key, windows
    // parallel across suppliers.
    "w8_interval_merge" -> ((s, d) => {
      val iv = Tables.lineitem(s, d).select(
        col("l_suppkey").as("suppkey"),
        unix_date(to_date(col("l_shipdate"))).cast("long").as("start_d"),
        (unix_date(to_date(col("l_shipdate"))) +
          col("l_quantity").cast("int")).cast("long").as("end_d"))
      graft.ops.Intervals.mergeIntervals(iv, "suppkey", "start_d", "end_d")
        .orderBy("suppkey", "span_start")
    }),

    // Top-k per group via window — the distributed form of the reference's
    // global sort+limit (O5), applied per partition key.
    "w6_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("c_mktsegment", "rn", "c_custkey", "c_acctbal")
        .orderBy("c_mktsegment", "rn")
    }),

    // Trailing moving median (robust smoothing — percentile as a framed
    // window aggregate, partitioned per part so it parallelizes).
    // Quantities are integer-valued, so the interpolated median lands on
    // .0/.5 exactly on both engines; the order includes the value so
    // fixture rows duplicated on (orderkey, linenumber) stay total.
    "w9_moving_median" -> ((s, d) => {
      val w = Window.partitionBy(col("l_partkey"))
        .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
          col("l_quantity").asc)
        .rowsBetween(-4, Window.currentRow)
      Tables.lineitem(s, d)
        .withColumn("med5", expr("percentile(l_quantity, 0.5)").over(w))
        .select("l_partkey", "l_orderkey", "l_linenumber", "l_quantity",
          "med5")
        .orderBy("l_partkey", "l_orderkey", "l_linenumber", "l_quantity")
    }),

    // Maximum drawdown per user: running peak of the value series minus
    // current value, maxed — the worst peak-to-trough metric (risk/
    // regression monitoring on any monotone-hoped series). Exact without
    // decimals: max/compare are arithmetic-free and the one subtraction
    // is a single IEEE op; both windows PARTITION BY user.
    "w10_drawdown" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("_peak", max(col("value")).over(w))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          max(col("_peak") - col("value")).as("max_drawdown"))
        .orderBy("user_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "w1_rank_family" ->
      """SELECT o_custkey, o_orderkey, rn, rk, drk FROM (
           SELECT o_custkey, o_orderkey,
             CAST(row_number() OVER w AS INT) AS rn,
             CAST(rank()       OVER w AS INT) AS rk,
             CAST(dense_rank() OVER w AS INT) AS drk
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey ASC))
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "w2_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
           sum(l_quantity) OVER (PARTITION BY l_suppkey
             ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC, l_quantity ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
         FROM lineitem
         ORDER BY l_suppkey, l_orderkey, l_linenumber, l_quantity, running_qty""",
    "w3_lag_lead" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
           o_totalprice,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
         ORDER BY o_custkey, order_date, o_orderkey""",
    "w4_distribution" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
           percent_rank() OVER w AS pr,
           cume_dist()    OVER w AS cd,
           CAST(ntile(4)  OVER w AS INT) AS nt
         FROM orders
         WINDOW w AS (PARTITION BY o_orderstatus
                      ORDER BY o_totalprice ASC, o_orderkey ASC)
         ORDER BY o_orderstatus, o_totalprice, o_orderkey""",
    "w5_range_frame" ->
      """SELECT o_orderstatus, o_orderkey, o_totalprice,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_orderstatus ORDER BY o_totalprice ASC
             RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS nearby_sum
         FROM orders
         ORDER BY o_orderstatus, o_totalprice, o_orderkey""",
    "w7_first_last_nth" ->
      """SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER w AS last_order,
           nth_value(o_orderkey, 2) OVER w AS second_order
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY o_custkey, o_orderkey""",
    "w6_topk_per_group" ->
      """SELECT c_mktsegment, rn, c_custkey, c_acctbal FROM (
           SELECT c_mktsegment, c_custkey, c_acctbal,
             CAST(row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey ASC) AS INT) AS rn
           FROM customer)
         WHERE rn <= 5 ORDER BY c_mktsegment, rn""",
    // Same running-max island detection as Intervals.mergeIntervals; ties
    // in (start_d, end_d) are interchangeable rows, so the grouped spans
    // are order-invariant on both engines.
    "w8_interval_merge" ->
      """WITH iv AS (SELECT l_suppkey AS suppkey,
              CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
                AS start_d,
              CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
                + CAST(l_quantity AS INT) AS BIGINT) AS end_d
            FROM lineitem),
         m AS (SELECT suppkey, start_d, end_d,
             max(end_d) OVER (PARTITION BY suppkey ORDER BY start_d, end_d
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
           FROM iv),
         i AS (SELECT suppkey, start_d, end_d,
             sum(CASE WHEN prev_max IS NULL OR start_d > prev_max
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY suppkey ORDER BY start_d, end_d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
           FROM m)
         SELECT suppkey, min(start_d) AS span_start, max(end_d) AS span_end,
           CAST(count(*) AS BIGINT) AS n_intervals
         FROM i GROUP BY suppkey, island
         ORDER BY suppkey, span_start""",
    "w9_moving_median" ->
      """SELECT l_partkey, l_orderkey, l_linenumber, l_quantity,
           quantile_cont(l_quantity, 0.5) OVER (PARTITION BY l_partkey
             ORDER BY l_orderkey, l_linenumber, l_quantity
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med5
         FROM lineitem
         ORDER BY l_partkey, l_orderkey, l_linenumber, l_quantity""",
    "w10_drawdown" ->
      """WITH p AS (SELECT user_id, value,
             max(value) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
           FROM events)
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           max(peak - value) AS max_drawdown
         FROM p GROUP BY user_id ORDER BY user_id"""
  )
}
