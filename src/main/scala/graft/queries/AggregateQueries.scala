package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Aggregates
import graft.sources.Tables
import OracleSafe._

/** SURVEY.md §2d coverage plus the superset the reference lacks: min/max,
  * HAVING, DISTINCT aggregates, ROLLUP/CUBE, approx_count_distinct, a
  * custom typed Aggregator (the reference's dead generic-aggregate engine
  * A3, Microbase.scala:303-342, done idiomatically).
  */
object AggregateQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    // A1 — ungrouped aggregate (M:343-369), superset with min/max.
    "a1_agg_global" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        exactAvg(col("l_discount")).as("avg_disc"))),

    // A2 — hash group-by aggregate (M:370-416); grouping *expression*
    // (year), which the reference's key builder can't do (M:446-450).
    "a2_group_agg" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("order_year"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
             moneySum(col("o_totalprice")).as("sum_price"),
             max(col("o_totalprice")).as("max_price"))
        .orderBy("order_year", "o_orderstatus")),

    // A4 — implicit global aggregate through the SQL text path: a Project
    // containing agg functions becomes Aggregate (the reference hand-rolls
    // this rewrite, M:913-935; Spark's analyzer GlobalAggregates does it).
    "a4_implicit_agg_sql" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                 AS DOUBLE) AS total FROM orders""")
    }),

    // HAVING — group filter (absent from the reference).
    "agg_having" -> ((s, d) =>
      Aggregates.having(
        Seq(col("c_nationkey")),
        Seq(count(lit(1)).as("n_cust"), moneySum(col("c_acctbal")).as("sum_bal")),
        col("n_cust") > 5)(Tables.customer(s, d))
        .orderBy("c_nationkey")),

    // DISTINCT aggregate (absent from the reference).
    "agg_count_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
             countDistinct(col("l_partkey")).as("n_part"),
             count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    // ROLLUP — hierarchical subtotals; grouping nulls coalesced to '(all)'
    // so null-ordering differences between engines can't bite.
    "agg_rollup" -> ((s, d) =>
      Aggregates.rollup(
        Seq(col("l_returnflag"), col("l_linestatus")),
        Seq(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty")))(
        Tables.lineitem(s, d))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
                coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
                col("n"), col("sum_qty"))
        .orderBy("rf", "ls")),

    // CUBE — all grouping combinations.
    "agg_cube" -> ((s, d) =>
      Aggregates.cube(
        Seq(col("o_orderstatus"), col("o_orderpriority")),
        Seq(count(lit(1)).as("n")))(Tables.orders(s, d))
        .select(coalesce(col("o_orderstatus"), lit("(all)")).as("st"),
                coalesce(col("o_orderpriority"), lit("(all)")).as("prio"),
                col("n"))
        .orderBy("st", "prio")),

    // A3 — custom typed Aggregator (weighted average), the idiomatic Spark
    // form of the reference's generic declarative-aggregate contract.
    // Weights/values are integer-valued, so the double accumulation is
    // exact and hash-stable across partition orders.
    "a3_custom_aggregator" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(Aggregates.weightedAvg(col("l_quantity").cast("double"),
               col("l_linenumber").cast("double")).as("wavg_qty"))
        .orderBy("l_returnflag")),

    // approx_count_distinct (HLL++) — the at-scale form of distinct
    // counting. The raw estimate is engine-specific, so the audited form
    // emits the EXACT count (DuckDB recomputes it) plus the ε-bounds
    // verdict |est − exact| ≤ 4·rsd·exact at the default rsd 0.05
    // (observed relerr: 0.036 at sf0.01, 0.018 at sf0.1) — the oracle
    // asserts the verdict TRUE, turning the former rows-only row into a
    // real hash-checked one.
    "agg_approx_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .agg(approx_count_distinct(col("l_orderkey")).as("_approx"),
             countDistinct(col("l_orderkey")).as("exact_orders"))
        .select(col("exact_orders"),
          Aggregates.cardinalityWithinBounds(
            col("_approx"), col("exact_orders"), rsd = 0.05)
            .as("within_bounds"))),

    // approx_percentile (Greenwald–Khanna sketch, mergeable) — the
    // distributed quantile path at scale; exact percentile_cont needs a
    // full sort. The GK guarantee is on RANK (±n/accuracy), never value
    // distance, and holds under ANY merge order — so the audited form
    // joins the returned values back against the group (3-row broadcast)
    // to count rows strictly-below / at-or-below each, and emits the
    // rank-interval-within-ε·n verdict plus the exact group size the
    // oracle recomputes (observed rank error ≤ 105 vs ε·n = 200 at
    // sf0.1).
    "agg_approx_percentile" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val acc = 1000
      val ap = li.groupBy("l_returnflag")
        .agg(percentile_approx(col("l_extendedprice"),
               array(lit(0.5), lit(0.95)), lit(acc)).as("_p"))
        .select(col("l_returnflag"),
          element_at(col("_p"), 1).as("_p50"),
          element_at(col("_p"), 2).as("_p95"))
      li.join(broadcast(ap), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("l_extendedprice") < col("_p50"), 1L).otherwise(0L))
            .as("_lt50"),
          sum(when(col("l_extendedprice") <= col("_p50"), 1L).otherwise(0L))
            .as("_le50"),
          sum(when(col("l_extendedprice") < col("_p95"), 1L).otherwise(0L))
            .as("_lt95"),
          sum(when(col("l_extendedprice") <= col("_p95"), 1L).otherwise(0L))
            .as("_le95"))
        .select(col("l_returnflag"), col("n_rows"),
          Aggregates.rankWithinEps(col("_lt50"), col("_le50"),
            col("n_rows"), q = 0.5, eps = 1.0 / acc).as("p50_rank_ok"),
          Aggregates.rankWithinEps(col("_lt95"), col("_le95"),
            col("n_rows"), q = 0.95, eps = 1.0 / acc).as("p95_rank_ok"))
        .orderBy("l_returnflag")
    }),

    // PIVOT — long-to-wide with an explicit value list (the scalable form:
    // implicit pivot would need a distinct-scan first).
    "agg_pivot" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("order_year"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .select(col("order_year"),
          coalesce(col("F"), lit(0L)).as("f_cnt"),
          coalesce(col("O"), lit(0L)).as("o_cnt"),
          coalesce(col("P"), lit(0L)).as("p_cnt"))
        .orderBy("order_year")),

    // GROUPING SETS through the SQL path.
    "agg_grouping_sets" -> ((s, d) => {
      Tables.registerAll(s, d)
      s.sql("""SELECT coalesce(l_returnflag, '(all)') AS rf,
                      coalesce(l_linestatus, '(all)') AS ls,
                      count(*) AS n
               FROM lineitem
               GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
               ORDER BY rf, ls""")
    }),

    // Statistical aggregates. Both engines use order-dependent streaming
    // moment updates, so values are rounded to 6 decimals — the one place
    // the oracle compare is tolerance-based by construction.
    "agg_stats" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6)
            .as("corr_qty_price"))
        .orderBy("l_returnflag")),

    // Exact interpolated percentiles over integer-valued quantities —
    // interpolation lands on .0/.5 steps, identical across engines.
    "agg_percentiles" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"))
        .orderBy("l_returnflag")),

    // Equi-width histogram: global min/max via a 1-row broadcast cross
    // join (no window, no second pass over sorted data), bucket = exact
    // integer-clamped IEEE division — the standard distribution profile
    // an engine's ANALYZE EXTENDED computes, companion to s8. The last
    // bucket is closed (x = max lands in bucket n-1, not n).
    // EXACT distinct users per event type via bucketed bitmaps (roaring
    // pattern): (type, id div 1024) cells hold 16-long bitsets, popcounts
    // sum — mergeable + order-independent + exact, vs HLL's estimate.
    "agg_bitmap_distinct" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          expr("user_id div 1024").as("bucket"),
          pmod(col("user_id"), lit(1024)).cast("long").as("slot"))
        .groupBy("event_type", "bucket")
        .agg(graft.ops.Aggregates.bitsetDistinct1024(col("slot"))
          .as("n_local"))
        .groupBy("event_type")
        .agg(sum(col("n_local")).as("n_distinct_users"))
        .orderBy("event_type")),

    // Exact skewness / excess kurtosis from DECIMAL raw moments — the
    // merge-order-independent form of the float-accumulating built-ins;
    // m2^1.5 written as m2·√m2 for cross-engine bit-parity.
    "agg_skew_kurtosis" -> ((s, d) =>
      graft.ops.Aggregates.skewKurtosis(
        Tables.lineitem(s, d), Seq("l_returnflag"), "l_quantity")
        .orderBy("l_returnflag")),

    // Exact weighted median: the price below which half the traded
    // QUANTITY sits — rational threshold (2·cum ≥ W, integer compare),
    // two-phase running weight, limit-1 answer.
    "agg_weighted_median" -> ((s, d) =>
      graft.ops.Aggregates.weightedPercentile(
        Tables.lineitem(s, d), col("l_extendedprice"),
        col("l_quantity").cast("long"), 1L, 2L,
        col("l_orderkey"), col("l_linenumber"))),

    // Equi-DEPTH histogram (16 quantile buckets over l_extendedprice) —
    // the range-partition boundary computation: two-phase global rank,
    // integer bucket arithmetic, 1-row count broadcast.
    "agg_equidepth" -> ((s, d) =>
      graft.ops.Aggregates.equiDepthHistogram(
        Tables.lineitem(s, d), col("l_extendedprice"), 16,
        col("l_orderkey"), col("l_linenumber"))
        .orderBy("bucket")),

    "agg_histogram" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val bounds = li.agg(
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      li.select("l_extendedprice").crossJoin(broadcast(bounds))
        .select(least(
            floor((col("l_extendedprice") - col("lo")) * 20.0 /
              (col("hi") - col("lo"))).cast("int"),
            lit(19)).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_rows"))
        .orderBy("bucket")
    }),

    // UNPIVOT / melt — the wide→long inverse of agg_pivot: per-flag
    // aggregates computed once, then stack'd into (l_returnflag, measure,
    // value) long form. Stack is a scan-local Generate — no shuffle
    // beyond the aggregation's own.
    "agg_unpivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          OracleSafe.moneySum(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).cast("double").as("n_rows"))
        .selectExpr("l_returnflag",
          """stack(3, 'sum_qty', sum_qty, 'sum_price', sum_price,
                      'n_rows', n_rows) AS (measure, value)""")
        .orderBy("l_returnflag", "measure")),

    // Exact-decimal Pearson correlation matrix: every moment is an exact
    // DECIMAL sum (merge-order-independent), the correlation one fixed
    // double expression over them — bit-identical cross-engine, unlike
    // the streaming-accumulator corr in agg_stats (tolerance-rounded).
    "agg_corr_matrix" -> ((s, d) =>
      graft.ops.Aggregates.corrMatrixExact(
        Tables.lineitem(s, d), Seq("l_quantity", "l_discount", "l_tax"))
        .orderBy("col_x", "col_y")),

    // Boolean aggregate family: every/any (bool_and/bool_or) + count_if —
    // the predicate-rollup surface (constraint checks collapse to these).
    "agg_bool" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          every(col("o_totalprice") > 0.0).as("all_positive"),
          expr("bool_or(o_totalprice > 300000.0)").as("any_large"),
          count_if(col("o_totalprice") > 300000.0).as("n_large"))
        .orderBy("o_orderstatus")),

    // Deterministic mode: most frequent ship-mode-ish value per flag,
    // smallest value breaking count ties (the built-in mode()'s tie
    // winner is merge-order-dependent — unusable under a hash oracle).
    "agg_mode" -> ((s, d) =>
      graft.ops.Aggregates.modeByKey(
        Tables.lineitem(s, d), Seq("l_returnflag"), "l_quantity")
        .orderBy("l_returnflag")),

    // Per-group OLS trend fit from the same exact-decimal moments as
    // agg_corr_matrix: slope/intercept of price on quantity per return
    // flag — bit-identical, reproducible regression without ML baggage.
    "agg_linreg" -> ((s, d) =>
      graft.ops.Aggregates.linregByKey(
        Tables.lineitem(s, d), Seq("l_returnflag"),
        "l_quantity", "l_extendedprice")
        .orderBy("l_returnflag")),

    // Mergeable HLL distinct sketches (Apache DataSketches via Spark):
    // per-event-type user cardinality + a sketch-UNION rollup — the
    // 100 TB shape where per-day/per-shard sketches merge instead of
    // re-scanning raw data. Audited form: each scope emits its EXACT
    // distinct count (DuckDB recomputes both scopes) plus the
    // |est − exact| ≤ 4·rsd·exact verdict at the default lgConfigK=12
    // (rsd = 1.04/√4096 ≈ 1.63%; observed relerr ≤ 0.8% at sf0.1). The
    // union row proves the MERGE path honors the same bound as the
    // per-shard sketches.
    "agg_hll_sketch" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val rsd = 1.04 / math.sqrt(1 << 12)
      val perType = ev.groupBy("event_type")
        .agg(hll_sketch_agg(col("user_id")).as("sk"),
             countDistinct(col("user_id")).as("exact_users"))
      val union = perType
        .agg(hll_union_agg(col("sk")).as("sk"))
        .crossJoin(broadcast(
          ev.agg(countDistinct(col("user_id")).as("exact_users"))))
        .select(lit("(all types)").as("scope"), col("exact_users"),
          Aggregates.cardinalityWithinBounds(
            hll_sketch_estimate(col("sk")), col("exact_users"), rsd)
            .as("within_bounds"))
      perType
        .select(col("event_type").as("scope"), col("exact_users"),
          Aggregates.cardinalityWithinBounds(
            hll_sketch_estimate(col("sk")), col("exact_users"), rsd)
            .as("within_bounds"))
        .unionByName(union)
        .orderBy("scope")
    }),

    // Count-Min sketch point-frequency audit: one global depth×width CMS
    // over the composite (event_type, user) key, then every distinct key
    // scored against its exact count. The sketch collects as ONE bounded
    // scalar (depth·width longs, the k-means-centroid precedent) and the
    // estimate udf runs over the GROUPED key domain, never the corpus
    // scan. Seeded-hash counters are engine-local, so the audited form
    // emits per-key verdicts instead of raw estimates: no_undercount
    // (est ≥ exact, a CMS structural invariant) and within_eps
    // (est − exact ≤ (e/width)·N, the published bound at the registered
    // width; observed max overcount 0.45·ε·N at sf0.1, zero violators).
    // N comes from the row-sum invariant — every sketch row sums to N —
    // not an extra count job.
    "agg_cms_freq" -> ((s, d) => {
      val depth = 4; val width = 256
      val keyed = Tables.events(s, d)
        .select(concat_ws("_", col("event_type"), col("user_id")).as("k"))
      val cms = udaf(new Aggregates.CountMin(depth, width))
      val sketch = keyed.agg(cms(col("k")).as("sk"))
        .collect()(0).getSeq[Long](0).toArray
      val n = sketch.slice(0, width).sum
      val est = udf((k: String) =>
        Aggregates.cmsEstimate(sketch, depth, width, k))
      keyed.groupBy("k").agg(count(lit(1)).as("exact_n"))
        .withColumn("_est", est(col("k")))
        .select(col("k"), col("exact_n"),
          (col("_est") >= col("exact_n")).as("no_undercount"),
          Aggregates.cmsWithinEps(col("_est"), col("exact_n"), width, n)
            .as("within_eps"))
        .orderBy("k")
    })
  )

  val oracle: Map[String, String] = Map(
    "a1_agg_global" ->
      """SELECT count(*) AS n_rows, sum(l_quantity) AS sum_qty,
           min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
           CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc
         FROM lineitem""",
    "a2_group_agg" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderstatus,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           max(o_totalprice) AS max_price
         FROM orders GROUP BY 1, 2 ORDER BY order_year, o_orderstatus""",
    "a4_implicit_agg_sql" ->
      """SELECT count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
           AS DOUBLE) AS total FROM orders""",
    "agg_having" ->
      """SELECT c_nationkey, count(*) AS n_cust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
         FROM customer GROUP BY c_nationkey HAVING count(*) > 5
         ORDER BY c_nationkey""",
    "agg_count_distinct" ->
      """SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
           coalesce(l_linestatus, '(all)') AS ls,
           count(*) AS n, sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY rf, ls""",
    "agg_cube" ->
      """SELECT coalesce(o_orderstatus, '(all)') AS st,
           coalesce(o_orderpriority, '(all)') AS prio, count(*) AS n
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY st, prio""",
    "a3_custom_aggregator" ->
      """SELECT l_returnflag,
           sum(l_quantity * l_linenumber) / sum(CAST(l_linenumber AS DOUBLE)) AS wavg_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_pivot" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           count(*) FILTER (o_orderstatus = 'F') AS f_cnt,
           count(*) FILTER (o_orderstatus = 'O') AS o_cnt,
           count(*) FILTER (o_orderstatus = 'P') AS p_cnt
         FROM orders GROUP BY 1 ORDER BY order_year""",
    "agg_grouping_sets" ->
      """SELECT coalesce(l_returnflag, '(all)') AS rf,
           coalesce(l_linestatus, '(all)') AS ls,
           count(*) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY rf, ls""",
    "agg_stats" ->
      """SELECT l_returnflag,
           round(stddev_samp(l_quantity), 6) AS sd_qty,
           round(var_samp(l_quantity), 6) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "agg_percentiles" ->
      """SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.5)  AS p50,
           quantile_cont(l_quantity, 0.75) AS p75
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // Identical IEEE expression shape as the Spark side: (x-lo)*20/(hi-lo)
    // left-to-right, floor, clamp — bit-identical bucket ids.
    "agg_bitmap_distinct" ->
      """SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users
         FROM events GROUP BY event_type ORDER BY event_type""",
    "agg_skew_kurtosis" ->
      """WITH s AS (SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(d) AS DOUBLE) AS sx,
             CAST(sum(d * d) AS DOUBLE) AS sx2,
             CAST(sum(d * d * d) AS DOUBLE) AS sx3,
             CAST(sum(d * d * d * d) AS DOUBLE) AS sx4
           FROM (SELECT l_returnflag,
                   CAST(l_quantity AS DECIMAL(4,0)) AS d FROM lineitem)
           GROUP BY l_returnflag),
         m AS (SELECT l_returnflag, n, sx / n AS mu, sx2, sx3, sx4
           FROM s),
         mm AS (SELECT l_returnflag, n,
             sx2 / n - mu * mu AS m2,
             sx3 / n - 3.0e0 * mu * (sx2 / n)
               + 2.0e0 * mu * mu * mu AS m3,
             sx4 / n - 4.0e0 * mu * (sx3 / n)
               + 6.0e0 * mu * mu * (sx2 / n)
               - 3.0e0 * mu * mu * mu * mu AS m4
           FROM m)
         SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           m3 / (m2 * sqrt(m2)) AS skewness,
           m4 / (m2 * m2) - 3.0e0 AS kurtosis_excess
         FROM mm ORDER BY l_returnflag""",
    "agg_weighted_median" ->
      """WITH r AS (SELECT l_extendedprice AS value,
             CAST(sum(CAST(l_quantity AS BIGINT)) OVER (
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_w,
             CAST(sum(CAST(l_quantity AS BIGINT)) OVER () AS BIGINT)
               AS total_w
           FROM lineitem)
         SELECT value, cum_w, total_w FROM r
         WHERE 2 * cum_w >= total_w
         ORDER BY cum_w LIMIT 1""",
    "agg_equidepth" ->
      """WITH r AS (SELECT l_extendedprice,
             row_number() OVER (ORDER BY l_extendedprice, l_orderkey,
               l_linenumber) AS rk,
             count(*) OVER () AS n_total
           FROM lineitem)
         SELECT CAST(((rk - 1) * 16) // n_total AS INT) AS bucket,
           min(l_extendedprice) AS lo, max(l_extendedprice) AS hi,
           CAST(count(*) AS BIGINT) AS n_rows
         FROM r GROUP BY bucket ORDER BY bucket""",
    "agg_histogram" ->
      """WITH b AS (SELECT min(l_extendedprice) AS lo,
                      max(l_extendedprice) AS hi FROM lineitem)
         SELECT least(CAST(floor((l_extendedprice - lo) * 20.0 / (hi - lo))
                  AS INT), 19) AS bucket,
           count(*) AS n_rows
         FROM lineitem CROSS JOIN b
         GROUP BY bucket ORDER BY bucket""",
    "agg_unpivot" ->
      """WITH w AS (
           SELECT l_returnflag,
             sum(l_quantity) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price,
             CAST(count(*) AS DOUBLE) AS n_rows
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, measure, value FROM (
           SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM w
           UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
           UNION ALL SELECT l_returnflag, 'n_rows', n_rows FROM w)
         ORDER BY l_returnflag, measure""",
    "agg_bool" ->
      """SELECT o_orderstatus,
           bool_and(o_totalprice > 0.0) AS all_positive,
           bool_or(o_totalprice > 300000.0) AS any_large,
           CAST(count(*) FILTER (WHERE o_totalprice > 300000.0) AS BIGINT)
             AS n_large
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "agg_mode" ->
      """WITH c AS (
           SELECT l_returnflag, l_quantity, CAST(count(*) AS BIGINT) AS n
           FROM lineitem GROUP BY 1, 2),
         r AS (
           SELECT l_returnflag, l_quantity AS mode_value, n AS mode_count,
             row_number() OVER (PARTITION BY l_returnflag
               ORDER BY n DESC, l_quantity ASC) AS rn
           FROM c)
         SELECT l_returnflag, mode_value, mode_count FROM r WHERE rn = 1
         ORDER BY l_returnflag""",
    "agg_linreg" ->
      """WITH m AS (
           SELECT l_returnflag,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,3))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,3))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,3)) * CAST(l_extendedprice AS DECIMAL(18,3))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,3)) * CAST(l_quantity AS DECIMAL(18,3))) AS DOUBLE) AS sxx
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
             AS intercept
         FROM m ORDER BY l_returnflag""",
    // Identical moment sums (DECIMAL(18,3) inputs, exact decimal Σ) and
    // the identical double expression — bit-exact across engines.
    "agg_corr_matrix" ->
      """WITH m AS (
           SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,3))) AS DOUBLE) AS s_q,
             CAST(sum(CAST(l_discount AS DECIMAL(18,3))) AS DOUBLE) AS s_d,
             CAST(sum(CAST(l_tax AS DECIMAL(18,3))) AS DOUBLE) AS s_t,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,3)) * CAST(l_quantity AS DECIMAL(18,3))) AS DOUBLE) AS ss_q,
             CAST(sum(CAST(l_discount AS DECIMAL(18,3)) * CAST(l_discount AS DECIMAL(18,3))) AS DOUBLE) AS ss_d,
             CAST(sum(CAST(l_tax AS DECIMAL(18,3)) * CAST(l_tax AS DECIMAL(18,3))) AS DOUBLE) AS ss_t,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,3)) * CAST(l_discount AS DECIMAL(18,3))) AS DOUBLE) AS sp_qd,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,3)) * CAST(l_tax AS DECIMAL(18,3))) AS DOUBLE) AS sp_qt,
             CAST(sum(CAST(l_discount AS DECIMAL(18,3)) * CAST(l_tax AS DECIMAL(18,3))) AS DOUBLE) AS sp_dt
           FROM lineitem)
         SELECT col_x, col_y, CAST(n AS BIGINT) AS n,
           (n * sp - s_x * s_y) / sqrt(n * ss_x - s_x * s_x)
             / sqrt(n * ss_y - s_y * s_y) AS corr
         FROM (
           SELECT 'l_quantity' AS col_x, 'l_discount' AS col_y, n,
             sp_qd AS sp, s_q AS s_x, s_d AS s_y, ss_q AS ss_x, ss_d AS ss_y FROM m
           UNION ALL SELECT 'l_quantity', 'l_tax', n,
             sp_qt, s_q, s_t, ss_q, ss_t FROM m
           UNION ALL SELECT 'l_discount', 'l_tax', n,
             sp_dt, s_d, s_t, ss_d, ss_t FROM m)
         ORDER BY col_x, col_y""",
    // Sketch audits: the estimates themselves are engine-specific, but
    // each query now emits the EXACT counterpart plus an ε-bounds verdict
    // — the oracle recomputes the exact side and asserts every verdict
    // TRUE (a sketch estimate outside its published bound hash-fails).
    "agg_approx_distinct" ->
      """SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS within_bounds
         FROM lineitem""",
    "agg_approx_percentile" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
           TRUE AS p50_rank_ok, TRUE AS p95_rank_ok
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag""",
    "agg_hll_sketch" ->
      """SELECT event_type AS scope,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_bounds
         FROM events GROUP BY 1
         UNION ALL
         SELECT '(all types)' AS scope,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_bounds
         FROM events
         ORDER BY scope""",
    "agg_cms_freq" ->
      """SELECT event_type || '_' || CAST(user_id AS VARCHAR) AS k,
           CAST(count(*) AS BIGINT) AS exact_n,
           TRUE AS no_undercount, TRUE AS within_eps
         FROM events GROUP BY 1 ORDER BY k"""
  )
}
