package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Expectations-style data-quality auditing (beyond-reference; the
  * reference has no constraint surface at all — its loader trusts the CSV,
  * /root/reference Microbase.scala:960-983).
  *
  * A pipeline feeding a 100 TB training run needs machine-checkable data
  * contracts: null rates, key uniqueness, referential integrity, value
  * ranges, accepted categories. The design constraint at scale is PASSES,
  * not predicates: every scan-local check on one table folds into a SINGLE
  * aggregate over a single scan (count_if columns side by side), so adding
  * a 10th check costs zero extra I/O. Only referential integrity needs a
  * join — expressed as a key-level anti join (distinct child keys vs
  * parent keys, shuffle on the key, broadcast-able when the parent is a
  * dim), never a row-level pairwise pass.
  *
  * Output is one row per check: (check_name, table_name, violations,
  * total, pass) — the shape a CI gate or freshness monitor consumes.
  */
object DataQuality {

  /** One named scan-local check: `violated` must be a boolean column over
    * the audited table's rows. */
  final case class Check(name: String, violated: Column)

  /** All `checks` evaluated in ONE aggregate over one scan of `df`:
    * each check becomes a count_if(violated) beside a shared count(*),
    * then the wide single row unpivots to the per-check report via stack.
    * Adding a check never adds a scan — the audit stays one pass however
    * many contracts the table carries. */
  def audit(df: DataFrame, table: String, checks: Seq[Check]): DataFrame = {
    val aggs = count(lit(1)).cast("long").as("_total") +:
      checks.map(c => count_if(c.violated).cast("long").as(s"_v_${c.name}"))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = checks.flatMap { c =>
      Seq(lit(c.name), col(s"_v_${c.name}"))
    }
    wide.select(
      stack((lit(checks.size) +: stackArgs): _*).as(Seq("check_name", "violations")),
      col("_total").as("total"))
      .select(
        col("check_name"),
        lit(table).as("table_name"),
        col("violations"),
        col("total"),
        (col("violations") === 0L).as("pass"))
  }

  /** Referential-integrity check as its own report row: child keys with no
    * matching parent. Key-level: both sides reduce to DISTINCT keys before
    * the anti join, so the shuffle carries keys, not rows — and Spark
    * broadcasts the parent side when it is small enough. `total` is the
    * number of distinct child keys audited. */
  def referentialIntegrity(
      child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String,
      checkName: String, table: String): DataFrame = {
    val childKeys = child.select(col(childKey).as("k")).where(col("k").isNotNull).distinct()
    val parentKeys = parent.select(col(parentKey).as("k")).distinct()
    val orphans = childKeys.join(parentKeys, Seq("k"), "left_anti")
    childKeys.agg(count(lit(1)).cast("long").as("total"))
      .crossJoin(orphans.agg(count(lit(1)).cast("long").as("violations")))
      .select(
        lit(checkName).as("check_name"),
        lit(table).as("table_name"),
        col("violations"),
        col("total"),
        (col("violations") === 0L).as("pass"))
  }

  /** Uniqueness as a grouped check: violations = extra rows beyond the
    * first per key (count(*) - count(distinct key...)) — exact, and the
    * distinct count shuffles key bytes only. Null keys count as
    * violations (a null key can never satisfy a uniqueness contract). */
  def uniqueness(df: DataFrame, keys: Seq[String], checkName: String, table: String): DataFrame = {
    val k = keys.map(col)
    df.agg(
      count(lit(1)).cast("long").as("total"),
      (count(lit(1)) - count_distinct(k.head, k.tail: _*)).cast("long").as("violations"))
      .select(
        lit(checkName).as("check_name"),
        lit(table).as("table_name"),
        col("violations"),
        col("total"),
        (col("violations") === 0L).as("pass"))
  }

  /** Benford first-digit audit: distribution of the leading significant
    * digit of a positive money-like column vs Benford's law expectation
    * `log10(1 + 1/d)` — the classic fabricated-data / broken-ETL smell
    * test (organic multiplicative quantities follow it; synthetic
    * uniform ones, like TPC-H prices, visibly don't — which is itself
    * the informative answer here).
    *
    * Cross-engine exactness: the value is shifted to integer cents with
    * `floor(v·100 + 0.5)` (the ss5 half-up trick — no truncation-edge
    * divergence), the leading digit is the first character of the
    * INTEGER's decimal string (identical in any engine, unlike
    * float formatting or log10-based digit math), shares are exact long
    * ratios, and the Benford expectations are driver-side literal
    * constants compiled into both plans. One aggregation, scan-local
    * prep — 9-row output at any scale. */
  def benford(df: DataFrame, valCol: Column): DataFrame = {
    val cents = floor(valCol * 100.0 + 0.5).cast("long")
    val digit = substring(cents.cast("string"), 1, 1).cast("int")
    val counted = df.filter(valCol.isNotNull && (valCol > 0.0))
      .select(digit.as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = counted.agg(sum(col("n")).as("_total"))
    val expected = (1 to 9).map(d =>
      (d, math.log10(1.0 + 1.0 / d))).toMap
    val expectedCol = (1 to 9).foldLeft(lit(Double.NaN)) { (acc, d) =>
      when(col("digit") === d, lit(expected(d))).otherwise(acc)
    }
    counted.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        (col("n").cast("double") / col("_total").cast("double"))
          .as("share"),
        expectedCol.as("benford_expected"))
  }

  /** Robust outlier audit per group (Iglewicz–Hoaglin modified z-score):
    * flag rows where `|0.6745·(x − median)| > z·MAD`, with median and
    * MAD (median absolute deviation) both EXACT interpolated percentiles
    * — the telemetry-cleaning gate that, unlike mean/stddev z-scores,
    * doesn't let the outliers it hunts inflate its own threshold (50%
    * breakdown point vs 0). A zero MAD (over half the group identical)
    * flags only values strictly different from the median, matching the
    * estimator's degenerate limit instead of dividing by zero.
    *
    * Exactness: `percentile` is the exact interpolated aggregate (the
    * quantile_cont-proven pl12/pl20 pair); the deviation and the z test
    * are fixed double expressions. Scale shape: two grouped percentile
    * passes (keyed aggs), per-group stats broadcast back over the scan
    * (bounded by the group count); output one row per group. At 100 TB
    * swap in approx_percentile, same plan. */
  def robustOutliers(
      df: DataFrame, groupCol: Column, valCol: Column,
      z: Double = 3.5): DataFrame = {
    val meds = df.groupBy(groupCol.as("_g"))
      .agg(percentile(valCol, lit(0.5)).as("med"))
    val withMed = df.select(groupCol.as("_g"), valCol.as("_v"))
      .join(broadcast(meds), "_g")
      .withColumn("_dev", abs(col("_v") - col("med")))
    val mads = withMed.groupBy("_g")
      .agg(percentile(col("_dev"), lit(0.5)).as("mad"))
    withMed.join(broadcast(mads), "_g")
      .withColumn("_out",
        when(col("mad") > 0.0,
          lit(0.6745) * col("_dev") > lit(z) * col("mad"))
        .otherwise(col("_dev") > 0.0))
      .groupBy(col("_g"))
      .agg(count(lit(1)).as("n_rows"),
        first(col("med")).as("median"),
        first(col("mad")).as("mad"),
        sum(when(col("_out"), 1L).otherwise(0L)).as("n_outliers"))
      .select(col("_g").as("group_key"), col("n_rows"), col("median"),
        col("mad"), col("n_outliers"))
  }
}
