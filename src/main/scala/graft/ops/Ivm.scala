package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental view maintenance (IVM) for grouped SUM/COUNT aggregates:
  * keep a materialized `GROUP BY g → (count, sum)` view current by folding
  * in a CDC change log, WITHOUT rescanning the base table. The classic
  * delta-propagation result (Gupta & Mumick's "Maintenance of materialized
  * views" survey shape): SUM and COUNT are self-maintainable given deletes
  * that carry their before-image, because both distribute over signed
  * multiplicities — `ΔV = Σ m·x` with m = +1 for inserts, −1 for deletes,
  * and an update is a (delete before-image, insert after-image) pair.
  *
  * At 100 TB this is THE reason to maintain rather than recompute: the
  * change batch is MBs while the base is the lake. Cost per refresh is one
  * keyed aggregation of the delta batch plus one join against the (small,
  * group-grain) materialized view — the base table is never touched.
  * Counts stay exact longs; sums stay exact DECIMAL through every merge
  * (float drift across refresh order would be a reproducibility bug), cast
  * to double only at the edge.
  *
  * CDC contract: a `D` row must carry the SAME group and value as the
  * stored row it removes (the standard before-image a CDC feed ships) —
  * IVM trusts the log; a drifted before-image silently corrupts the view,
  * which is why [[graft.ops.Snapshot.diff]] exists as the audit path.
  */
object Ivm {

  private val Dec = DecimalType(18, 2)

  /** Build the materialized shape from scratch: `(groupCols*, n_rows,
    * _total_dec)` — run ONCE at view creation (or re-run as an audit). */
  def sumCountAgg(
      rows: DataFrame, groupCols: Seq[String], valCol: Column): DataFrame =
    rows.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(valCol.cast(Dec)).as("_total_dec"))

  /** Fold one CDC batch into the materialized view. `opCol` ∈ {"I","D"};
    * groups whose maintained count reaches 0 are dropped (the view never
    * carries tombstones); groups first seen in the delta appear. Exact:
    * long counts + decimal sums end-to-end. Group keys must be NON-NULL:
    * the full-outer merge joins with SQL null semantics, so a null group
    * would split into unmergeable view/delta rows — normalize nulls to a
    * sentinel upstream if the grouping column admits them. */
  def maintainSumCount(
      baseAgg: DataFrame, changes: DataFrame, opCol: Column,
      groupCols: Seq[String], valCol: Column): DataFrame = {
    val signedCnt = when(opCol === lit("D"), lit(-1L)).otherwise(lit(1L))
    val signedVal = when(opCol === lit("D"), -valCol.cast(Dec))
      .otherwise(valCol.cast(Dec))
    val delta = changes.groupBy(groupCols.map(col): _*)
      .agg(sum(signedCnt).as("_dn"), sum(signedVal).as("_dtot"))
    val zero = lit(0).cast(Dec)
    baseAgg.join(delta, groupCols, "full_outer")
      .select(groupCols.map(col) ++ Seq(
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("_dn"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("_total_dec"), zero) + coalesce(col("_dtot"), zero))
          .as("_total_dec")): _*)
      .filter(col("n_rows") > 0)
  }

  /** Edge emission: the maintained view with the decimal sum cast to
    * double (bit-stable for unscaled values < 2^53 — OracleSafe note). */
  def finish(view: DataFrame, sumName: String): DataFrame =
    view.withColumn(sumName, col("_total_dec").cast("double"))
      .drop("_total_dec")
}
