package graft

import org.apache.spark.sql.DataFrame

/** The ONE forcing action every timing harness uses.
  *
  * `df.count()` is NOT a benchmark-forcing action: Catalyst's column
  * pruning removes every output column (and every Aggregate expression)
  * a count does not need, so a scan-shaped query like ta2_quality_score
  * "ran" in 0.29 s at ×100 while actually computing its quality columns
  * takes 54.6 s — the count was reading parquet row counts from footers
  * — and even q1's sums were pruned down to a two-column group count
  * (round-16 finding, measured). Correctness was never affected (the
  * Verify/oracle gate WRITES full results), but every pre-round-16
  * timing artifact measured the pruned plans.
  *
  * `queryExecution.toRdd.count()` executes the query's OWN final plan
  * (AQE included, caches included): whole-stage codegen materializes
  * every output column into UnsafeRows, nothing above the plan can
  * prune into it, and no rows cross to the driver. This is the honest
  * "produce the full result set" cost — the same thing the reference's
  * volcano interpreter pays when it materializes a result.
  */
object Force {
  def run(df: DataFrame): Long = df.queryExecution.toRdd.count()
}
