package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deferred refuse-at-scale guard for the labeled brute-force oracle
  * baselines (dd5/dd6/dd7): bound the input's row count WITHOUT an eager
  * driver action.
  *
  * The round-16 guards ran `docs.count()` at DataFrame-CONSTRUCTION
  * time — plan-only uses (`explain`, composing a larger pipeline)
  * executed a Spark job, and every call re-counted an un-cached
  * upstream. Here the count is embedded in the returned plan itself: a
  * one-row count aggregate, bound check fused in via `raise_error`,
  * broadcast-cross-joined onto the input. Construction and `explain`
  * stay job-free, and the refusal fires at FIRST EXECUTION of any
  * derived plan. Execution cost: one count pass PER PLAN REFERENCE to
  * the guarded frame — an operator that self-joins its guarded input
  * (bruteForceNearDupPairs, ngramJaccardPairs) embeds the count subtree
  * on both sides, so each execution counts (and re-scans the uncached
  * upstream) twice. Acceptable by the same contract that admits these
  * operators at all — the input is bounded small — and cheaper than the
  * eager guard's construction-time job for plan-only uses; an operator
  * with an internal persist could instead guard after the pin to count
  * once.
  */
object ScaleGuard {

  /** `df` unchanged, plus the deferred row-count bound: any action on a
    * derived plan throws loudly (raise_error, surfaced wrapped in
    * SparkException) when count(df) > maxRows. `msg` should name the
    * operator and its scale-path alternative.
    *
    * The check lives in a FILTER predicate (trivially true inside the
    * bound), not a projected column: Catalyst prunes unreferenced
    * project expressions (the round-16 `.count()` lesson), but a filter
    * always executes — so the guard survives any downstream column
    * subset, including a bare count. */
  def maxRowsDeferred(df: DataFrame, maxRows: Long, msg: String): DataFrame = {
    require(!df.columns.contains("_sg_n"),
      "maxRowsDeferred reserves the column name _sg_n")
    val n = df.agg(count(lit(1)).as("_sg_n"))
    df.crossJoin(broadcast(n))
      .filter(when(col("_sg_n") <= lit(maxRows), lit(true))
        .otherwise(raise_error(concat(
          lit(s"$msg (got "), col("_sg_n").cast("string"),
          lit(s" rows > maxRows=$maxRows; raise maxRows explicitly for " +
            "a larger labeled oracle run)"))).cast("boolean")))
      .drop("_sg_n")
  }
}
