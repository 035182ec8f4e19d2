package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval analytics: overlap joins and per-key interval coalescing.
  *
  * The reference has no temporal operators at all (SURVEY §2c — its only
  * join is the equi hash join, Microbase.scala:686-719); these extend the
  * [[Joins.rangeJoin]] family from point-in-interval to interval×interval,
  * the shape of shift-overlap / concurrency / validity-window analytics.
  *
  * Scale shapes:
  *  - [[overlapJoin]] never enumerates the pair space: both sides key on
  *    the fixed-width bins their interval covers, the join is EQUI on
  *    (bin + caller keys), and a "meet exactly once" predicate replaces
  *    the usual dedup pass.
  *  - [[mergeIntervals]] is one shuffle on the key plus a per-key ordered
  *    window — parallel across keys, no SinglePartition anywhere.
  */
object Intervals {

  /** Interval×interval overlap join via bin replication.
    *
    * Each side explodes its interval into the `binSize`-wide bins it
    * covers (≈ len/binSize + 1 rows); the join is then a plain equi join
    * on the bin key (plus any `extraCond` equi keys the caller folds in),
    * with the exact inclusive overlap test `lStart <= rEnd && rStart <=
    * lEnd` as a residual. A naive theta join on that predicate plans a
    * nested-loop/cartesian scan — O(n·m), the same silent killer
    * [[Joins.rangeJoin]] exists for.
    *
    * Exactly-once: an overlapping pair shares every bin in
    * [max(bin(lStart), bin(rStart)), min(bin(lEnd), bin(rEnd))] (the
    * overlap region's bins, non-empty iff the intervals overlap), so the
    * residual also pins the met bin to `greatest(bin(lStart),
    * bin(rStart))` — the unique lowest shared bin. No distinct pass, no
    * double counting, which matters because the natural consumer is an
    * aggregate.
    *
    * Columns must be numeric (cast dates to epoch days / timestamps to
    * micros); left/right column names must not collide. */
  def overlapJoin(
      left: DataFrame, right: DataFrame,
      lStart: Column, lEnd: Column, rStart: Column, rEnd: Column,
      binSize: Long, extraCond: Column = lit(true)): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    def bin(c: Column) = floor(c / binSize).cast("long")
    val l = left.withColumn("_ov_bin",
      explode(sequence(bin(lStart), bin(lEnd))))
    val r = right.withColumn("_ov_bin",
      explode(sequence(bin(rStart), bin(rEnd))))
    l.join(r,
        l("_ov_bin") === r("_ov_bin") && extraCond &&
        lStart <= rEnd && rStart <= lEnd &&
        l("_ov_bin") === greatest(bin(lStart), bin(rStart)))
      .drop("_ov_bin")
  }

  /** Coalesce overlapping-or-touching intervals per key (gaps-and-islands):
    * rows `(key, start, end)` → one row per maximal merged span
    * `(key, span_start, span_end, n_intervals)`.
    *
    * Island detection by running maximum: ordered by start within the key,
    * an interval opens a new island iff its start exceeds the max end seen
    * so far (`max(end) OVER (... ROWS UNBOUNDED PRECEDING AND 1
    * PRECEDING)`); island ids are the running count of openers. Spans are
    * then a plain group-by on (key, island). Tie order among equal starts
    * cannot change the spans: equal-start intervals always co-overlap, so
    * neither order opens an island between them.
    *
    * `touching` intervals (end == next start) merge; strictly disjoint
    * ones do not. Inputs with end < start are rejected upstream by the
    * caller's derivation, not silently fixed here. */
  def mergeIntervals(
      df: DataFrame, keyCol: String, startCol: String, endCol: String)
      : DataFrame = {
    val byStart = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol)).over(
      byStart.rowsBetween(Window.unboundedPreceding, -1))
    val opens = when(prevMax.isNull || col(startCol) > prevMax, 1L)
      .otherwise(0L)
    df.withColumn("_iv_open", opens)
      .withColumn("_iv_island",
        sum(col("_iv_open")).over(
          byStart.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("_iv_island"))
      .agg(
        min(col(startCol)).as("span_start"),
        max(col(endCol)).as("span_end"),
        count(lit(1)).as("n_intervals"))
      .drop("_iv_island")
  }
}
