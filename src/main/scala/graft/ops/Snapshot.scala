package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot comparison and batch-merge primitives (beyond-reference; the
  * reference has no mutation surface at all — its tables are immutable
  * CSV loads, /root/reference Microbase.scala:960-983).
  *
  * A periodically re-ingested 100 TB table needs exactly two operators:
  * "what changed between snapshot A and snapshot B" (audit/drift gate)
  * and "apply this change batch to the base" (the lakehouse MERGE INTO).
  * Both are ONE full-outer equi join on the key — shuffle keys on the
  * key columns only, every other column rides along; at scale both sides
  * co-partition (or bucket) on the same key so the join is exchange-free.
  * The streaming analog (continuous CDC upsert) is
  * [[graft.streaming.EventStreams.upsertLatestByKey]]; these are the
  * batch duals.
  */
object Snapshot {

  /** Row-level snapshot diff: one row per key that was `added`, `removed`,
    * or `changed` between `old` and `new` (unchanged keys are dropped —
    * at 100 TB the diff is the small output, never the snapshots).
    * `compareCols` define change: any non-equal value (null-safe) marks
    * the key changed. Output: key columns + change_type. */
  def diff(
      oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select((keys ++ compareCols).map(col): _*).alias("o")
    val n = newDf.select((keys ++ compareCols).map(col): _*).alias("n")
    val on = keys.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _)
    val inOld = col(s"o.${keys.head}").isNotNull
    val inNew = col(s"n.${keys.head}").isNotNull
    val valueChanged = compareCols
      .map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, on, "full_outer")
      .withColumn("change_type",
        when(!inOld, "added")
          .when(!inNew, "removed")
          .when(valueChanged, "changed"))
      .where(col("change_type").isNotNull)
      .select(keys.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k)) :+
        col("change_type"): _*)
  }

  /** Batch MERGE: apply `changes` to `base` by key — matched rows take
    * the change row's values (update), unmatched change rows insert, and
    * change rows with `deleteFlag` true delete. Exactly Delta/Iceberg
    * `MERGE INTO` semantics for the latest-wins case; `changes` must be
    * key-unique (pre-collapse a CDC stream with latest-per-key first).
    * One full-outer join on the key. */
  def merge(
      base: DataFrame, changes: DataFrame, keys: Seq[String],
      deleteFlag: Column): DataFrame = {
    val dataCols = base.columns.filterNot(keys.contains).toSeq
    val b = base.alias("b")
    val c = changes.alias("c")
    val on = keys.map(k => col(s"b.$k") <=> col(s"c.$k")).reduce(_ && _)
    val inChange = col(s"c.${keys.head}").isNotNull
    b.join(c, on, "full_outer")
      // matched+delete and delete-of-absent rows drop; a null flag = keep
      .where(!inChange || !coalesce(deleteFlag, lit(false)))
      .select(keys.map(k => coalesce(col(s"b.$k"), col(s"c.$k")).as(k)) ++
        dataCols.map(d =>
          when(inChange, col(s"c.$d")).otherwise(col(s"b.$d")).as(d)): _*)
  }
}
