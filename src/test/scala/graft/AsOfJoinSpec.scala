package graft

import org.apache.spark.sql.functions._
import graft.ops.Joins
import graft.sources.Tables

/** The native as-of join (custom LogicalPlan + Strategy + SparkPlan) must
  * return exactly the compositional form's rows, with the sort-merge plan
  * instead of the pair-blowup rank plan. */
class AsOfJoinSpec extends GraftSuite {

  private def purchases = Tables.events(spark, sf)
    .filter(col("event_type") === "purchase")
    .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
  private def views = Tables.events(spark, sf)
    .filter(col("event_type") === "view")
    .select(col("user_id").as("v_user"), col("event_id").as("v_id"),
      col("ts").as("v_ts"))

  private def nativeAsOf = Joins.asOf(
    purchases, views, Seq("user_id" -> "v_user"), "p_ts", "v_ts",
    rightTieBreak = Seq("v_id"))

  test("native as-of join equals the compositional join-filter-rank form") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("p_id"))
      .orderBy(col("v_ts").desc, col("v_id").desc)
    val compositional = purchases
      .join(views, col("user_id") === col("v_user"))
      .filter(col("v_ts") <= col("p_ts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("p_id", "user_id", "p_ts", "v_id", "v_ts")
    // left-outer semantics: compositional drops no-match rows — compare
    // on the matched subset, then check the native form's unmatched rows
    // are exactly the purchases absent from the compositional result.
    val native = nativeAsOf.select("p_id", "user_id", "p_ts", "v_id", "v_ts")
    val nativeMatched = native.filter(col("v_id").isNotNull)
    assert(nativeMatched.count() === compositional.count())
    assert(nativeMatched.exceptAll(compositional).count() === 0)
    assert(compositional.exceptAll(nativeMatched).count() === 0)
    val unmatched = native.filter(col("v_id").isNull).count()
    assert(unmatched === purchases.count() - compositional.count())
  }

  test("as-of plan is a sort-merge pass, not a pair blowup") {
    val df = nativeAsOf
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    // no rank window, no per-key pair materialization
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("as-of picks the latest row at or before t, ties broken by tiebreak") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 10L))
      .toDF("k", "t")
    val r = Seq((1L, 10L, "a"), (1L, 10L, "b"), (1L, 15L, "c"),
        (2L, 6L, "late"), (9L, 1L, "other"))
      .toDF("rk", "rt", "tag")
    val out = Joins.asOf(l, r, Seq("k" -> "rk"), "t", "rt",
        rightTieBreak = Seq("tag"))
      .select("k", "t", "tag").orderBy("k", "t")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    assert(out === Array(
      (1L, 10L, "b"),   // rt=10 ties: greatest tiebreak wins
      (1L, 20L, "c"),   // latest ≤ 20
      (2L, 5L, null),   // only later rows exist
      (3L, 10L, null))) // no such key
  }

  test("as-of join works as a self-join on the same source") {
    // both sides from the same relation — exprId collision territory
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "ts")
    val out = Joins.asOf(
      ev, ev.withColumnRenamed("event_id", "prior_id")
            .withColumnRenamed("user_id", "u2")
            .withColumnRenamed("ts", "ts2"),
      Seq("user_id" -> "u2"), "ts", "ts2", rightTieBreak = Seq("prior_id"))
    // every event's match is itself or an earlier event of the same user
    val bad = out.filter(col("prior_id").isNotNull && col("ts2") > col("ts"))
      .count()
    assert(bad === 0)
    assert(out.count() === ev.count())
  }
}
