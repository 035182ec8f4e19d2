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

  test("forward as-of: smallest rt >= t, inclusive boundary, tie-break") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 25L), (2L, 40L)).toDF("k", "t")
      .withColumn("t", col("t").cast("timestamp"))
    val r = Seq((1L, 10L, "a"), (1L, 10L, "b"), (1L, 20L, "c"),
        (1L, 30L, "d"), (2L, 35L, "x"))
      .toDF("rk", "rt", "tag")
      .withColumn("rt", col("rt").cast("timestamp"))
    val out = Joins.asOfForward(l, r, Seq("k" -> "rk"), "t", "rt",
        rightTieBreak = Seq("tag"))
      .select("k", "t", "tag").orderBy("k", "t")
      .collect().map(x => (x.getLong(0), x.getString(2)))
    assert(out === Array(
      (1L, "b"),  // rt=10 >= t=10 inclusive; tie a/b -> greatest tiebreak
      (1L, "d"),  // smallest rt >= 25 is 30
      (2L, null))) // only earlier rows exist for k=2
  }

  test("forward as-of tolerance nulls far matches, keeps the row") {
    import spark.implicits._
    val l = Seq((1L, 25L)).toDF("k", "t")
      .withColumn("t", col("t").cast("timestamp"))
    val r = Seq((1L, 30L, "d")).toDF("rk", "rt", "tag")
      .withColumn("rt", col("rt").cast("timestamp"))
    def run(tolSec: Long) = Joins.asOfForward(
      l, r, Seq("k" -> "rk"), "t", "rt",
      toleranceMicros = Some(tolSec * 1000000L)).collect()
    val within = run(5)  // match at +5s, tolerance 5s: kept (inclusive)
    assert(within.length === 1 && within(0).getAs[String]("tag") === "d")
    val beyond = run(4)  // tolerance 4s: right columns nulled, row kept
    assert(beyond.length === 1 && beyond(0).getAs[String]("tag") === null
      && beyond(0).getAs[Any]("rt") === null)
  }

  test("forward as-of resolves shared column names (both sides ts/v)") {
    import spark.implicits._
    // the most common as-of shape: key, time, and value columns all share
    // names across sides — bare-name resolution would be ambiguous
    val l = Seq((1L, 10L, "L")).toDF("k", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val r = Seq((1L, 12L, "R1"), (1L, 99L, "R2")).toDF("k", "ts", "v")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Joins.asOfForward(l, r, Seq("k" -> "k"), "ts", "ts")
    assert(out.columns.toSeq === Seq("k", "ts", "v", "k", "ts", "v"))
    val row = out.collect().head
    assert(row.getString(2) === "L")  // left v intact
    assert(row.getString(5) === "R1") // forward match is rt=12, not 99
    // tolerance path addresses right columns post-join — 1s nulls the match
    val tol = Joins.asOfForward(l, r, Seq("k" -> "k"), "ts", "ts",
      toleranceMicros = Some(1000000L)).collect().head
    assert(tol.getString(2) === "L" && tol.getString(5) === null)
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
