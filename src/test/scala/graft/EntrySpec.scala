package graft

import org.apache.spark.sql.functions._

/** Harness-contract checks: every query runs at sf0.001, names are unique,
  * every oracle key exists, flagship entry returns rows. */
class EntrySpec extends GraftSuite {

  test("query names are globally unique across packs") {
    val names = SparkEntry.packs.flatMap(_.queries.keys)
    assert(names.distinct.size === names.size,
      s"duplicates: ${names.groupBy(identity).filter(_._2.size > 1).keys}")
  }

  test("every oracle key has a query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // Queries whose empty result at tiny SF is semantically legitimate
  // (near-dup pair finders over mostly-unique fixtures, anti joins).
  private val mayBeEmpty =
    Set("j10_join_anti", "dd3_minhash_dup_pairs", "dd8_simhash_pairs")

  test("all queries execute and return rows at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val n = fn(spark, sf).count()
          if (n == 0 && !mayBeEmpty(name)) Some(s"$name: 0 rows") else None
        } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("no Limit can truncate a fingerprint-guarded MapPartitions (guard-gap pin)") {
    // The runningSumPass fingerprint guard fires at partition EXHAUSTION
    // (Pipeline.scala KNOWN GAP note): a Limit that stops pulling rows
    // before exhaustion (CollectLimit / LocalLimit take(n) per
    // partition) would emit rows the guard never verified. This pins the
    // documented "no catalog path truncates" invariant mechanically: in
    // every catalog query's analyzed plan — subqueries included — no
    // Limit sits above a running-sum MapPartitions (recognized by the
    // dedicated Pipeline.RunningSumFingerprintCol marker in its
    // subtree) unless a full-consumption
    // barrier (Sort or Aggregate: both drain their child completely
    // before emitting their first row) lies between them. A future
    // catalog query that breaks the invariant fails HERE, turning the
    // prose gap into a load-bearing check.
    import org.apache.spark.sql.catalyst.plans.logical._
    def fingerprinted(p: LogicalPlan): Boolean =
      p.collectFirst {
        case n if n.output.exists(
          _.name == graft.ops.Pipeline.RunningSumFingerprintCol) => n
      }.isDefined
    def walk(p: LogicalPlan, limitAbove: Boolean): Seq[LogicalPlan] = {
      val here = p match {
        case mp: MapPartitions if limitAbove && fingerprinted(mp.child) =>
          Seq(mp)
        case _ => Nil
      }
      val below = p match {
        case _: GlobalLimit | _: LocalLimit =>
          p.children.flatMap(walk(_, limitAbove = true))
        case _: Sort | _: Aggregate =>
          p.children.flatMap(walk(_, limitAbove = false))
        case _ => p.children.flatMap(walk(_, limitAbove))
      }
      // subquery plans execute as their own drained jobs (collect /
      // hash-set build), so the limit context resets — but a Limit
      // INSIDE one truncates that job's partitions like any other
      val subs = p.expressions.flatMap(_.collect {
        case sq: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          walk(sq.plan, limitAbove = false)
      }.flatten)
      here ++ below ++ subs
    }
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.analyzed
        if (walk(plan, limitAbove = false).nonEmpty) Some(name) else None
    }
    graft.ops.Pipeline.releaseCaches()
    assert(offenders.isEmpty,
      s"Limit above an exhaustion-checked running-sum pass in: " +
        s"${offenders.mkString(", ")} — the fingerprint guard would " +
        "never run for truncated partitions; add a Sort/Aggregate " +
        "barrier or verify via a deferred pre-consumption check")
  }

  test("q1 flagship values are sane") {
    val q1 = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    val rows = q1.collect()
    assert(rows.length === 6) // 3 returnflags × 2 linestatuses
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val liCount = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("2000-09-02").cast("timestamp")).count()
    assert(total === liCount)
  }
}
