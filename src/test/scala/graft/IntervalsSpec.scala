package graft

import org.apache.spark.sql.functions._
import graft.ops.Intervals

/** Interval overlap join + coalescing: equivalence to naive forms,
  * exactly-once pair generation, boundary semantics, plan shape. */
class IntervalsSpec extends GraftSuite {

  private def fixtures = {
    import spark.implicits._
    // Mixed-length intervals across many bins: short (within one bin),
    // long (spanning several), touching, nested, disjoint.
    val a = (0L until 300L)
      .map(i => (i, i * 13L, i * 13L + (i % 7) * 20L))
      .toDF("a_id", "a_s", "a_e")
    val b = (0L until 200L)
      .map(i => (i, i * 19L + 5L, i * 19L + 5L + (i % 5) * 30L))
      .toDF("b_id", "b_s", "b_e")
    (a, b)
  }

  test("overlap join equals the naive theta join, each pair exactly once") {
    val (a, b) = fixtures
    val binned = Intervals.overlapJoin(a, b,
      col("a_s"), col("a_e"), col("b_s"), col("b_e"), binSize = 64L)
    val naive = a.join(b, col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
    // set equality AND multiplicity: a duplicated pair would survive the
    // except checks only if counts also match
    assert(binned.count() === naive.count())
    assert(binned.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(binned).count() === 0)
    // no pairwise scan: bins make it an equi join
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("overlap join boundaries are inclusive; disjoint pairs excluded") {
    import spark.implicits._
    val l = Seq((1L, 10L, 20L)).toDF("l_id", "l_s", "l_e")
    val r = Seq(
      (10L, 20L, 30L), // touches at a point (l_e == r_s) — overlap
      (11L, 0L, 10L),  // touches at a point (r_e == l_s) — overlap
      (12L, 21L, 25L), // strictly after — no
      (13L, 0L, 9L),   // strictly before — no
      (14L, 12L, 18L), // nested — yes
      (15L, 0L, 100L)  // containing — yes
    ).toDF("r_id", "r_s", "r_e")
    val got = Intervals.overlapJoin(l, r,
        col("l_s"), col("l_e"), col("r_s"), col("r_e"), binSize = 8L)
      .select("r_id").as[Long].collect().toSet
    assert(got === Set(10L, 11L, 14L, 15L))
  }

  test("overlap join extraCond keys scope the pair space") {
    import spark.implicits._
    val l = Seq((1L, "x", 0L, 10L), (2L, "y", 0L, 10L))
      .toDF("l_id", "l_k", "l_s", "l_e")
    val r = Seq((7L, "x", 5L, 15L), (8L, "y", 50L, 60L))
      .toDF("r_id", "r_k", "r_s", "r_e")
    val got = Intervals.overlapJoin(l, r,
        col("l_s"), col("l_e"), col("r_s"), col("r_e"), binSize = 8L,
        extraCond = col("l_k") === col("r_k"))
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.toSet === Set((1L, 7L))) // (2,y) windows don't overlap
  }

  test("mergeIntervals coalesces overlapping and touching, splits disjoint") {
    import spark.implicits._
    val iv = Seq(
      // key "a": [0,10] [5,20] (overlap) [20,25] (touching) → one span
      ("a", 0L, 10L), ("a", 5L, 20L), ("a", 20L, 25L),
      // then a gap → [30, 35] its own span
      ("a", 30L, 35L),
      // key "b": nested + disjoint
      ("b", 0L, 100L), ("b", 10L, 20L), ("b", 200L, 201L)
    ).toDF("k", "s", "e")
    val spans = Intervals.mergeIntervals(iv, "k", "s", "e")
      .orderBy("k", "span_start")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.toSeq === Seq(
      ("a", 0L, 25L, 3L), ("a", 30L, 35L, 1L),
      ("b", 0L, 100L, 2L), ("b", 200L, 201L, 1L)))
  }

  test("mergeIntervals matches a naive per-key sweep on random-ish input") {
    import spark.implicits._
    // deterministic pseudo-random intervals (no Math.random in specs)
    val rows = (0 until 500).map { i =>
      val k = s"k${i % 7}"
      val s = (i * 1103515245L + 12345L) % 1000L
      (k, s, s + (i * 31L) % 80L)
    }
    val df = rows.toDF("k", "s", "e")
    val got = Intervals.mergeIntervals(df, "k", "s", "e")
      .orderBy("k", "span_start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // reference: in-memory sweep per key
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (k, ivs) =>
      val sorted = ivs.map(x => (x._2, x._3)).sortBy(identity)
      val spans = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      sorted.foreach { case (s, e) =>
        if (spans.nonEmpty && s <= spans.last._2)
          spans(spans.size - 1) =
            (spans.last._1, math.max(spans.last._2, e))
        else spans += ((s, e))
      }
      spans.map(sp => (k, sp._1, sp._2))
    }.sortBy(x => (x._1, x._2))
    assert(got.toSeq === expected)
  }
}
