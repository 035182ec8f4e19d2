package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-based algebraic laws over generated tables (SURVEY.md §5.2):
  * the operator library must satisfy relational identities regardless of
  * data. ScalaCheck generators with fixed seeds (deterministic in CI);
  * the scalatest-scalacheck bridge isn't among the pinned deps, so
  * sampling is explicit. */
class PropertySpec extends GraftSuite {
  import spark.implicits._

  private val rowsGen = Gen.listOfN(40,
    Gen.zip(Gen.chooseNum(0L, 20L), Gen.chooseNum(-100, 100),
      Gen.oneOf("x", "y", "z")))

  private def samples(n: Int): Seq[List[(Long, Int, String)]] =
    (1 to n).map { i =>
      rowsGen.apply(Gen.Parameters.default, rng.Seed(42L + i))
        .getOrElse(List.empty)
    }

  test("filter pushdown through join preserves results") {
    for (Seq(l, r) <- samples(6).grouped(2)) {
      val left = l.toDF("k", "v", "tag")
      val right = r.toDF("k", "w", "tag2").drop("tag2")
      val pushed = left.filter($"v" > 0).join(right, "k")
      val late = left.join(right, "k").filter($"v" > 0)
      assert(pushed.exceptAll(late).count() === 0)
      assert(late.exceptAll(pushed).count() === 0)
    }
  }

  test("union-all cardinality is additive; union-distinct bounded") {
    for (Seq(a, b) <- samples(6).grouped(2)) {
      val da = a.toDF("k", "v", "tag")
      val db = b.toDF("k", "v", "tag")
      assert(da.union(db).count() === da.count() + db.count())
      val d = da.union(db).distinct().count()
      assert(d <= da.distinct().count() + db.distinct().count())
      assert(d >= math.max(da.distinct().count(), db.distinct().count()))
    }
  }

  test("sort is a permutation: same multiset before and after") {
    for (a <- samples(4)) {
      val df = a.toDF("k", "v", "tag")
      val sorted = df.orderBy($"k".desc, $"v".asc)
      assert(sorted.exceptAll(df).count() === 0)
      assert(df.exceptAll(sorted).count() === 0)
    }
  }

  test("groupBy sum equals local fold") {
    for (a <- samples(4)) {
      val df = a.toDF("k", "v", "tag")
      val viaSpark = df.groupBy("k").agg(sum($"v").as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val local = a.groupBy(_._1).map { case (k, vs) =>
        k -> vs.map(_._2.toLong).sum }
      assert(viaSpark === local)
    }
  }

  test("semi and anti join partition the left relation") {
    for (Seq(l, r) <- samples(6).grouped(2)) {
      val left = l.toDF("k", "v", "tag")
      val right = r.toDF("k", "w", "tag2")
      val semi = left.join(right, Seq("k"), "left_semi")
      val anti = left.join(right, Seq("k"), "left_anti")
      assert(semi.count() + anti.count() === left.count())
      assert(semi.intersect(anti).count() === 0)
    }
  }
}
