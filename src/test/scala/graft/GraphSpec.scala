package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** Graph analytics: hand-checked small graph + naive-reference cross-check
  * on the fixture near-dup graph (the degree-ordered enumeration must
  * agree exactly with brute-force set intersection). */
class GraphSpec extends GraftSuite {
  import spark.implicits._

  test("jaccard link prediction normalizes hub co-occurrence down") {
    // candidates 1-2 (via mediators 5,6) and 3-4 (via 5,6): same common
    // count 2, but 3 and 4 carry extra hub edges → lower jaccard
    val edges = Seq(
      (1L, 5L), (1L, 6L), (2L, 5L), (2L, 6L),            // deg(1)=deg(2)=2
      (3L, 5L), (3L, 6L), (4L, 5L), (4L, 6L),
      (3L, 7L), (3L, 8L), (4L, 9L), (4L, 10L))           // deg(3)=deg(4)=4
      .toDF("id_a", "id_b")
    val got = Graph.jaccardLinkPrediction(edges, minCommon = 2L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got((1L, 2L)) === ((2L, 1.0)))        // 2/(2+2-2): perfect overlap
    assert(got((3L, 4L)) === ((2L, 2.0 / 6.0)))  // 2/(4+4-2): hub-diluted
    assert(got((1L, 3L))._2 === 2.0 / 4.0)       // 2/(2+4-2)
  }

  // K4 plus a pendant: triangles = C(4,3) = 4, all on {1,2,3,4}.
  private def k4edges = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    .toDF("id_a", "id_b")

  test("canonical dedups, orders, and drops loops") {
    val raw = Seq((2L, 1L), (1L, 2L), (3L, 3L), (1L, 2L)).toDF("x", "y")
    val e = Graph.canonical(raw, "x", "y").collect()
    assert(e.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("K4 + pendant: 4 triangles, correct per-node counts") {
    val tri = Graph.triangles(k4edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tri == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    val counts = Graph.triangleCounts(k4edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each K4 vertex sits in C(3,2) = 3 triangles; the pendant in none
    assert(counts == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("clustering coefficients: K4 vertices 1.0, bridge vertices fractional") {
    // K4 + pendant 4-5: deg(1..3)=3 with 3 triangles → cc = 2·3/(3·2) = 1;
    // deg(4)=4 with 3 triangles → cc = 2·3/(4·3) = 0.5; pendant 5 has
    // deg 1 → excluded (cc undefined below degree 2)
    val cc = Graph.clusteringCoefficients(k4edges).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(cc == Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0, 4L -> 0.5))
    // triangle-free node with degree ≥ 2 reports cc = 0, not a missing row
    val path = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val ccPath = Graph.clusteringCoefficients(path).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(ccPath.toSeq == Seq((2L, 0L, 0.0)))
    // non-canonical input canonicalizes internally (no double counting)
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 1L), (3L, 2L)).toDF("id_a", "id_b")
    val ccMessy = Graph.clusteringCoefficients(messy).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ccMessy == Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0))
  }

  test("common neighbors: unconnected pairs only, counts exact") {
    // path 1-2-3 plus 1-4, 3-4: pair (1,3) shares {2,4}; (2,4) shares {1,3}
    val e = Seq((1L, 2L), (2L, 3L), (1L, 4L), (3L, 4L)).toDF("id_a", "id_b")
    val cn = Graph.commonNeighbors(e, 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cn == Map((1L, 3L) -> 2L, (2L, 4L) -> 2L))
  }

  test("fixture near-dup graph matches a naive local reference") {
    val edges = Graph.canonical(
      graft.ops.Similarity.bruteForceNearDupPairs(
        graft.sources.Tables.embeddings(spark, sf), "vec_id", "embedding", 0.3),
      "id_a", "id_b")
      .persist()
    val e = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = e.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    // naive triangle counts
    val naive = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    var total = 0
    for ((a, b) <- e; c <- adj(a) intersect adj(b) if c > b) {
      total += 1
      Seq(a, b, c).foreach(n => naive(n) += 1)
    }
    assert(total > 0, "fixture graph should contain triangles")
    val got = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naive.toMap)
    // naive common neighbors among unconnected pairs
    val eset = e.toSet
    val nodes = adj.keys.toSeq.sorted
    val naiveCn = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      a = nodes(i); b = nodes(j)
      if !eset.contains((a, b))
      common = (adj(a) intersect adj(b)).size
      if common >= 2
    } yield (a, b) -> common.toLong).toMap
    val gotCn = Graph.commonNeighbors(edges, 2L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(gotCn == naiveCn)
    edges.unpersist()
  }

  test("pagerank matches a naive local power iteration, mass conserved") {
    val n = 5
    val und = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L,
      3L -> 4L, 4L -> 5L)
    val adj = und.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var rank = adj.keys.map(_ -> 1.0 / n).toMap
    (1 to 5).foreach { _ =>
      rank = adj.keys.map { v =>
        v -> ((1.0 - 0.85) / n +
          0.85 * adj(v).map(u => rank(u) / adj(u).size).sum)
      }.toMap
    }
    val got = Graph.pageRank(k4edges, iterations = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == rank.keySet)
    // decimal-summed vs naive double-summed: equal to summation noise
    got.foreach { case (v, p) => assert(math.abs(p - rank(v)) < 1e-12) }
    // a fixed-iteration damped walk on a dangling-free graph conserves
    // probability mass
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // the K4 core outranks the pendant
    assert(got(5L) < got(4L) && got(5L) < got(1L))
    // non-canonical input (reversed/duplicated edges) is canonicalized
    // internally: bit-identical ranks
    import spark.implicits._
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 1L), (4L, 1L), (3L, 2L),
      (4L, 2L), (4L, 3L), (5L, 4L)).toDF("id_a", "id_b")
    val again = Graph.pageRank(messy, iterations = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again === got)
    // the order-independent decimal mode (the 100 TB shape) agrees with
    // the ordered-fold mode to summation noise
    val decimalMode = Graph.pageRank(k4edges, iterations = 5,
        orderedFold = false).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    decimalMode.foreach { case (v, p) => assert(math.abs(p - got(v)) < 1e-12) }
  }

  test("degree-capped common neighbors drops hub-mediated pairs") {
    // hub 9 connects 1,2,4,5 (degree 4); node 3 connects 1,2 (degree 2).
    // Pair (1,2) has mediators {9,3}; pair (3,9) has mediators {1,2}.
    // Edges are fed NON-canonically (reversed + one duplicate) — the
    // operator must canonicalize internally, or the anti join would
    // report existing edges as predictions.
    val e = Seq((9L, 1L), (2L, 9L), (9L, 4L), (5L, 9L), (3L, 1L), (2L, 3L),
      (1L, 9L) /* dup of (9,1) reversed */).toDF("id_a", "id_b")
    def cn(maxDeg: Long) = Graph.commonNeighbors(e, 2L, maxDegree = maxDeg)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // uncapped: both pairs predicted, via full expected-set equality —
    // in particular NO existing edge appears (the anti-join must hold
    // on the canonicalized shape)
    assert(cn(Long.MaxValue) == Map((1L, 2L) -> 2L, (3L, 9L) -> 2L))
    // cap 3 excludes hub 9 as a MEDIATOR: (1,2) drops to one common
    // neighbor and disappears; (3,9) keeps mediators {1,2} (degree 2) —
    // and hub 9 remains eligible as an ENDPOINT
    assert(cn(3L) == Map((3L, 9L) -> 2L))
  }

  test("personalized pagerank: mass 1, seed favored, unreachable exactly 0") {
    // triangle {1,2,3} + disconnected pair {8,9}; restart on node 1 only
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (8L, 9L)).toDF("id_a", "id_b")
    val r = Graph.personalizedPageRank(e, 5, col("node") === 1L)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-12) // restart mass conserved
    assert(r(1L) > r(2L))           // the seed keeps the restart mass
    assert(r(2L) === r(3L))         // symmetric non-seeds tie exactly
    assert(r(8L) === 0.0 && r(9L) === 0.0) // unreachable from the seed
  }

  test("kHopCounts: path graph blast radius, non-canonical input") {
    // path 1-2-3-4-5 plus an isolated pair 6-7; edges fed reversed/duped
    val e = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L), (7L, 6L), (1L, 2L))
      .toDF("id_a", "id_b")
    def khop(k: Int) = Graph.kHopCounts(e, k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // k=1 is plain degree
    assert(khop(1) == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 1L,
      6L -> 1L, 7L -> 1L))
    // k=2: endpoints see 2, node 3 sees everyone but 6/7
    assert(khop(2) == Map(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 3L, 5L -> 2L,
      6L -> 1L, 7L -> 1L))
    // k=4: whole component (4 others), pair still sees only each other
    assert(khop(4) == Map(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L, 5L -> 4L,
      6L -> 1L, 7L -> 1L))
  }

  test("kHopCounts pins its adjacency; releaseCaches frees it") {
    // every expansion round joins the adjacency and the final rollup
    // reads it again — unpinned, the canonical distinct shuffle re-ran
    // k+1 times over the full edge list (round-16 review; pageRank and
    // labelPropagation already persisted theirs)
    val cm = spark.sharedState.cacheManager
    graft.ops.Pipeline.releaseCaches()
    val cleanBefore = cm.isEmpty
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    Graph.kHopCounts(e, 3).count() // the consuming action
    assert(!cm.isEmpty, "adjacency must be pinned for the rollup")
    graft.ops.Pipeline.releaseCaches()
    if (cleanBefore) assert(cm.isEmpty)
  }

  test("labelPropagation: bridge-joined triangles split, CC would merge") {
    // triangles {1,2,3} and {4,5,6} joined by one bridge edge 3-4 —
    // hand-traced 3 sync rounds with (count desc, label asc) tie-break
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L),
      (3L, 4L)).toDF("id_a", "id_b")
    val got = Graph.labelPropagation(e, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
    // exactly two communities — the bridge did NOT merge them (CC would)
    assert(got.values.toSet.size === 2)
  }

  test("bipartiteProjection: weights, dup links, basket cap, minWeight") {
    // baskets: g1={1,2,3}, g2={1,2}, g3={1,2} with a duplicated link row
    val links = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 2L), (30L, 2L)) // dup (30,2) must count once
      .toDF("g", "item")
    def got(maxBasket: Long, minWeight: Long) =
      Graph.bipartiteProjection(links, "g", "item", maxBasket, minWeight)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // uncapped: (1,2) in all 3 baskets; (1,3) and (2,3) only in g1
    assert(got(Long.MaxValue, 1L) ===
      Map((1L, 2L) -> 3L, (1L, 3L) -> 1L, (2L, 3L) -> 1L))
    // minWeight prunes the singleton tail
    assert(got(Long.MaxValue, 2L) === Map((1L, 2L) -> 3L))
    // maxBasket=2 drops the size-3 basket BEFORE pair generation
    assert(got(2L, 1L) === Map((1L, 2L) -> 2L))
  }

  test("kCore: two-round peel keeps only the triangle; loud non-convergence") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // triangle {1,2,3} with a chain 3-4-5: round 1 peels 5 (degree 1),
    // which drops 4 to degree 1, so round 2 peels 4 — a single pass
    // would wrongly keep it. Non-canonical input on purpose.
    val edges = Seq((2L, 1L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    val got = graft.ops.Graph.kCore(edges, k = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // entire graph peels away at k=3 → empty core, no crash
    assert(graft.ops.Graph.kCore(edges, k = 3).count() === 0)
    // refusing to return a non-fixpoint subgraph: the two-round graph
    // must fail loudly when capped at one round
    val e = intercept[IllegalStateException] {
      graft.ops.Graph.kCore(edges, k = 2, maxRounds = 1).collect()
    }
    assert(e.getMessage.contains("still peeling"))
  }
}
