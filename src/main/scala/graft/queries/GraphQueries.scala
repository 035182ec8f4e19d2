package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Graph, Similarity}
import graft.sources.Tables

/** Graph analytics over the embedding near-dup graph (nodes = vectors,
  * edges = pairs with cosine ≥ 0.3): degree profile, triangle structure,
  * and common-neighbor link prediction. The edge list here comes from the
  * bounded brute-force pair scan (exact, hence oracle-checkable); at
  * 100 TB the SAME operators run over `Similarity.srpNearDupPairs` /
  * `Dedup.minhashNearDupPairs` output — the analytics layer only ever
  * touches the edge list, shuffling on node ids.
  */
object GraphQueries extends QueryPack {

  private def simEdges(s: org.apache.spark.sql.SparkSession, d: String) =
    Graph.canonical(
      Similarity.bruteForceNearDupPairs(
        Tables.embeddings(s, d), "vec_id", "embedding", 0.3),
      "id_a", "id_b")

  val queries: Map[String, Fn] = Map(
    // Degree histogram of the near-dup graph — heavy tail ⇒ template
    // clusters. Two shuffles (node, then degree), both on tiny keys.
    "gr1_degree_hist" -> ((s, d) =>
      Graph.degreeHistogram(simEdges(s, d))
        .orderBy("degree")),

    // Per-node triangle participation via degree-ordered wedge
    // enumeration — each triangle generated exactly once at its
    // lowest-(degree, id) vertex, O(m^1.5) total work (no Σ deg²
    // hub-node straggler).
    "gr2_triangles" -> ((s, d) =>
      Graph.triangleCounts(simEdges(s, d))
        .orderBy("node")),

    // 2-core of the near-dup graph: pendant one-off matches peel away,
    // what survives is densely interlinked duplication (template farms).
    // The oracle replays MORE peel rounds than the fixture needs — the
    // peel is idempotent at fixpoint, so extra rounds are no-ops.
    "gr11_kcore" -> ((s, d) =>
      Graph.kCore(simEdges(s, d), k = 2, maxRounds = 6)
        .orderBy("node")),

    // Link prediction: unconnected pairs with ≥ 2 common neighbors —
    // in a dedup graph, the pairs the candidate generator likely missed.
    // Hub capping (maxDegree = 8, the fixture graph's p90 degree) is
    // exercised here on purpose: a shared neighbor fans out deg² pairs,
    // so one boilerplate doc connected to everything would dominate the
    // whole job's cost while predicting nothing (it "mediates" every
    // pair). The cap drops hub nodes as MEDIATORS only — they can still
    // appear as endpoints of predicted pairs.
    "gr3_link_prediction" -> ((s, d) =>
      Graph.commonNeighbors(simEdges(s, d), minCommon = 2L, maxDegree = 8L)
        .orderBy(col("common_neighbors").desc, col("node_a"), col("node_b"))),

    // Jaccard-normalized link prediction: the gr3 candidates re-scored by
    // neighborhood overlap J = common/(deg_a + deg_b − common) — ranks
    // tight-cluster pairs above hub co-occurrences. Uncapped here so J is
    // the exact coefficient.
    "gr6_jaccard_links" -> ((s, d) =>
      Graph.jaccardLinkPrediction(simEdges(s, d), minCommon = 2L)
        .orderBy(col("jaccard").desc, col("node_a"), col("node_b"))),

    // PageRank (5 damped power iterations) — "template centrality" of the
    // near-dup graph: high-rank docs sit inside big boilerplate clusters.
    // Hash-exact despite being float-iterative: per-edge contributions
    // are IEEE double ops, and the per-node sums are source-ordered
    // sequential folds on both engines (see Graph.pageRank's exactness
    // note; the decimal-summed order-independent mode is the 100 TB
    // shape).
    "gr4_pagerank" -> ((s, d) =>
      Graph.pageRank(simEdges(s, d), iterations = 5)
        .orderBy(col("pagerank").desc, col("node"))),

    // Local clustering coefficient — cc ≈ 1 marks fully-connected template
    // clusters (drop all but one), low-cc hubs mark LSH false positives.
    // Hash-exact: a single IEEE division of exact integers per node.
    "gr5_clustering_coeff" -> ((s, d) =>
      Graph.clusteringCoefficients(simEdges(s, d))
        .orderBy(col("clustering_coeff").desc, col("node"))),

    // Personalized PageRank (restart on seed nodes < 50): query-biased
    // centrality — "relevance to this audited seed set". Same iteration
    // machinery and fold-exactness as gr4; only the restart vector is a
    // per-node when() instead of a constant.
    "gr8_personalized_pr" -> ((s, d) =>
      Graph.personalizedPageRank(simEdges(s, d), iterations = 5,
          seedPred = col("node") < 50)
        .orderBy(col("pagerank").desc, col("node"))),

    // k-hop blast radius (k=3): distinct nodes reachable in ≤ 3 hops —
    // distributed BFS by frontier expansion, one join/distinct/anti-join
    // shuffle trio per round, state bounded by the true reach set.
    "gr7_khop" -> ((s, d) =>
      Graph.kHopCounts(simEdges(s, d), 3)
        .orderBy("node")),

    // Market-basket projection: a part↔part graph minted from order
    // baskets (weight = co-occurring orders). Demonstrates graph
    // CONSTRUCTION from transactional data, not just analytics on a
    // given edge list; the basket cap (6 = TPC-H's near-max lines per
    // order) is the mediator-capping guard that keeps one degenerate
    // basket from costing |basket|² alone.
    // Community detection: 3 rounds of synchronous label propagation
    // with smallest-label tie-break — splits template families that CC
    // would merge across one chance bridge edge; per round one
    // neighbor-keyed join + (node,label) count + per-node argmax.
    "gr10_communities" -> ((s, d) =>
      Graph.labelPropagation(simEdges(s, d), rounds = 3)
        .orderBy("node")),

    "gr9_copurchase" -> ((s, d) =>
      Graph.bipartiteProjection(
        Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", maxBasket = 6L, minWeight = 2L)
        .select(col("item_a").as("part_a"), col("item_b").as("part_b"),
          col("weight"))
        .orderBy(col("weight").desc, col("part_a"), col("part_b")))
  )

  // Same sequential-fold cosine as the Spark side (bit-identical doubles;
  // proven by dd6) — 64-dim embeddings.
  private def cosSql(a: String, b: String): String =
    s"""list_sum([CAST($a[i] AS DOUBLE)*CAST($b[i] AS DOUBLE) for i in range(1,65)]) /
        (sqrt(list_sum([CAST($a[i] AS DOUBLE)*CAST($a[i] AS DOUBLE) for i in range(1,65)])) *
         sqrt(list_sum([CAST($b[i] AS DOUBLE)*CAST($b[i] AS DOUBLE) for i in range(1,65)])))"""

  private val edgeCte =
    s"""p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          ${cosSql("a.embedding", "b.embedding")} AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
        e AS (SELECT id_a, id_b FROM p WHERE cos >= 0.3),
        adj AS (SELECT id_a AS node, id_b AS nbr FROM e
                UNION ALL SELECT id_b, id_a FROM e),
        deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree
                FROM adj GROUP BY node)"""

  // Synchronous LPA rounds as staged CTEs: round k counts neighbor
  // labels from l{k-1} and takes the per-node argmax with
  // (count DESC, label ASC) — the same total order as the Spark side's
  // min(struct(-cnt, lbl)).
  private def lpaRounds(rounds: Int): String = (1 to rounds).map { k =>
    s"""c$k AS (SELECT adj.node, l${k - 1}.lbl, count(*) AS cnt
          FROM adj JOIN l${k - 1} ON l${k - 1}.node = adj.nbr
          GROUP BY adj.node, l${k - 1}.lbl),
        l$k AS (SELECT node, lbl FROM (
            SELECT node, lbl, row_number() OVER (PARTITION BY node
              ORDER BY cnt DESC, lbl ASC) AS rn FROM c$k) WHERE rn = 1)"""
  }.mkString(",\n        ")

  // Mirrors Graph.pageRank exactly: r0 = 1/n; r_{i+1} = (1-d)/n + d·Σ
  // with the per-node sum as a SOURCE-ORDERED sequential double fold
  // (DuckDB's list_sum over an ORDER BY src list ≡ Spark's aggregate()
  // fold over the src-sorted collect_list — the proven dd6/ss1 pattern)
  // and everything else IEEE double — see the operator's exactness note.
  private def pagerankCtes(seed: Option[String => String]): String = {
    // restart vector: constant for plain PR; CASE over the seed predicate
    // for personalized PR — mirrors Graph.pageRankImpl.restart exactly
    def restart(scale: String, c: String): String = seed match {
      case None => s"$scale / (SELECT n FROM nn)"
      case Some(p) =>
        s"""CASE WHEN ${p(c)} THEN $scale / (SELECT n FROM nn)
            ELSE CAST(0 AS DOUBLE) END"""
    }
    val nn = seed match {
      case None => "SELECT CAST(count(*) AS DOUBLE) AS n FROM odeg"
      case Some(p) =>
        s"SELECT CAST(count(*) AS DOUBLE) AS n FROM odeg WHERE ${p("src")}"
    }
    val base = restart("(CAST(1 AS DOUBLE) - 0.85)", "o.node")
    val iters = (1 to 5).map { i =>
      s"""r$i AS (SELECT o.node,
            $base + 0.85 * COALESCE(s.s, CAST(0 AS DOUBLE)) AS pagerank
          FROM (SELECT src AS node FROM odeg) o
          LEFT JOIN (SELECT a.dst AS node,
                list_sum(list(r.pagerank / a.deg ORDER BY a.src)) AS s
              FROM adjd a JOIN r${i - 1} r ON r.node = a.src
              GROUP BY a.dst) s ON s.node = o.node)"""
    }.mkString(",\n")
    s"""adj2 AS (SELECT id_a AS src, id_b AS dst FROM e
          UNION ALL SELECT id_b, id_a FROM e),
        odeg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
                 FROM adj2 GROUP BY src),
        adjd AS (SELECT a.src, a.dst, d.deg FROM adj2 a
                 JOIN odeg d ON d.src = a.src),
        nn AS ($nn),
        r0 AS (SELECT src AS node,
                 ${restart("CAST(1 AS DOUBLE)", "src")} AS pagerank
               FROM odeg),
        $iters"""
  }

  /** Six staged peel rounds: e_k{i} keeps edges whose BOTH endpoints
    * have degree ≥ k inside e_k{i-1} — idempotent once at fixpoint, so
    * replaying more rounds than the data needs is exact, never wrong.
    * Every round is MATERIALIZED: each references its predecessor three
    * times, and DuckDB's default CTE inlining would otherwise expand the
    * base pairwise scan ~3^rounds times (measured: fd exhaustion). */
  private def kcoreRounds(k: Int, rounds: Int): String = {
    val iters = (1 to rounds).map { i =>
      s"""kd$i AS MATERIALIZED (
            SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
              SELECT id_a AS node FROM ek${i - 1}
              UNION ALL SELECT id_b FROM ek${i - 1})
            GROUP BY node),
          kk$i AS MATERIALIZED (SELECT node FROM kd$i WHERE deg >= $k),
          ek$i AS MATERIALIZED (SELECT e.id_a, e.id_b FROM ek${i - 1} e
            JOIN kk$i a ON a.node = e.id_a
            JOIN kk$i b ON b.node = e.id_b)"""
    }.mkString(",\n")
    s"ek0 AS MATERIALIZED (SELECT id_a, id_b FROM e),\n$iters"
  }

  val oracle: Map[String, String] = Map(
    "gr11_kcore" ->
      s"""WITH $edgeCte,
          ${kcoreRounds(2, 6)}
          SELECT node, CAST(count(*) AS BIGINT) AS core_degree FROM (
            SELECT id_a AS node FROM ek6
            UNION ALL SELECT id_b FROM ek6)
          GROUP BY node ORDER BY node""",
    "gr1_degree_hist" ->
      s"""WITH $edgeCte
          SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
          FROM deg GROUP BY degree ORDER BY degree""",
    "gr10_communities" ->
      s"""WITH $edgeCte,
          l0 AS (SELECT DISTINCT node, node AS lbl FROM adj),
          ${lpaRounds(3)}
          SELECT node, lbl AS community FROM l3 ORDER BY node""",
    "gr2_triangles" ->
      s"""WITH $edgeCte,
          tri AS (SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
                  FROM e e1
                  JOIN e e2 ON e2.id_a = e1.id_b
                  JOIN e e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b),
          tn AS (SELECT unnest([a, b, c]) AS node FROM tri)
          SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
          FROM tn GROUP BY node ORDER BY node""",
    "gr3_link_prediction" ->
      s"""WITH $edgeCte,
          adjc AS (SELECT a.node, a.nbr FROM adj a
                   JOIN deg d ON d.node = a.nbr AND d.degree <= 8),
          cn AS (SELECT x.node AS node_a, y.node AS node_b,
                   CAST(count(*) AS BIGINT) AS common_neighbors
                 FROM adjc x JOIN adjc y ON x.nbr = y.nbr AND x.node < y.node
                 GROUP BY x.node, y.node)
          SELECT node_a, node_b, common_neighbors FROM cn
          WHERE common_neighbors >= 2
            AND NOT EXISTS (SELECT 1 FROM e
                            WHERE e.id_a = cn.node_a AND e.id_b = cn.node_b)
          ORDER BY common_neighbors DESC, node_a, node_b""",
    "gr6_jaccard_links" ->
      s"""WITH $edgeCte,
          cn AS (SELECT x.node AS node_a, y.node AS node_b,
                   CAST(count(*) AS BIGINT) AS common_neighbors
                 FROM adj x JOIN adj y ON x.nbr = y.nbr AND x.node < y.node
                 GROUP BY x.node, y.node),
          miss AS (SELECT node_a, node_b, common_neighbors FROM cn
                   WHERE common_neighbors >= 2
                     AND NOT EXISTS (SELECT 1 FROM e
                       WHERE e.id_a = cn.node_a AND e.id_b = cn.node_b))
          SELECT m.node_a, m.node_b, m.common_neighbors,
            CAST(m.common_neighbors AS DOUBLE) /
              CAST(da.degree + db.degree - m.common_neighbors AS DOUBLE)
              AS jaccard
          FROM miss m
          JOIN deg da ON da.node = m.node_a
          JOIN deg db ON db.node = m.node_b
          ORDER BY jaccard DESC, node_a, node_b""",
    "gr4_pagerank" ->
      s"""WITH $edgeCte,
          ${pagerankCtes(None)}
          SELECT node, pagerank FROM r5
          ORDER BY pagerank DESC, node""",
    "gr8_personalized_pr" ->
      s"""WITH $edgeCte,
          ${pagerankCtes(Some(c => s"$c < 50"))}
          SELECT node, pagerank FROM r5
          ORDER BY pagerank DESC, node""",
    // tri CTE mirrors gr2 (closed oriented wedges on the canonical edge
    // list); cc is one double division of exact integers — bit-identical.
    "gr5_clustering_coeff" ->
      s"""WITH $edgeCte,
          tri AS (SELECT e1.id_a AS a, e1.id_b AS b, e2.id_b AS c
                  FROM e e1
                  JOIN e e2 ON e2.id_a = e1.id_b
                  JOIN e e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b),
          tc AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
                 FROM (SELECT unnest([a, b, c]) AS node FROM tri)
                 GROUP BY node)
          SELECT d.node, d.degree,
            COALESCE(tc.n_triangles, 0) AS n_triangles,
            CAST(2 AS DOUBLE) * COALESCE(tc.n_triangles, 0) /
              (d.degree * (d.degree - 1)) AS clustering_coeff
          FROM deg d LEFT JOIN tc ON tc.node = d.node
          WHERE d.degree >= 2
          ORDER BY clustering_coeff DESC, d.node""",
    // same shape as Graph.bipartiteProjection: distinct links → basket
    // cap → within-group self-join → pair counts.
    "gr9_copurchase" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item
               FROM lineitem),
          sz AS (SELECT g FROM li GROUP BY g HAVING count(*) <= 6),
          b AS (SELECT li.g, li.item FROM li JOIN sz USING (g)),
          pr AS (SELECT x.item AS part_a, y.item AS part_b
                 FROM b x JOIN b y ON y.g = x.g AND x.item < y.item)
          SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS weight
          FROM pr GROUP BY part_a, part_b HAVING count(*) >= 2
          ORDER BY weight DESC, part_a, part_b""",
    // hop-by-hop expansion; UNION (not UNION ALL) dedups the reach set,
    // mirroring the Spark side's distinct + left_anti accumulation.
    "gr7_khop" ->
      s"""WITH $edgeCte,
          h2 AS (SELECT DISTINCT a.node, b.nbr FROM adj a
                 JOIN adj b ON b.node = a.nbr WHERE b.nbr <> a.node),
          h3 AS (SELECT DISTINCT a.node, b.nbr FROM h2 a
                 JOIN adj b ON b.node = a.nbr WHERE b.nbr <> a.node),
          reach AS (SELECT node, nbr FROM adj
                    UNION SELECT node, nbr FROM h2
                    UNION SELECT node, nbr FROM h3)
          SELECT node, CAST(count(*) AS BIGINT) AS n_reachable
          FROM reach GROUP BY node ORDER BY node"""
  )
}
