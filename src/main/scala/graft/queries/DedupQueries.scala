package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Deduplication over the documents table: exact, MinHash-LSH, SimHash,
  * char-n-gram Jaccard, and embedding-cosine near-dup. The LSH variants
  * are the 100 TB path (shuffle on band/bucket keys only); the blocked
  * exact variants double as their verification oracles at test scale.
  *
  * Queries using xxhash64-derived signatures have no DuckDB oracle (hash
  * family is engine-specific) — those compare against SignatureTruth's
  * independently recomputed ground truth (with the pair pipelines
  * re-derived by DuckDB itself where the math is exact) and
  * invariant tests in DedupSpec (identical texts → identical signatures;
  * the known near-dup pairs in the fixtures are found).
  */
object DedupQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    // Exact dedup with auditable keep-rule (canonical = min doc_id).
    "dd1_exact_dedup" -> ((s, d) =>
      Dedup.exactDedupKeep(Tables.documents(s, d), col("text"), col("doc_id"))
        .select("doc_id", "canonical_id", "is_kept")
        .orderBy("doc_id")),

    // MinHash signatures (32 hashes over 3-word shingles) — first two
    // signature components value-checked against SignatureTruth.
    "dd2_minhash_signature" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          Dedup.minhashSignature(
            array_distinct(Dedup.wordShingles(
              TextAnalysis.tokens(col("text")), 3)), 32).as("sig"))
        .select(col("doc_id"),
          element_at(col("sig"), 1).as("mh_0"),
          element_at(col("sig"), 2).as("mh_1"))
        .orderBy("doc_id")),

    // The crawl-admission flagship: every ingest gate composed into one
    // per-doc decision record over the %5 batch/corpus split — bloom
    // exact gate (prefix-64 key), LSH near-dup probe, Gopher quality.
    // Duplicate-SPAN records (Lee et al. 2022): every position whose
    // 5-gram recurs anywhere in the corpus, merged to maximal per-doc
    // token spans — the cut-the-passage-out granularity doc/chunk
    // dedup can't express. Exact integers, hash-exact.
    "dd26_dup_spans" -> ((s, d) =>
      Dedup.duplicateSpans(
        Tables.documents(s, d), col("doc_id"), col("text"), k = 5)
        .orderBy("doc_id", "span_start")),

    "dd25_ingest_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.ingestPipeline(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0),
        col("doc_id"), col("text"),
        bloomKey = substring(col("text"), 1, 64), expectedItems = 1000L)
        .orderBy("incoming_id")
    }),

    // Multi-signal dedup agreement: do the cheap signals (exact text,
    // prefix fingerprint) recover what the expensive ones (trigram
    // Jaccard, containment) find? The methodology table read before
    // committing to one signal at corpus scale. Signals reuse the exact
    // dd5/dd15 configurations so their oracles share CTE text.
    "dd23_signal_agreement" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.signalAgreement(Seq(
        "exact_text" -> Dedup.keyEqualityPairs(
          docs, col("doc_id"), col("text")),
        "prefix64" -> Dedup.keyEqualityPairs(
          docs, col("doc_id"), substring(col("text"), 1, 64)),
        "trigram_j06" -> Dedup.ngramJaccardPairs(
          docs, col("doc_id"), col("text"), col("source"),
          n = 3, threshold = 0.6).select("id_a", "id_b"),
        "containment_c08" -> Dedup.containmentPairs(
          docs, col("doc_id"), col("text"), n = 3, threshold = 0.8)
          .select("id_a", "id_b")))
        .orderBy("sig_a", "sig_b")
    }),

    // The SCALE-PATH signal-agreement composition (round 17 — dd23's
    // timed dual): the same agreement matrix, composed over the
    // bucketed/bounded signals a 100 TB pipeline would actually compare
    // — exact text + prefix64 (md5-keyed equi-joins), MinHash-LSH (dd3's
    // exact configuration), SimHash chunk-buckets (dd8's) — instead of
    // dd23's quadratic dd5/dd15 truth generators. Every input shuffles
    // on keys (digest / (band,key) / chunk), never n², so THIS form is
    // the one in the timed llm suite; dd23 stays the methodology audit
    // against exact truth, bench-excluded with its generators.
    "dd27_lsh_signal_agreement" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.signalAgreement(Seq(
        "exact_text" -> Dedup.keyEqualityPairs(
          docs, col("doc_id"), col("text")),
        "prefix64" -> Dedup.keyEqualityPairs(
          docs, col("doc_id"), substring(col("text"), 1, 64)),
        "minhash_j05" -> Dedup.minhashNearDupPairs(
          docs, col("doc_id"), col("text"),
          shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5)
          .select("id_a", "id_b"),
        "simhash_h3" -> Dedup.simhashNearDupPairs(
          docs, col("doc_id"), col("text"), maxHamming = 3)
          .select("id_a", "id_b")))
        .orderBy("sig_a", "sig_b")
    }),

    // Bloom-filter exact-dup ingest pre-gate: same batch/corpus split as
    // dd21; the dedup key is a leading-64-char prefix fingerprint (the
    // boilerplate-heavy-page heuristic — full-text md5 is the other
    // common choice, but the fixtures have no cross-split full-text dups
    // at sf0.01, which would make the oracle vacuous). The Bloom probe is
    // scan-local on the batch, exact verification kills its false
    // positives, so the emitted verdict is exact and SQL-expressible.
    "dd22_bloom_ingest_gate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.bloomIngestGate(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0),
        col("doc_id"), substring(col("text"), 1, 64),
        expectedItems = 1000L)
        .orderBy("incoming_id")
    }),

    // Incremental ingestion dedup: docs with doc_id % 5 == 0 play the
    // incoming crawl batch, the rest the existing corpus; the band join
    // is ASYMMETRIC (batch probes corpus), so per-ingest work scales
    // with the batch — the continuous-crawl gate dd3's whole-corpus
    // self-join cannot serve. Value-checked: DuckDB recomputes the
    // asymmetric band join + argmax from SignatureTruth bands; DedupSpec
    // pins planted matches, best-match argmax, and the tie-break.
    "dd21_incremental_ingest" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.incrementalNearDups(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0),
        col("doc_id"), col("text"),
        shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5)
        .orderBy("incoming_id")
    }),

    // Full MinHash-LSH near-dup pipeline: bands → candidates → exact
    // Jaccard ≥ 0.5 verification. May legitimately be empty at tiny SF.
    "dd3_minhash_dup_pairs" -> ((s, d) =>
      Dedup.minhashNearDupPairs(
        Tables.documents(s, d), col("doc_id"), col("text"),
        shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5)
        .orderBy("id_a", "id_b")),

    // SimHash (64-bit) + first 16-bit chunk (the candidate bucket key).
    "dd4_simhash" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          Dedup.simhash64(TextAnalysis.tokens(col("text"))).as("simhash"))
        .withColumn("chunk0",
          element_at(Dedup.simhashChunks(col("simhash")), 1))
        .orderBy("doc_id")),

    // Char-trigram Jaccard near-dups inside same-source blocks — exact
    // pairwise, oracle-checked (list comprehensions on both engines).
    "dd5_ngram_neardup_pairs" -> ((s, d) =>
      Dedup.ngramJaccardPairs(
        Tables.documents(s, d), col("doc_id"), col("text"), col("source"),
        n = 3, threshold = 0.6)
        .orderBy("id_a", "id_b")),

    // Duplicate-CLUSTER resolution: connected components over the dd5
    // near-dup pair set (min-label propagation), cluster id = component's
    // min doc id, kept = the canonical survivor. Oracle: DuckDB recursive
    // CTE over the same edge SQL.
    "dd10_dup_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val edges = Dedup.ngramJaccardPairs(
        docs, col("doc_id"), col("text"), col("source"),
        n = 3, threshold = 0.6)
      Dedup.connectedComponents(docs, col("doc_id"), edges, "id_a", "id_b")
        .select(col("cc_id").as("doc_id"), col("cluster_id"),
          (col("cc_id") === col("cluster_id")).cast("int").as("kept"))
        .orderBy("doc_id")
    }),

    // SimHash near-dup pairs: chunk-bucket candidates + exact Hamming
    // verify (lossless for Hamming ≤ 3 by pigeonhole). May be empty at
    // tiny SF. Value-checked: DuckDB recomputes the pairs from
    // SignatureTruth's simhash values via bit_count/xor.
    "dd8_simhash_pairs" -> ((s, d) =>
      Dedup.simhashNearDupPairs(
        Tables.documents(s, d), col("doc_id"), col("text"), maxHamming = 3)
        .orderBy("id_a", "id_b")),

    // GLOBAL exact similarity join (no blocking) via PPJoin-style prefix
    // filtering — lossless; must equal the brute-force pair set.
    "dd7_jaccard_simjoin" -> ((s, d) =>
      Dedup.jaccardSimilarityJoin(
        Tables.documents(s, d), col("doc_id"), col("text"),
        n = 3, threshold = 0.6)
        .orderBy("id_a", "id_b")),

    // Embedding-cosine near-duplicates above 0.4 — EXACT brute-force
    // baseline (bounded all-pairs); dd9 is the bucketed scale path.
    "dd6_embedding_neardup" -> ((s, d) =>
      graft.ops.Similarity.bruteForceNearDupPairs(
        Tables.embeddings(s, d), "vec_id", "embedding", 0.4)
        .orderBy("id_a", "id_b")),

    // Eval-set decontamination: training docs sharing any word 3-gram
    // with the held-out slice (doc_id % 50 == 0 stands in for an eval
    // set), with the distinct shared-gram count. Shuffles on the gram
    // key only — the at-scale train/test-overlap audit shape
    // (production n is 8–13; fixture word salad only collides at n=3).
    "dd11_decontamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.decontaminate(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        col("doc_id"), col("text"), n = 3)
        .orderBy("doc_id")
    }),

    // Graded contamination: fraction of each training doc's distinct
    // 8-grams found in the eval corpus + threshold verdict (the
    // GPT-3/PaLM metric; dd11 is the boolean any-overlap form).
    "dd17_contamination_report" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.contaminationReport(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        col("doc_id"), col("text"), n = 8, threshold = 0.1)
        .orderBy("doc_id")
    }),

    // Source-vs-source overlap matrix: exact Jaccard + both directed
    // containments over each source's distinct word-3-gram SET — the
    // corpus-level "how much of A is already in B" audit (dd11 grades
    // docs; this grades whole sources). Gram-keyed self-join, never
    // pairwise across docs; zero-overlap pairs still reported.
    "dd18_source_overlap" -> ((s, d) =>
      Dedup.sourceOverlapMatrix(
        Tables.documents(s, d), col("source"), col("text"), n = 3)
        .orderBy("src_a", "src_b")),

    // Theta-sketch approximate source overlap — the 100 TB path for
    // dd18: per-source gram sets collapse to fixed-size mergeable
    // sketches map-side (no pre-distinct; the sketch dedups), then
    // |sources|² sketch intersections. Estimates are engine-specific, so
    // the catalog entry is the ε-bounds AUDIT (ss14 recall-audit
    // pattern): exact pair matrix + per-estimate 4σ verdicts at the
    // default 2^12-entry size — the oracle recomputes the exact columns
    // and asserts every verdict TRUE. The raw sketch path stays in
    // Dedup.thetaSourceOverlap (DedupSpec pins it at both SF regimes).
    "dd20_theta_overlap" -> ((s, d) =>
      Dedup.thetaOverlapAudit(
        Tables.documents(s, d), col("source"), col("text"), n = 3)
        .orderBy("src_a", "src_b")),

    // Survivor election on dd10's clusters: keep the longest doc per
    // near-dup cluster (n_chars as the audit-friendly quality proxy,
    // ties to smallest id); every doc carries its redirect target —
    // the step between "LSH found clusters" and "write the deduped
    // corpus". Cluster-keyed window + broadcast rep join.
    "dd19_cluster_reps" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val edges = Dedup.ngramJaccardPairs(
        docs, col("doc_id"), col("text"), col("source"),
        n = 3, threshold = 0.6)
      val cc = Dedup
        .connectedComponents(docs, col("doc_id"), edges, "id_a", "id_b")
      val members = cc.select(col("cc_id").as("doc_id"), col("cluster_id"))
        .join(docs.select("doc_id", "n_chars"), "doc_id")
      Dedup.electRepresentatives(members, "doc_id", "cluster_id",
        col("n_chars"))
        .orderBy("doc_id")
    }),

    // Embedding-cosine near-duplicates via SRP-LSH buckets + exact-cosine
    // verify — the 100 TB path (shuffles on (table, sig) keys, never n²).
    // Fixture embeddings are uniform random (max pairwise cos ≈ 0.5), so
    // the threshold sits at 0.4 like dd6; (tables=32, bits=4) puts
    // per-pair miss probability ≈ 4e-3 at the boundary. Rows-only (bucket
    // recall is ours); SimilaritySpec asserts exact precision + recall
    // vs the brute-force baseline.
    "dd9_srp_neardup_pairs" -> ((s, d) =>
      graft.ops.Similarity.srpNearDupPairs(
        Tables.embeddings(s, d), "vec_id", "embedding", 0.4,
        tables = 32, bits = 4, dim = 64)
        .orderBy("id_a", "id_b")),

    // Repeated-passage detection (chunk-level exact-substring dedup, Lee
    // et al. 2022): non-overlapping 16-token windows, corpus-wide window
    // hash counts, per-doc repeated-window fraction. Shuffles key on the
    // 32-byte chunk hash and doc_id only.
    "dd12_repeated_chunks" -> ((s, d) =>
      Dedup.repeatedChunkStats(
        Tables.documents(s, d), col("doc_id"), col("text"), chunkSize = 16)
        .orderBy("doc_id")),

    // Fuzzy (typo-tolerant) entity matching: supplier-name pairs within
    // Levenshtein distance 1, candidates from symmetric-delete blocking
    // (an EQUI join on deletion-variant keys — linear blow-up, never a
    // pairwise scan). Lossless for dist ≤ 1, so the oracle can state the
    // naive theta join and match hash-exactly.
    "dd13_fuzzy_name_pairs" -> ((s, d) =>
      Dedup.editDistancePairs(
        Tables.supplier(s, d), col("s_suppkey"), col("s_name"))
        .orderBy("id_a", "id_b")),

    // SemDeDup (Abbas et al. 2023): cluster the embedding space, drop
    // every vector with a lower-id cluster-mate at cosine >= 0.35.
    // Pairwise cost is Σ cluster², never n² — see
    // Similarity.semanticDedup. Fully deterministic -> oracle-exact.
    "dd14_semantic_dedup" -> ((s, d) =>
      graft.ops.Similarity.semanticDedup(
        Tables.embeddings(s, d), "vec_id", "embedding",
        threshold = 0.35, numCentroids = 16)
        .orderBy("vec_id")),

    // Containment similarity join: overlap ≥ 80% of the smaller doc's
    // distinct word trigrams — the asymmetric quote/subset-dup detector
    // (a doc quoted inside a longer one scores ~1 here, low on Jaccard).
    "dd15_containment_pairs" -> ((s, d) =>
      Dedup.containmentPairs(
        Tables.documents(s, d), col("doc_id"), col("text"),
        n = 3, threshold = 0.8)
        .orderBy("id_a", "id_b")),

    // Sorted-neighborhood (merge/purge): two-phase global sort by the
    // normalized text prefix, window-5 successor comparison — n·w cost,
    // no buckets, no n².
    "dd16_sorted_neighborhood" -> ((s, d) =>
      Dedup.sortedNeighborhoodPairs(
        Tables.documents(s, d), col("doc_id"), col("text"),
        substring(regexp_replace(lower(col("text")), "[^a-z0-9]", ""),
          1, 12),
        window = 5, n = 3, threshold = 0.5)
        .orderBy("id_a", "id_b")),

    // The 100 TB sorted-neighborhood path (round-19 payload-slimming
    // win, 1.37-1.39x at x1/x10/x30): same candidate stage as dd16,
    // verification over sorted xxhash64 gram LONGS instead of gram
    // strings. Audited against dd16's INDEPENDENT DuckDB string-gram
    // dual: the outputs are pair-set + jaccard bit-equal unless two
    // distinct grams in one pair's union collide in 64 bits (~1e-14
    // per pair) - the oracle audits RESULTS, not hash internals, and a
    // collision fails the row loudly (correct behavior).
    "dd28_sorted_neighborhood_hashed" -> ((s, d) =>
      Dedup.sortedNeighborhoodPairsHashed(
        Tables.documents(s, d), col("doc_id"), col("text"),
        substring(regexp_replace(lower(col("text")), "[^a-z0-9]", ""),
          1, 12),
        window = 5, n = 3, threshold = 0.5)
        .orderBy("id_a", "id_b"))
  )

  private def cosSql(a: String, b: String): String =
    s"""list_sum([CAST($a[i] AS DOUBLE)*CAST($b[i] AS DOUBLE) for i in range(1,65)]) /
        (sqrt(list_sum([CAST($a[i] AS DOUBLE)*CAST($a[i] AS DOUBLE) for i in range(1,65)])) *
         sqrt(list_sum([CAST($b[i] AS DOUBLE)*CAST($b[i] AS DOUBLE) for i in range(1,65)])))"""

  // The engine-seeded hash queries compare against SignatureTruth's
  // ground-truth tables (independent scalar recomputation written by
  // graft.Verify each run). Where the math is exact in SQL, DuckDB
  // recomputes the PIPELINE itself from the per-doc primitives — band
  // collisions + set-Jaccard verification (dd3/dd21), Hamming pairs via
  // bit_count/xor (dd8) — so the distributed join/dedup/argmax machinery
  // is value-checked, not just the hash values.
  private val truth = graft.ops.SignatureTruth.defaultDir
  private val jaccardSql =
    """CAST(len(list_intersect(da.shingles, db.shingles)) AS DOUBLE) /
       CAST(len(da.shingles) + len(db.shingles)
            - len(list_intersect(da.shingles, db.shingles)) AS DOUBLE)"""

  /** Trigram-Jaccard duplicate-pair CTE chain (`tj(id_a, id_b, jaccard)`),
    * shared by the dd7/dd10/dd19/dd23/pl22/pl28 duals.
    *
    * Exploded-gram equi-join form: distinct per-doc trigrams are unnested
    * and pairs meet on a gram equi-join, so shared counts come from one
    * hash join + group-by (the dd18 dual's shape, and the engine's own) —
    * NOT the all-pairs `list_intersect` the r10 sweep used, which is
    * quadratic in docs-per-block and was why these six duals hit the
    * sf0.1 150 s DuckDB cap while every equi-join dual passed.
    * Equivalent output: a pair with zero shared grams has no `tj` row,
    * and no such pair can reach any positive Jaccard threshold; the
    * Jaccard itself is the same exact-integer division
    * shared/(|A|+|B|-shared) in DOUBLE.
    * `perSource` restricts pairs to equal `source` (the dd10-family
    * blocking); `MATERIALIZED` keeps DuckDB from inlining the gram
    * explosion into both join sides. */
  private[queries] def trigramJaccardCtes(perSource: Boolean): String = {
    val srcCol = if (perSource) ", source" else ""
    val srcPred = if (perSource) "a.source = b.source AND " else ""
    s"""tj_t AS MATERIALIZED (SELECT doc_id$srcCol,
          list_distinct([substr(lower(text), i, 3)
                         for i in range(1, greatest(length(lower(text)) - 2, 1) + 1)]) AS grams
        FROM documents),
        tj_sz AS MATERIALIZED (SELECT doc_id,
          CAST(len(grams) AS BIGINT) AS n FROM tj_t),
        tj_g AS MATERIALIZED (SELECT doc_id$srcCol, unnest(grams) AS gram
          FROM tj_t),
        tj_sh AS MATERIALIZED (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(count(*) AS BIGINT) AS shared
          FROM tj_g a JOIN tj_g b
            ON ${srcPred}a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        tj AS MATERIALIZED (SELECT id_a, id_b,
            CAST(shared AS DOUBLE) / (sa.n + sb.n - shared) AS jaccard
          FROM tj_sh
          JOIN tj_sz sa ON sa.doc_id = tj_sh.id_a
          JOIN tj_sz sb ON sb.doc_id = tj_sh.id_b)"""
  }

  /** Connected components over an `(id_a, id_b)` edge CTE as BOUNDED
    * min-label rounds with pointer-jumping, yielding
    * `cl(doc_id, cluster_id)` where cluster_id = min doc_id of the
    * component (every document, singletons included).
    *
    * Replaces the recursive `reach` transitive-closure CTE of the r10
    * duals: that closure materializes one row per (node, reachable node)
    * — Σ cluster_size² state — and was one of the two reasons the
    * dd10-family duals hit the sf0.1 DuckDB cost cap (gr11's unrolled
    * MATERIALIZED-rounds pattern). Each round propagates labels one hop
    * (min over self ∪ neighbors) then shortcuts every label through its
    * own current label, so covered distance better-than-doubles per
    * round: `rounds`=5 converges for any component diameter ≤ ~31 —
    * far past any near-dup cluster in the corpus, and a non-converged
    * round count cannot pass silently (the strict hash gate compares
    * every cluster_id against the engine's true fixpoint CC). */
  private[queries] def minLabelClusterCtes(edges: String, rounds: Int = 5): String = {
    val iters = (1 to rounds).map { i =>
      s"""cc_p$i AS MATERIALIZED (
            SELECT id, min(lbl) AS lbl FROM (
              SELECT id, lbl FROM cc_l${i - 1}
              UNION ALL
              SELECT ue.b AS id, l.lbl FROM cc_l${i - 1} l JOIN ue ON ue.a = l.id)
            GROUP BY id),
          cc_l$i AS MATERIALIZED (
            SELECT x.id, y.lbl AS lbl FROM cc_p$i x JOIN cc_p$i y ON y.id = x.lbl)"""
    }.mkString(",\n")
    s"""ue AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM $edges
          UNION ALL SELECT id_b, id_a FROM $edges),
        cc_l0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS lbl FROM documents),
        $iters,
        cl AS MATERIALIZED (SELECT id AS doc_id, CAST(lbl AS BIGINT) AS cluster_id
          FROM cc_l$rounds)"""
  }

  val oracle: Map[String, String] = Map(
    // dd25: the three gates' proven duals composed — dd22's EXISTS,
    // dd21's band-probe CTE over the truth primitives, ta16's rule CASE.
    // same positional 5-gram inversion + interval union; lateral range
    // bounds mirror sequence(1, greatest(len-4, 0)); BIGINT casts
    // throughout (sum-window → decimal trap rule)
    "dd26_dup_spans" ->
      """WITH t AS (SELECT doc_id,
            regexp_split_to_array(lower(text), '\s+') AS toks
          FROM documents),
         p AS (SELECT doc_id, toks,
            CAST(unnest(range(1, greatest(len(toks) - 3, 1))) AS BIGINT)
              AS pos
          FROM t),
         g AS (SELECT doc_id, pos,
            array_to_string(toks[pos:pos+4], ' ') AS gram FROM p),
         d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
         m AS (SELECT g.doc_id, g.pos AS s, g.pos + 4 AS e
          FROM g JOIN d USING (gram)),
         f AS (SELECT *, max(e) OVER (PARTITION BY doc_id ORDER BY s, e
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
          FROM m),
         fl AS (SELECT *, CASE WHEN pmax IS NULL OR s > pmax + 1
            THEN 1 ELSE 0 END AS nf FROM f),
         sp AS (SELECT *, sum(nf) OVER (PARTITION BY doc_id
            ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS sid FROM fl)
         SELECT doc_id, CAST(sid AS BIGINT) AS span_id,
           CAST(min(s) AS BIGINT) AS span_start,
           CAST(max(e) AS BIGINT) AS span_end,
           CAST(max(e) - min(s) + 1 AS BIGINT) AS span_tokens
         FROM sp GROUP BY doc_id, sid ORDER BY doc_id, span_start""",
    "dd25_ingest_pipeline" ->
      s"""WITH b AS (SELECT * FROM read_parquet('$truth/bands.parquet/*.parquet')),
            d AS (SELECT doc_id, shingles
                  FROM read_parquet('$truth/docs.parquet/*.parquet')),
            cand AS (SELECT DISTINCT i.doc_id AS id_a, e.doc_id AS id_b
                     FROM b i JOIN b e ON i.key = e.key
                     WHERE i.doc_id % 5 = 0 AND e.doc_id % 5 <> 0),
            v AS (SELECT id_a, id_b, $jaccardSql AS jaccard
                  FROM cand JOIN d da ON cand.id_a = da.doc_id
                            JOIN d db ON cand.id_b = db.doc_id),
            nd AS (SELECT DISTINCT id_a FROM v WHERE jaccard >= 0.5),
            t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
                  FROM documents WHERE doc_id % 5 = 0),
            m AS (SELECT doc_id,
                CAST(len(toks) AS INT) AS n_words,
                CAST(length(text) - (len(toks) - 1) AS DOUBLE)
                  / CAST(len(toks) AS DOUBLE) AS mean_word_len,
                CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
                  AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS symbol_ratio,
                CAST(len(list_filter(toks,
                  x -> regexp_full_match(x, '[a-z]+')))
                  AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS alpha_frac,
                CAST(len(list_filter(
                  ['the','be','to','of','and','that','have','with'],
                  w -> list_contains(toks, w))) AS INT) AS stopword_hits
              FROM t),
            g AS (SELECT doc_id,
                ((n_words >= 20 AND n_words <= 100000)
                 AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
                 AND (symbol_ratio <= 0.1) AND (alpha_frac >= 0.8)
                 AND (stopword_hits >= 2)) AS gopher_pass
              FROM m),
            ex AS (SELECT i.doc_id,
                EXISTS (SELECT 1 FROM documents e
                        WHERE e.doc_id % 5 <> 0
                          AND substr(e.text, 1, 64) = substr(i.text, 1, 64))
                  AS exact_dup
              FROM documents i WHERE i.doc_id % 5 = 0)
          SELECT g.doc_id AS incoming_id, ex.exact_dup,
            (nd.id_a IS NOT NULL) AS near_dup, g.gopher_pass,
            (NOT ex.exact_dup AND nd.id_a IS NULL AND g.gopher_pass)
              AS admitted
          FROM g JOIN ex ON ex.doc_id = g.doc_id
            LEFT JOIN nd ON nd.id_a = g.doc_id
          ORDER BY incoming_id""",
    // dd23: all four pair sets recomputed outright (the trigram chain is
    // the shared dd5-configuration CTE, the containment CTEs the dd15
    // dual verbatim), then the same sizes / overlap /
    // cross-join-preserved zero pairs.
    "dd23_signal_agreement" ->
      s"""WITH ${trigramJaccardCtes(perSource = true)},
         ex AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM documents a JOIN documents b
             ON a.text = b.text AND a.doc_id < b.doc_id),
         px AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM documents a JOIN documents b
             ON substr(a.text, 1, 64) = substr(b.text, 1, 64)
                AND a.doc_id < b.doc_id),
         tg AS (SELECT id_a, id_b FROM tj WHERE jaccard >= 0.6),
         ct0 AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
         ctg AS (SELECT doc_id, unnest(list_distinct(
             [array_to_string(w[i:i+2], ' ')
              for i in range(1, len(w) - 1)])) AS gram
           FROM ct0),
         ctc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ctg
           GROUP BY doc_id),
         ctsh AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(count(*) AS BIGINT) AS shared
           FROM ctg a JOIN ctg b ON a.gram = b.gram AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         ct AS (SELECT id_a, id_b FROM ctsh
           JOIN ctc ca ON ca.doc_id = ctsh.id_a
           JOIN ctc cb ON cb.doc_id = ctsh.id_b
           WHERE CAST(shared AS DOUBLE) / CAST(least(ca.n, cb.n) AS DOUBLE)
             >= 0.8),
         all_p AS (
           SELECT 'exact_text' AS sig, id_a, id_b FROM ex
           UNION ALL SELECT 'prefix64', id_a, id_b FROM px
           UNION ALL SELECT 'trigram_j06', id_a, id_b FROM tg
           UNION ALL SELECT 'containment_c08', id_a, id_b FROM ct),
         sz AS (SELECT sig, CAST(count(*) AS BIGINT) AS n FROM all_p
           GROUP BY sig),
         nm(sig) AS (VALUES ('exact_text'), ('prefix64'),
           ('trigram_j06'), ('containment_c08')),
         com AS (SELECT x.sig AS sig_a, y.sig AS sig_b,
             CAST(count(*) AS BIGINT) AS n_common
           FROM all_p x JOIN all_p y
             ON x.id_a = y.id_a AND x.id_b = y.id_b AND x.sig < y.sig
           GROUP BY 1, 2),
         pr AS (SELECT a.sig AS sig_a, b.sig AS sig_b
           FROM nm a JOIN nm b ON a.sig < b.sig)
         SELECT pr.sig_a AS sig_a, pr.sig_b AS sig_b,
           COALESCE(sa.n, 0) AS n_a, COALESCE(sb.n, 0) AS n_b,
           COALESCE(com.n_common, 0) AS n_common,
           CASE WHEN COALESCE(sa.n, 0) + COALESCE(sb.n, 0)
                     - COALESCE(com.n_common, 0) = 0 THEN NULL
                ELSE CAST(COALESCE(com.n_common, 0) AS DOUBLE) /
                  (COALESCE(sa.n, 0) + COALESCE(sb.n, 0)
                   - COALESCE(com.n_common, 0)) END AS jaccard
         FROM pr LEFT JOIN com
             ON com.sig_a = pr.sig_a AND com.sig_b = pr.sig_b
           LEFT JOIN sz sa ON sa.sig = pr.sig_a
           LEFT JOIN sz sb ON sb.sig = pr.sig_b
         ORDER BY sig_a, sig_b""",
    // dd27: the scale-path agreement dual — exact/prefix pair sets
    // recomputed outright (as in dd23), the MinHash set from the truth
    // bands + exact Jaccard (the dd3 dual verbatim), the SimHash set
    // from truth signatures via bit_count/xor (the dd8 dual verbatim),
    // then the identical sizes / overlap / zero-preserving cross join.
    "dd27_lsh_signal_agreement" ->
      s"""WITH ex AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM documents a JOIN documents b
             ON a.text = b.text AND a.doc_id < b.doc_id),
         px AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM documents a JOIN documents b
             ON substr(a.text, 1, 64) = substr(b.text, 1, 64)
                AND a.doc_id < b.doc_id),
         bb AS (SELECT * FROM read_parquet('$truth/bands.parquet/*.parquet')),
         dd AS (SELECT doc_id, shingles
                FROM read_parquet('$truth/docs.parquet/*.parquet')),
         cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                  FROM bb x JOIN bb y
                    ON x.band = y.band AND x.key = y.key
                       AND x.doc_id < y.doc_id),
         mh AS (SELECT id_a, id_b
           FROM cand JOIN dd da ON cand.id_a = da.doc_id
                     JOIN dd db ON cand.id_b = db.doc_id
           WHERE $jaccardSql >= 0.5),
         sd AS (SELECT doc_id, simhash
                FROM read_parquet('$truth/docs.parquet/*.parquet')),
         sh AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM sd a, sd b
           WHERE a.doc_id < b.doc_id
             AND bit_count(xor(a.simhash, b.simhash)) <= 3),
         all_p AS (
           SELECT 'exact_text' AS sig, id_a, id_b FROM ex
           UNION ALL SELECT 'prefix64', id_a, id_b FROM px
           UNION ALL SELECT 'minhash_j05', id_a, id_b FROM mh
           UNION ALL SELECT 'simhash_h3', id_a, id_b FROM sh),
         sz AS (SELECT sig, CAST(count(*) AS BIGINT) AS n FROM all_p
           GROUP BY sig),
         nm(sig) AS (VALUES ('exact_text'), ('prefix64'),
           ('minhash_j05'), ('simhash_h3')),
         com AS (SELECT x.sig AS sig_a, y.sig AS sig_b,
             CAST(count(*) AS BIGINT) AS n_common
           FROM all_p x JOIN all_p y
             ON x.id_a = y.id_a AND x.id_b = y.id_b AND x.sig < y.sig
           GROUP BY 1, 2),
         pr AS (SELECT a.sig AS sig_a, b.sig AS sig_b
           FROM nm a JOIN nm b ON a.sig < b.sig)
         SELECT pr.sig_a AS sig_a, pr.sig_b AS sig_b,
           COALESCE(sa.n, 0) AS n_a, COALESCE(sb.n, 0) AS n_b,
           COALESCE(com.n_common, 0) AS n_common,
           CASE WHEN COALESCE(sa.n, 0) + COALESCE(sb.n, 0)
                     - COALESCE(com.n_common, 0) = 0 THEN NULL
                ELSE CAST(COALESCE(com.n_common, 0) AS DOUBLE) /
                  (COALESCE(sa.n, 0) + COALESCE(sb.n, 0)
                   - COALESCE(com.n_common, 0)) END AS jaccard
         FROM pr LEFT JOIN com
             ON com.sig_a = pr.sig_a AND com.sig_b = pr.sig_b
           LEFT JOIN sz sa ON sa.sig = pr.sig_a
           LEFT JOIN sz sb ON sb.sig = pr.sig_b
         ORDER BY sig_a, sig_b""",
    // dd22's verdict is exact (Bloom false positives are killed by the
    // exact verification), so DuckDB recomputes it outright: same split,
    // same prefix key, same md5 digest.
    "dd22_bloom_ingest_gate" ->
      """SELECT i.doc_id AS incoming_id,
           md5(substr(i.text, 1, 64)) AS digest,
           EXISTS (SELECT 1 FROM documents e
                   WHERE e.doc_id % 5 <> 0
                     AND substr(e.text, 1, 64) = substr(i.text, 1, 64))
             AS is_dup
         FROM documents i
         WHERE i.doc_id % 5 = 0
         ORDER BY incoming_id""",
    "dd2_minhash_signature" ->
      s"""SELECT doc_id, mh_0, mh_1
          FROM read_parquet('$truth/docs.parquet/*.parquet')
          ORDER BY doc_id""",
    "dd3_minhash_dup_pairs" ->
      s"""WITH b AS (SELECT * FROM read_parquet('$truth/bands.parquet/*.parquet')),
            d AS (SELECT doc_id, shingles
                  FROM read_parquet('$truth/docs.parquet/*.parquet')),
            cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                     FROM b x JOIN b y
                       ON x.band = y.band AND x.key = y.key
                          AND x.doc_id < y.doc_id)
          SELECT id_a, id_b, $jaccardSql AS jaccard
          FROM cand JOIN d da ON cand.id_a = da.doc_id
                    JOIN d db ON cand.id_b = db.doc_id
          WHERE $jaccardSql >= 0.5
          ORDER BY id_a, id_b""",
    "dd4_simhash" ->
      s"""SELECT doc_id, simhash, chunk0
          FROM read_parquet('$truth/docs.parquet/*.parquet')
          ORDER BY doc_id""",
    "dd8_simhash_pairs" ->
      s"""WITH d AS (SELECT doc_id, simhash
                     FROM read_parquet('$truth/docs.parquet/*.parquet'))
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
          FROM d a, d b
          WHERE a.doc_id < b.doc_id
            AND bit_count(xor(a.simhash, b.simhash)) <= 3
          ORDER BY id_a, id_b""",
    "dd9_srp_neardup_pairs" ->
      s"""SELECT id_a, id_b
          FROM read_parquet('$truth/srp_pairs.parquet/*.parquet')
          ORDER BY id_a, id_b""",
    "dd21_incremental_ingest" ->
      s"""WITH b AS (SELECT * FROM read_parquet('$truth/bands.parquet/*.parquet')),
            d AS (SELECT doc_id, shingles
                  FROM read_parquet('$truth/docs.parquet/*.parquet')),
            cand AS (SELECT DISTINCT i.doc_id AS id_a, e.doc_id AS id_b
                     FROM b i JOIN b e ON i.key = e.key
                     WHERE i.doc_id % 5 = 0 AND e.doc_id % 5 <> 0),
            v AS (SELECT id_a, id_b, $jaccardSql AS jaccard
                  FROM cand JOIN d da ON cand.id_a = da.doc_id
                            JOIN d db ON cand.id_b = db.doc_id),
            f AS (SELECT * FROM v WHERE jaccard >= 0.5),
            ranked AS (SELECT id_a, id_b, jaccard,
                         row_number() OVER (PARTITION BY id_a
                           ORDER BY jaccard DESC, id_b ASC) AS rn,
                         count(*) OVER (PARTITION BY id_a) AS n_matches
                       FROM f)
          SELECT id_a AS incoming_id, id_b AS matched_id, jaccard, n_matches
          FROM ranked WHERE rn = 1 ORDER BY incoming_id""",
    "dd12_repeated_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM documents),
         c AS (SELECT doc_id,
           [md5(array_to_string(
              toks[(i*16)+1 : least((i*16)+16, len(toks))], ' '))
            for i in range(0, CAST(floor((len(toks) - 1) / 16) AS INT) + 1)]
             AS hs
           FROM t),
         u AS (SELECT doc_id, unnest(hs) AS h FROM c),
         g AS (SELECT h, count(*) AS n_occ FROM u GROUP BY h)
         SELECT u.doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(*) FILTER (WHERE g.n_occ > 1) AS BIGINT)
             AS n_dup_chunks,
           CAST(count(*) FILTER (WHERE g.n_occ > 1) AS DOUBLE) / count(*)
             AS dup_chunk_frac
         FROM u JOIN g ON u.h = g.h
         GROUP BY u.doc_id ORDER BY doc_id""",
    "dd11_decontamination" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         g AS (SELECT doc_id, unnest(list_distinct(
                 [array_to_string(w[i:i+2], ' ')
                  for i in range(1, len(w) - 1)])) AS gram
               FROM t),
         ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
         tr AS (SELECT doc_id, gram FROM g WHERE doc_id % 50 <> 0)
         SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS overlap_ngrams
         FROM tr JOIN ev USING (gram)
         GROUP BY tr.doc_id ORDER BY tr.doc_id""",
    "dd1_exact_dedup" ->
      """SELECT doc_id,
           min(doc_id) OVER (PARTITION BY text) AS canonical_id,
           doc_id = min(doc_id) OVER (PARTITION BY text) AS is_kept
         FROM documents ORDER BY doc_id""",
    // The naive theta join the deletion-variant blocking replaces —
    // identical pairs because the blocking is lossless at dist ≤ 1.
    "dd13_fuzzy_name_pairs" ->
      """SELECT a.s_suppkey AS id_a, a.s_name AS s_a,
           b.s_suppkey AS id_b, b.s_name AS s_b,
           CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
         FROM supplier a JOIN supplier b
           ON a.s_suppkey < b.s_suppkey
          AND levenshtein(a.s_name, b.s_name) <= 1
         ORDER BY id_a, id_b""",
    "dd5_ngram_neardup_pairs" ->
      """WITH t AS (SELECT doc_id, source,
            list_distinct([substr(lower(text), i, 3)
                           for i in range(1, greatest(length(lower(text)) - 2, 1) + 1)]) AS grams
          FROM documents),
          p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
            CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
              (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
              AS jaccard
          FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id)
          SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.6
          ORDER BY id_a, id_b""",
    // distinct (source, gram) sets → sizes + gram-keyed intersection,
    // zero-overlap pairs preserved by the sizes cross join.
    "dd18_source_overlap" ->
      """WITH toks AS (SELECT source, string_split(text, ' ') AS w
            FROM documents),
          g AS (SELECT DISTINCT source AS src, unnest(list_distinct(
              [array_to_string(w[i:i+2], ' ')
               for i in range(1, len(w) - 1)])) AS gram
            FROM toks),
          sz AS (SELECT src, CAST(count(*) AS BIGINT) AS sz
            FROM g GROUP BY src),
          it AS (SELECT a.src AS src_a, b.src AS src_b,
              CAST(count(*) AS BIGINT) AS shared
            FROM g a JOIN g b ON a.gram = b.gram AND a.src < b.src
            GROUP BY 1, 2)
          SELECT x.src AS src_a, y.src AS src_b, x.sz AS grams_a,
            y.sz AS grams_b, COALESCE(it.shared, 0) AS shared_grams,
            CAST(COALESCE(it.shared, 0) AS DOUBLE) /
              (x.sz + y.sz - COALESCE(it.shared, 0)) AS jaccard,
            CAST(COALESCE(it.shared, 0) AS DOUBLE) / x.sz AS frac_a_in_b,
            CAST(COALESCE(it.shared, 0) AS DOUBLE) / y.sz AS frac_b_in_a
          FROM sz x JOIN sz y ON x.src < y.src
          LEFT JOIN it ON it.src_a = x.src AND it.src_b = y.src
          ORDER BY src_a, src_b""",
    // dd20: dd18's exact matrix (same CTEs, minus the containments) plus
    // TRUE for each theta ε-bounds verdict — an estimate outside 4σ of
    // its exact counterpart hash-fails the row.
    "dd20_theta_overlap" ->
      """WITH toks AS (SELECT source, string_split(text, ' ') AS w
            FROM documents),
          g AS (SELECT DISTINCT source AS src, unnest(list_distinct(
              [array_to_string(w[i:i+2], ' ')
               for i in range(1, len(w) - 1)])) AS gram
            FROM toks),
          sz AS (SELECT src, CAST(count(*) AS BIGINT) AS sz
            FROM g GROUP BY src),
          it AS (SELECT a.src AS src_a, b.src AS src_b,
              CAST(count(*) AS BIGINT) AS shared
            FROM g a JOIN g b ON a.gram = b.gram AND a.src < b.src
            GROUP BY 1, 2)
          SELECT x.src AS src_a, y.src AS src_b, x.sz AS grams_a,
            y.sz AS grams_b, COALESCE(it.shared, 0) AS shared_grams,
            CAST(COALESCE(it.shared, 0) AS DOUBLE) /
              (x.sz + y.sz - COALESCE(it.shared, 0)) AS jaccard,
            TRUE AS ok_a, TRUE AS ok_b, TRUE AS ok_shared
          FROM sz x JOIN sz y ON x.src < y.src
          LEFT JOIN it ON it.src_a = x.src AND it.src_b = y.src
          ORDER BY src_a, src_b""",
    // dd10's cluster construction (shared trigram-pair + min-label-CC
    // CTEs), then per-cluster argmax on (n_chars DESC, doc_id ASC)
    // elects the representative.
    "dd19_cluster_reps" ->
      s"""WITH ${trigramJaccardCtes(perSource = true)},
          e AS MATERIALIZED (SELECT id_a, id_b FROM tj WHERE jaccard >= 0.6),
          ${minLabelClusterCtes("e")},
          q AS (SELECT cl.doc_id, cl.cluster_id, d.n_chars
            FROM cl JOIN documents d USING (doc_id)),
          rk AS (SELECT doc_id, cluster_id, row_number() OVER (
              PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id ASC)
              AS rn
            FROM q),
          rep AS (SELECT cluster_id, doc_id AS rep_id FROM rk WHERE rn = 1)
          SELECT q.doc_id, q.cluster_id, rep.rep_id,
            q.doc_id = rep.rep_id AS kept
          FROM q JOIN rep USING (cluster_id) ORDER BY q.doc_id""",
    "dd10_dup_clusters" ->
      s"""WITH ${trigramJaccardCtes(perSource = true)},
          e AS MATERIALIZED (SELECT id_a, id_b FROM tj WHERE jaccard >= 0.6),
          ${minLabelClusterCtes("e")}
          SELECT doc_id, cluster_id,
            CAST(doc_id = cluster_id AS INT) AS kept
          FROM cl ORDER BY doc_id""",
    "dd7_jaccard_simjoin" ->
      s"""WITH ${trigramJaccardCtes(perSource = false)}
          SELECT id_a, id_b, jaccard FROM tj WHERE jaccard >= 0.6
          ORDER BY id_a, id_b""",
    "dd6_embedding_neardup" ->
      s"""WITH p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            ${cosSql("a.embedding", "b.embedding")} AS cos
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
          SELECT id_a, id_b FROM p WHERE cos >= 0.4 ORDER BY id_a, id_b""",
    // same seed-centroid assignment CTE as ss4_ivf_topk; within-cluster
    // pairs only, keep-lowest-id rule stated directly
    "dd14_semantic_dedup" ->
      s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cvec
            FROM embeddings WHERE vec_id < 16),
          corp AS (SELECT vec_id, embedding AS vec FROM embeddings),
          ca AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
              ORDER BY ${cosSql("vec", "cvec")} DESC, cid ASC) AS rn
            FROM corp CROSS JOIN cent),
          assigned AS (SELECT vec_id, cid FROM ca WHERE rn = 1),
          pairs AS (SELECT a.vec_id AS id_hi,
              ${cosSql("va.vec", "vb.vec")} AS cos
            FROM assigned a JOIN assigned b
              ON a.cid = b.cid AND a.vec_id > b.vec_id
            JOIN corp va ON va.vec_id = a.vec_id
            JOIN corp vb ON vb.vec_id = b.vec_id),
          dropped AS (SELECT DISTINCT id_hi FROM pairs WHERE cos >= 0.35)
          SELECT a.vec_id, a.cid, (d.id_hi IS NULL) AS keep
          FROM assigned a LEFT JOIN dropped d ON d.id_hi = a.vec_id
          ORDER BY a.vec_id""",
    // same distinct-trigram inverted index as dd11; exact integer ratio
    "dd15_containment_pairs" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
             FROM documents),
         g AS (SELECT doc_id, unnest(list_distinct(
                 [array_to_string(w[i:i+2], ' ')
                  for i in range(1, len(w) - 1)])) AS gram
               FROM t),
         c AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM g
           GROUP BY doc_id),
         sh AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(count(*) AS BIGINT) AS shared
           FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b, shared,
           CAST(shared AS DOUBLE) / CAST(least(ca.n, cb.n) AS DOUBLE)
             AS containment
         FROM sh JOIN c ca ON ca.doc_id = sh.id_a
           JOIN c cb ON cb.doc_id = sh.id_b
         WHERE CAST(shared AS DOUBLE) / CAST(least(ca.n, cb.n) AS DOUBLE)
           >= 0.8
         ORDER BY id_a, id_b""",
    // empty-range rule mirrors wordNgrams' size<n → [] (docs under 8
    // tokens are absent from the report)
    "dd17_contamination_report" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
           FROM documents),
         g AS (SELECT doc_id, unnest(list_distinct(
             [array_to_string(w[i:i+7], ' ')
              for i in range(1, len(w) - 7 + 1)])) AS gram
           FROM toks),
         eg AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
         tg AS (SELECT doc_id, gram FROM g WHERE doc_id % 50 <> 0),
         tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
           FROM tg GROUP BY doc_id),
         ov AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS overlap_ngrams
           FROM tg t JOIN eg ON eg.gram = t.gram GROUP BY t.doc_id)
         SELECT tot.doc_id, n_grams,
           CAST(COALESCE(overlap_ngrams, 0) AS BIGINT) AS overlap_ngrams,
           CAST(COALESCE(overlap_ngrams, 0) AS DOUBLE)
             / CAST(n_grams AS DOUBLE) AS contamination,
           CAST(COALESCE(overlap_ngrams, 0) AS DOUBLE)
             / CAST(n_grams AS DOUBLE) >= 0.1 AS flagged
         FROM tot LEFT JOIN ov ON ov.doc_id = tot.doc_id
         ORDER BY tot.doc_id""",
    // row_number over (sort key, id) ≡ the Spark side's two-phase
    // globalPosition; neighbor pairs = position offset in [1, 4]; same
    // char-trigram Jaccard as dd5 (integer counts + one division)
    "dd16_sorted_neighborhood" -> sortedNeighborhoodSql,
    // dd28 reuses dd16's string-gram dual VERBATIM: the hashed form's
    // pair set and jaccards are bit-equal to the string form's (pinned
    // in DedupSpec), so the same independent oracle audits the shipped
    // scale path - a 64-bit gram collision (~1e-14/pair) would surface
    // as a loud hash mismatch on this row, exactly as it should.
    "dd28_sorted_neighborhood_hashed" -> sortedNeighborhoodSql
    // dd2/dd3/dd4/dd8/dd9/dd21: SignatureTruth oracles (head of this map).
  )

  private lazy val sortedNeighborhoodSql: String =
      """WITH t AS (SELECT doc_id,
             substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'),
               1, 12) AS k,
             list_distinct([substr(lower(text), i, 3)
               for i in range(1, greatest(length(lower(text)) - 2, 1) + 1)])
               AS grams
           FROM documents),
         p AS (SELECT doc_id, grams,
             row_number() OVER (ORDER BY k, doc_id) AS pos FROM t),
         c AS (SELECT a.doc_id AS ida, b.doc_id AS idb,
             CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
               (len(a.grams) + len(b.grams)
                - len(list_intersect(a.grams, b.grams))) AS jaccard
           FROM p a JOIN p b ON b.pos - a.pos BETWEEN 1 AND 4)
         SELECT least(ida, idb) AS id_a, greatest(ida, idb) AS id_b, jaccard
         FROM c WHERE jaccard >= 0.5
         ORDER BY id_a, id_b"""
}
