package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Similarity, TextAnalysis}
import graft.sources.Tables

/** Similarity search over the embeddings table (array<float>, 64-dim):
  * brute-force exact cosine top-k (baseline, oracle-checked) and
  * SRP-LSH bucketed ANN (the scale path, spec-checked for recall).
  *
  * Oracle outputs carry ranks, not raw cosines: ordering is stable as long
  * as cosine gaps exceed float noise (the fixture embeddings have no
  * duplicate vectors), while raw doubles could differ in the last ulp
  * between engines' fold orders.
  */
object SimilarityQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    // Exact top-5 neighbors for the first 20 vectors.
    "ss1_cosine_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", 5)
        .select("qid", "rank", "vec_id")
        .orderBy("qid", "rank")
    }),

    // Hybrid lexical+vector retrieval via reciprocal-rank fusion: the
    // ta10 BM25 top-20 (lexical channel) fused with the exact cosine
    // top-20 for query vector 0 (vector channel; documents and
    // embeddings align 1:1 on id in the fixtures). Rank arithmetic
    // only — both channels' ranks are oracle-reproducible, so the
    // fused list is hash-exact.
    "ss21_hybrid_rrf" -> ((s, d) => {
      val lexW = Window.orderBy(col("bm25").desc, col("doc_id").asc)
      val lex = TextAnalysis.bm25Search(
          Tables.documents(s, d), "doc_id", "text",
          terms = Seq("hash", "join", "spark", "dup"), topK = 20)
        .withColumn("lex_rank", row_number().over(lexW))
      val emb = Tables.embeddings(s, d)
      val vec = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") === 0), emb, "vec_id", "embedding", 20)
      Similarity.rrfFuse(lex, "doc_id", "lex_rank", vec, "vec_id", "rank",
          k = 60, topK = 20)
        .orderBy("fused_rank")
    }),

    // Hard-negative mining: top-3 nearest OTHER-label neighbors for the
    // same bounded anchor slice as ss1 — the contrastive-training
    // counterpart of knnClassify's vote.
    "ss16_hard_negatives" -> ((s, d) =>
      Similarity.hardNegatives(
        Tables.embeddings(s, d), "vec_id", "embedding", "label",
        col("vec_id") < 20, 3)
        .select("qid", "anchor_label", "rank", "neg_id", "neg_label")
        .orderBy("qid", "rank")),

    // Semantic eval-set decontamination: train docs whose embedding
    // lands within cosine 0.4 of any eval doc (vec_id % 50 == 0 stands
    // in for the eval set) — catches paraphrase leakage dd11's n-gram
    // gate misses. Eval side broadcasts; scoring is scan-local.
    "dd24_semantic_decontamination" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.semanticDecontamination(
        emb.filter(col("vec_id") % 50 =!= 0),
        emb.filter(col("vec_id") % 50 === 0),
        "vec_id", "embedding", threshold = 0.4)
        .orderBy("train_id")
    }),

    // MMR diversified top-5 from the top-10 candidates (λ=0.5) — the
    // diverse-example selector; re-rank stage composes with any ANN
    // candidate generator at corpus scale.
    "ss18_mmr_topk" -> ((s, d) =>
      Similarity.mmrTopK(
        Tables.embeddings(s, d).filter(col("vec_id") < 20),
        Tables.embeddings(s, d), "vec_id", "embedding",
        m = 10, k = 5, lambda = 0.5)
        .orderBy("qid", "sel_rank")),

    // Rocchio pseudo-relevance feedback: q' = ½q + ½·mean(top-5), then
    // re-rank — seed expansion for "find more docs like these".
    "ss19_rocchio_expand" -> ((s, d) =>
      Similarity.rocchioExpand(
        Tables.embeddings(s, d).filter(col("vec_id") < 20),
        Tables.embeddings(s, d), "vec_id", "embedding",
        kFb = 5, k = 5)
        .orderBy("qid", "rank")),

    // Label-conditional outlier audit: distance to own-label centroid,
    // top-5 farthest per label flagged — the noisy-sample detector run
    // before the labeled slice seeds weak labeling.
    "ss17_centroid_outliers" -> ((s, d) =>
      Similarity.centroidOutliers(
        Tables.embeddings(s, d), "vec_id", "embedding", "label", topN = 5)
        .orderBy("label", "rank")),

    // Matryoshka-style truncation quality: retained energy + cosine of
    // keeping the first 32 of 64 dims — the store-half-the-dims decision
    // input. Scan-local norm folds via the native VecDot expression.
    "ss7_truncation_quality" -> ((s, d) =>
      Similarity.truncationQuality(
        Tables.embeddings(s, d), col("vec_id"), col("embedding"), k = 32)
        .orderBy("vec_id")),

    // Pairwise-cosine distribution over a deterministic 100-vector slice
    // — the threshold-calibration input for every dedup/ANN cutoff (dd6's
    // 0.3, dd14's τ): you pick the threshold where the histogram's
    // near-dup mode separates from the background bulk. Brute-force ON
    // THE SLICE by design (4,950 pairs); the corpus-scale distribution
    // comes from sampling slices, never all-pairs.
    "ss9_cosine_histogram" -> ((s, d) => {
      val sample = Tables.embeddings(s, d).filter(col("vec_id") < 100)
      val a = sample.select(col("vec_id").as("ida"), col("embedding").as("va"))
      val b = sample.select(col("vec_id").as("idb"), col("embedding").as("vb"))
      a.join(b, col("ida") < col("idb"))
        .select((Similarity.dot(col("va"), col("vb")) /
          (Similarity.norm(col("va")) * Similarity.norm(col("vb"))))
          .as("cos"))
        .select(least(floor((col("cos") + 1.0) * 10.0).cast("int"), lit(19))
          .as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n_pairs"))
        .orderBy("bucket")
    }),

    // Johnson–Lindenstrauss ±1 random projection to 8 dims: first
    // projected coordinate + norm-preservation ratio per vector. The
    // sign matrix is driver-generated from a fixed seed and shared with
    // the oracle as literal constants (rpSigns — no cross-engine hash).
    "ss8_random_projection" -> ((s, d) =>
      Similarity.randomProjectionStats(
        Tables.embeddings(s, d), col("vec_id"), col("embedding"),
        k = 8, seed = 42L, dim = 64)
        .orderBy("vec_id")),

    // SRP-LSH ANN top-5 for the same queries (16 tables × 6 bits) —
    // value-checked against SignatureTruth; recall vs ss1 is gated in
    // SimilaritySpec.
    "ss2_srp_ann_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.annTopK(
        emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", 5,
        tables = 16, bits = 6, dim = 64)
        .select("qid", "rank", "vec_id")
        .orderBy("qid", "rank")
    }),

    // IVF ANN top-5: 16 fixed coarse centroids, 4 probed per query.
    // Fully deterministic (exact cosines, total tie-breaks) → oracle-
    // checked end-to-end, unlike the hash-family LSH path.
    // k-NN classification (k=5 cosine majority vote, ties to smallest
    // label) — weak-label propagation; vote stage composes unchanged
    // with any ANN neighbor generator.
    "ss12_knn_classify" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.knnClassify(
        emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding",
        "label", k = 5)
        .orderBy("qid")
    }),

    // Exact MIPS top-5 (max inner product — magnitude-aware retrieval):
    // ordered-fold dot products, total tie-break. The cosine-reduction
    // scale path (norm augmentation) is spec-asserted rank-identical.
    "ss11_mips_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.mipsTopK(
        emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", 5)
        .select("qid", "rank", "vec_id")
        .orderBy("qid", "rank")
    }),

    // Product-quantization ANN top-5 (L2/ADC): 8 subspaces × 16 codes —
    // 32× vector compression; codebooks are plan literals, encode+ADC
    // scan-local, only the per-query top-k window shuffles. Value-checked
    // against SignatureTruth's scalar replication of the full train/
    // encode/ADC pipeline (SimilaritySpec additionally bounds recall).
    "ss10_pq_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.pqTopK(
        emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", 5,
        dim = 64, m = 8, codebookSize = 16, updates = 1)
        .select("qid", "rank", "vec_id")
        .orderBy("qid", "rank")
    }),

    // IVF-PQ (IVFADC) ANN top-5 — the composed at-scale index: IVF
    // coarse cells prune WHICH lists a query reads (nprobe=4 of 8), PQ
    // residual codes compress WHAT they store (8×32, still 32× — the
    // code frame width is unchanged), ADC scores codes against
    // broadcast per-(query, cell) LUTs. Value-checked against
    // SignatureTruth's scalar replication of the full coarse/residual/
    // train/encode/probe/ADC pipeline (ss20.parquet); SimilaritySpec
    // additionally bounds recall vs the exact top-5.
    // OPERATING POINT (round 19, ADOPTED — IVFPQAB_PLANTED.json serve
    // sweep): the round-15 keep of (nprobe=2, m=8, cb=16) was priced
    // under the old bundled cost model that re-trained per query; on
    // SERVE cost alone (ivfPqTrain amortized once-per-corpus),
    // (nprobe=4, m=8, cb=32) buys recall_l2@20 0.835 → 0.934 on the
    // planted fixture for serve 0.660 → 1.162 s and train 1.94 → 3.20 s
    // — with the index width and 32× compression UNCHANGED (8 code
    // columns; only the once-per-corpus codebooks grow 16→32 entries).
    // The rejected alternatives: more nprobe at the old tree is capped
    // by quantizer error (np4 0.842, np8 DEGRADES to 0.813 — extra
    // cells inject ADC-noise candidates); (m=16, cb=16) reaches 0.948
    // but HALVES compression — the wrong 100 TB trade for +0.014.
    "ss20_ivfpq_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfPqTopK(
        emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", 5,
        dim = 64, numCoarse = 8, nprobe = 4, m = 8, codebookSize = 32,
        updates = 1)
        .orderBy("qid", "rank")
    }),

    // ANN recall audit: recall@5 of the SRP-LSH and IVF indexes against
    // the exact brute-force top-5 on the 20-query sample — the
    // operational gate that tells you whether nprobe/tables·bits clear
    // the recall SLO before you trust the index at corpus scale.
    // Value-checked against SignatureTruth's scalar recomputation of
    // both legs; SimilaritySpec additionally gates the recall floors.
    "ss14_ann_recall_audit" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 20)
      val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      def audit(name: String, approx: org.apache.spark.sql.DataFrame) =
        Similarity.recallAtK(exact, approx).withColumn("method", lit(name))
      audit("ivf", Similarity.ivfTopK(
          q, emb, "vec_id", "embedding", 5, numCentroids = 16, nprobe = 4))
        .unionByName(audit("srp", Similarity.annTopK(
          q, emb, "vec_id", "embedding", 5, tables = 16, bits = 6, dim = 64)))
        .select("method", "qid", "n_hits", "n_exact", "recall")
        .orderBy("method", "qid")
    }),

    // IVF tuning curve: macro recall@5 vs nprobe ∈ {1,2,4,8} of 16
    // lists against exact brute force — the table an operator reads to
    // pick the cheapest nprobe that clears the recall SLO (ss14 audits
    // one operating point; this sweeps the dial). Deterministic IVF but
    // the sweep is value-checked against SignatureTruth's independent
    // scalar recomputation;
    // SimilaritySpec asserts recall is monotone in nprobe and exact at
    // nprobe = numCentroids.
    "ss15_ivf_tuning_curve" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 20)
      val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      Seq(1, 2, 4, 8).map { np =>
        Similarity.recallAtK(exact, Similarity.ivfTopK(
            q, emb, "vec_id", "embedding", 5, numCentroids = 16, nprobe = np))
          .agg(sum("n_hits").as("hits"), sum("n_exact").as("possible"))
          .select(lit(np).as("nprobe"), col("hits"), col("possible"),
            (col("hits").cast("double") / col("possible").cast("double"))
              .as("macro_recall"))
      }.reduce(_ unionByName _).orderBy("nprobe")
    }),

    "ss4_ivf_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.ivfTopK(
        emb.filter(col("vec_id") < 20), emb, "vec_id", "embedding", 5,
        numCentroids = 16, nprobe = 4)
        .select("qid", "rank", "vec_id")
        .orderBy("qid", "rank")
    }),

    // int8 quantization reconstruction error — the ANN storage lever
    // (4× smaller vectors). Per-vector error stats in the compared
    // output; floor(x·scale + 0.5) instead of round() so no
    // cross-engine half-tie divergence; folds run in array order →
    // oracle-exact.
    "ss5_quantization" -> ((s, d) =>
      Similarity.quantizationError(
        Tables.embeddings(s, d), "vec_id", "embedding")
        .orderBy("vec_id")),

    // Label-mean centroids: per-label mean embedding via posexplode +
    // groupBy — the IVF coarse-quantizer shape. Means use the exact
    // decimal-sum policy so the dim-0 component is oracle-exact.
    "ss3_label_centroids" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val byDim = emb.select(col("label"),
          posexplode(Similarity.asDouble(col("embedding"))).as(Seq("dim", "v")))
        .groupBy("label", "dim")
        .agg(OracleSafe.moneySum(col("v"), 6).as("sum_v"),
          count(lit(1)).as("n"))
      byDim.filter(col("dim") === 0)
        .select(col("label"), col("n").as("n_vecs"),
          (col("sum_v").cast("double") / col("n")).as("centroid_dim0"))
        .orderBy("label")
    }),

    // Lloyd's k-means (k=8, 2 update rounds, deterministic lowest-id
    // seeds, exact-decimal centroid means). Compared output is the
    // final assignment — ids only, per this pack's ranks-not-raw-floats
    // policy. The oracle unrolls both Lloyd rounds in SQL.
    "ss6_kmeans" -> ((s, d) =>
      Similarity.kmeans(
        Tables.embeddings(s, d), "vec_id", "embedding", k = 8, updates = 2)
        .select("vec_id", "cid")
        .orderBy("vec_id")),

    // Per-label cohesion via the sum-of-vectors identity
    // Σ_{i<j} qᵢ·qⱼ = (‖Σq‖² − Σ‖q‖²)/2 on a shared int8-style grid —
    // an n²-pair audit metric for two keyed aggregations; all-integer,
    // hence oracle-exact in any merge order.
    "ss13_cluster_cohesion" -> ((s, d) =>
      Similarity.clusterCohesion(
        Tables.embeddings(s, d), col("label"), col("embedding"), qScale = 64)
        .orderBy("label"))
  )

  private def cosSql(a: String, b: String): String =
    s"""list_sum([CAST($a[i] AS DOUBLE)*CAST($b[i] AS DOUBLE) for i in range(1,65)]) /
        (sqrt(list_sum([CAST($a[i] AS DOUBLE)*CAST($a[i] AS DOUBLE) for i in range(1,65)])) *
         sqrt(list_sum([CAST($b[i] AS DOUBLE)*CAST($b[i] AS DOUBLE) for i in range(1,65)])))"""

  // The SAME rpSigns(42, 8, 64) matrix as the Spark side, inlined as
  // literal ±1 constants; left-assoc addition matches the Scala reduce.
  private def rpProjSql(j: Int): String =
    Similarity.rpSigns(42L, 8, 64)(j).zipWithIndex.map { case (s, i) =>
      s"CAST(embedding[${i + 1}] AS DOUBLE) * $s.0"
    }.mkString(" + ")

  val oracle: Map[String, String] = Map(
    // ss2/ss14/ss15: deterministic ANN paths (total tie-breaks, fixed
    // hyperplanes/centroids) recomputed independently by SignatureTruth's
    // scalar implementation — read back as the truth (float cosines are
    // bit-reproducible in the same fold order but not in SQL, so the
    // RESULTS are the truth rather than a SQL recomputation).
    "ss2_srp_ann_topk" ->
      s"""SELECT qid, rank, vec_id
          FROM read_parquet('${graft.ops.SignatureTruth.defaultDir}/ss2.parquet/*.parquet')
          ORDER BY qid, rank""",
    "ss14_ann_recall_audit" ->
      s"""SELECT method, qid, n_hits, n_exact, recall
          FROM read_parquet('${graft.ops.SignatureTruth.defaultDir}/ss14.parquet/*.parquet')
          ORDER BY method, qid""",
    "ss15_ivf_tuning_curve" ->
      s"""SELECT nprobe, hits, possible, macro_recall
          FROM read_parquet('${graft.ops.SignatureTruth.defaultDir}/ss15.parquet/*.parquet')
          ORDER BY nprobe""",
    "ss10_pq_topk" ->
      s"""SELECT qid, rank, vec_id
          FROM read_parquet('${graft.ops.SignatureTruth.defaultDir}/ss10.parquet/*.parquet')
          ORDER BY qid, rank""",
    "ss20_ivfpq_topk" ->
      s"""SELECT qid, rank, vec_id
          FROM read_parquet('${graft.ops.SignatureTruth.defaultDir}/ss20.parquet/*.parquet')
          ORDER BY qid, rank""",
    // mirrors Similarity.clusterCohesion: shared-grid quantization
    // (floor(x·64 + 0.5) — same floor-not-round rule as ss5), exact
    // integer sums per (label, dim) and per label, one closing division.
    "ss13_cluster_cohesion" ->
      """WITH q AS (SELECT label,
            [CAST(floor(CAST(v AS DOUBLE) * 64 + 0.5) AS BIGINT)
             for v in embedding] AS qv
          FROM embeddings),
         per AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
            CAST(sum(list_sum([x * x for x in qv])) AS BIGINT)
              AS sum_self_dot
          FROM q GROUP BY label),
         dims AS (SELECT label, i, CAST(sum(qv[i]) AS BIGINT) AS s
          FROM q, range(1, 65) t(i) GROUP BY label, i),
         nrm AS (SELECT label, CAST(sum(s * s) AS BIGINT) AS norm_sum_sq
          FROM dims GROUP BY label)
         SELECT p.label, p.n_vecs, p.sum_self_dot,
           (n.norm_sum_sq - p.sum_self_dot) // 2 AS pair_dot_sum,
           CAST(n.norm_sum_sq - p.sum_self_dot AS DOUBLE) /
             (p.n_vecs * (p.n_vecs - 1)) AS mean_pair_dot
         FROM per p JOIN nrm n ON n.label = p.label
         ORDER BY p.label""",
    "ss9_cosine_histogram" ->
      s"""WITH p AS (
            SELECT ${cosSql("a.embedding", "b.embedding")} AS cos
            FROM (SELECT * FROM embeddings WHERE vec_id < 100) a
            JOIN (SELECT * FROM embeddings WHERE vec_id < 100) b
              ON a.vec_id < b.vec_id)
          SELECT least(CAST(floor((cos + 1.0) * 10.0) AS INT), 19) AS bucket,
            CAST(count(*) AS BIGINT) AS n_pairs
          FROM p GROUP BY 1 ORDER BY bucket""",
    "ss8_random_projection" -> {
      val p2 = (0 until 8)
        .map(j => s"((${rpProjSql(j)}) * (${rpProjSql(j)}))")
        .mkString(" + ")
      s"""SELECT vec_id,
            (${rpProjSql(0)}) AS p0,
            ($p2) /
              (8.0 * list_sum([CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)
                for i in range(1,65)])) AS norm_ratio
          FROM embeddings ORDER BY vec_id"""
    },
    "ss7_truncation_quality" ->
      """SELECT vec_id,
           list_sum([CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)
               for i in range(1,33)]) /
             list_sum([CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)
               for i in range(1,65)]) AS energy_retained,
           sqrt(
             list_sum([CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)
                 for i in range(1,33)]) /
               list_sum([CAST(embedding[i] AS DOUBLE)*CAST(embedding[i] AS DOUBLE)
                 for i in range(1,65)])) AS cos_trunc
         FROM embeddings ORDER BY vec_id""",
    "ss5_quantization" ->
      """WITH t AS (SELECT vec_id,
             [CAST(v AS DOUBLE) for v in embedding] AS x FROM embeddings),
         m AS (SELECT vec_id, x,
             greatest(list_max([abs(v) for v in x]), 1e-30) AS mx FROM t),
         e AS (SELECT vec_id, mx,
             [abs(v - floor(v * (127.0/mx) + 0.5) / (127.0/mx)) for v in x]
               AS err
           FROM m)
         SELECT vec_id, mx AS max_abs,
           list_max(err) AS max_err,
           list_sum([e*e for e in err]) / 64 AS mse
         FROM e ORDER BY vec_id""",
    // ss1's top-5 stage + a grouped vote with the same total tie-breaks
    "ss12_knn_classify" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec
            FROM embeddings WHERE vec_id < 20),
          c AS (SELECT vec_id, embedding AS cvec, label FROM embeddings),
          sc AS (SELECT qid, vec_id, label,
            ${cosSql("qvec", "cvec")} AS cos
          FROM q JOIN c ON qid <> vec_id),
          r AS (SELECT qid, vec_id, label,
            row_number() OVER (PARTITION BY qid
              ORDER BY cos DESC, vec_id ASC) AS rn
          FROM sc),
          v AS (SELECT qid, label AS nbr_label,
            CAST(count(*) AS BIGINT) AS votes
          FROM r WHERE rn <= 5 GROUP BY qid, label),
          p AS (SELECT qid, nbr_label, votes,
            row_number() OVER (PARTITION BY qid
              ORDER BY votes DESC, nbr_label ASC) AS rn2
          FROM v)
          SELECT qid, nbr_label AS predicted_label, votes FROM p
          WHERE rn2 = 1 ORDER BY qid""",
    // same list_sum left fold as the Spark dot (dd6/ss1-proven pattern)
    "ss11_mips_topk" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec
            FROM embeddings WHERE vec_id < 20),
          c AS (SELECT vec_id, embedding AS cvec FROM embeddings),
          sc AS (SELECT qid, vec_id,
            list_sum([CAST(qvec[i] AS DOUBLE) * CAST(cvec[i] AS DOUBLE)
                      for i in range(1, 65)]) AS ip
          FROM q JOIN c ON qid <> vec_id),
          r AS (SELECT qid, vec_id,
            CAST(row_number() OVER (PARTITION BY qid
              ORDER BY ip DESC, vec_id ASC) AS INT) AS rank
          FROM sc)
          SELECT qid, rank, vec_id FROM r WHERE rank <= 5
          ORDER BY qid, rank""",
    "ss18_mmr_topk" ->
      s"""SELECT qid, sel_rank, vec_id, mmr_score
          FROM read_parquet('${graft.ops.SignatureTruth.defaultDir}/mmr.parquet/*.parquet')
          ORDER BY qid, sel_rank""",
    // ss19: both rounds + the decimal-mean feedback centroid + the
    // ½q+½μ refinement recomputed outright (ss1's fold + ss17's mean,
    // both proven hash-exact pairs).
    "ss19_rocchio_expand" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec
            FROM embeddings WHERE vec_id < 20),
          c AS (SELECT vec_id, embedding AS cvec FROM embeddings),
          r1 AS (SELECT qid, vec_id, ${cosSql("qvec", "cvec")} AS cos
            FROM q JOIN c ON qid <> vec_id),
          top AS (SELECT qid, vec_id FROM (
              SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
                ORDER BY cos DESC, vec_id ASC) AS rn FROM r1)
            WHERE rn <= 5),
          dims AS (SELECT t.qid, i,
              CAST(sum(CAST(CAST(e.embedding[i] AS DOUBLE)
                AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS mu
            FROM top t JOIN embeddings e ON e.vec_id = t.vec_id,
              range(1, 65) r(i)
            GROUP BY t.qid, i),
          fb AS (SELECT qid, array_agg(mu ORDER BY i) AS fbvec
            FROM dims GROUP BY qid),
          rq AS (SELECT q.qid,
              [0.5 * CAST(q.qvec[i] AS DOUBLE) + 0.5 * fb.fbvec[i]
               for i in range(1, 65)] AS rvec
            FROM q JOIN fb USING (qid)),
          r2 AS (SELECT rq.qid, c.vec_id,
              list_sum([rvec[i] * CAST(cvec[i] AS DOUBLE)
                        for i in range(1, 65)]) /
              (sqrt(list_sum([rvec[i] * rvec[i] for i in range(1, 65)])) *
               sqrt(list_sum([CAST(cvec[i] AS DOUBLE) *
                 CAST(cvec[i] AS DOUBLE) for i in range(1, 65)])))
                AS cos
            FROM rq JOIN c ON rq.qid <> c.vec_id)
          SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos FROM (
            SELECT qid, vec_id, cos, row_number() OVER (PARTITION BY qid
              ORDER BY cos DESC, vec_id ASC) AS rn FROM r2)
          WHERE rn <= 5 ORDER BY qid, rank""",
    "dd24_semantic_decontamination" ->
      s"""WITH t AS (SELECT vec_id AS train_id, embedding AS tvec
            FROM embeddings WHERE vec_id % 50 <> 0),
          e AS (SELECT vec_id AS eval_id, embedding AS evec
            FROM embeddings WHERE vec_id % 50 = 0),
          p AS (SELECT train_id, eval_id,
            ${cosSql("tvec", "evec")} AS cos
          FROM t CROSS JOIN e),
          f AS (SELECT * FROM p WHERE cos >= 0.4),
          r AS (SELECT train_id, eval_id, cos,
            CAST(count(*) OVER (PARTITION BY train_id) AS BIGINT)
              AS n_matches,
            row_number() OVER (PARTITION BY train_id
              ORDER BY cos DESC, eval_id ASC) AS rn
          FROM f)
          SELECT train_id, eval_id AS matched_eval_id, cos, n_matches
          FROM r WHERE rn = 1 ORDER BY train_id""",
    "ss16_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS qid, label AS anchor_label,
            embedding AS qvec FROM embeddings WHERE vec_id < 20),
          c AS (SELECT vec_id AS neg_id, label AS neg_label,
            embedding AS cvec FROM embeddings),
          sc AS (SELECT qid, anchor_label, neg_id, neg_label,
            ${cosSql("qvec", "cvec")} AS cos
          FROM q JOIN c ON anchor_label <> neg_label),
          r AS (SELECT qid, anchor_label, neg_id, neg_label,
            CAST(row_number() OVER (PARTITION BY qid
              ORDER BY cos DESC, neg_id ASC) AS INT) AS rank
          FROM sc)
          SELECT qid, anchor_label, rank, neg_id, neg_label
          FROM r WHERE rank <= 3 ORDER BY qid, rank""",
    // ss17: centroids via the same DECIMAL(18,9)-sum per-dim mean as the
    // Spark side, distance as the nano-quantized BIGINT sum — exact and
    // order-independent on both engines. dist2_nano MUST be re-cast:
    // list_sum over a BIGINT list is DECIMAL(38,0) in DuckDB, and the
    // driver's hasher renders decimals differently from int64 (the
    // round-1 trap; this was the r9 ss17 hash fail — values identical,
    // types not).
    "ss17_centroid_outliers" ->
      """WITH dims AS (SELECT label, i,
            CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,9)))
              AS DOUBLE) / count(*) AS mu
          FROM embeddings, range(1, 65) t(i) GROUP BY label, i),
          cents AS (SELECT label, array_agg(mu ORDER BY i) AS cvec
            FROM dims GROUP BY label),
          sc AS (SELECT e.label, e.vec_id,
            CAST(list_sum([CAST(floor(
                (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i]) *
                (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i]) * 1e9)
              AS BIGINT) for i in range(1, 65)]) AS BIGINT) AS dist2_nano
          FROM embeddings e JOIN cents c USING (label)),
          r AS (SELECT label, vec_id, dist2_nano,
            CAST(row_number() OVER (PARTITION BY label
              ORDER BY dist2_nano DESC, vec_id ASC) AS INT) AS rank
          FROM sc)
          SELECT label, vec_id, dist2_nano, rank, rank <= 5 AS is_outlier
          FROM r ORDER BY label, rank""",
    // lexical channel = ta10's CTE verbatim (TextQueries.bm25Cte) with
    // a rank projected on top; vector channel = ss1's cosine shape for
    // qid 0; fusion = one IEEE division per channel + a fixed-order
    // (lex + vec) sum, mirrored term-by-term with the Spark side
    "ss21_hybrid_rrf" ->
      s"""WITH ${TextQueries.bm25Cte},
          lexs AS (SELECT doc_id, list_sum(list(sc ORDER BY token)) AS bm25
            FROM s GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20),
          lex AS (SELECT doc_id, CAST(row_number() OVER (
              ORDER BY bm25 DESC, doc_id ASC) AS INT) AS lex_rank
            FROM lexs),
          q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
          sc2 AS (SELECT vec_id, ${cosSql("qvec", "cvec")} AS cos
            FROM (SELECT vec_id, embedding AS cvec FROM embeddings
                  WHERE vec_id <> 0) c CROSS JOIN q),
          vr0 AS (SELECT vec_id AS doc_id, CAST(row_number() OVER (
              ORDER BY cos DESC, vec_id ASC) AS INT) AS vec_rank
            FROM sc2),
          vr AS (SELECT doc_id, vec_rank FROM vr0 WHERE vec_rank <= 20),
          f AS (SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
              l.lex_rank AS lex_rank, v.vec_rank AS vec_rank,
              COALESCE(CAST(1 AS DOUBLE) /
                  CAST(60 + l.lex_rank AS DOUBLE), CAST(0 AS DOUBLE)) +
              COALESCE(CAST(1 AS DOUBLE) /
                  CAST(60 + v.vec_rank AS DOUBLE), CAST(0 AS DOUBLE))
                AS rrf
            FROM lex l FULL OUTER JOIN vr v ON l.doc_id = v.doc_id),
          fr AS (SELECT doc_id, lex_rank, vec_rank, rrf,
              CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC)
                AS INT) AS fused_rank
            FROM f)
          SELECT doc_id, lex_rank, vec_rank, rrf, fused_rank
          FROM fr WHERE fused_rank <= 20 ORDER BY fused_rank""",
    "ss1_cosine_topk" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qvec
            FROM embeddings WHERE vec_id < 20),
          c AS (SELECT vec_id, embedding AS cvec FROM embeddings),
          sc AS (SELECT qid, vec_id,
            ${cosSql("qvec", "cvec")} AS cos
          FROM q JOIN c ON qid <> vec_id),
          r AS (SELECT qid, vec_id,
            CAST(row_number() OVER (PARTITION BY qid
              ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
          FROM sc)
          SELECT qid, rank, vec_id FROM r WHERE rank <= 5
          ORDER BY qid, rank""",
    "ss4_ivf_topk" ->
      s"""WITH cent AS (SELECT vec_id AS cid, embedding AS cvec
            FROM embeddings WHERE vec_id < 16),
          corp AS (SELECT vec_id, embedding AS vec FROM embeddings),
          ca AS (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
              ORDER BY ${cosSql("vec", "cvec")} DESC, cid ASC) AS rn
            FROM corp CROSS JOIN cent),
          assigned AS (SELECT vec_id, cid FROM ca WHERE rn = 1),
          qs AS (SELECT vec_id AS qid, embedding AS qvec
            FROM embeddings WHERE vec_id < 20),
          qp AS (SELECT qid, cid, row_number() OVER (PARTITION BY qid
              ORDER BY ${cosSql("qvec", "cvec")} DESC, cid ASC) AS rn
            FROM qs CROSS JOIN cent),
          probe AS (SELECT qid, cid FROM qp WHERE rn <= 4),
          cand AS (SELECT p.qid, a.vec_id
            FROM probe p JOIN assigned a USING (cid)
            WHERE a.vec_id <> p.qid),
          sc AS (SELECT cand.qid, cand.vec_id,
              ${cosSql("qvec", "vec")} AS cos
            FROM cand JOIN qs ON cand.qid = qs.qid
              JOIN corp ON cand.vec_id = corp.vec_id),
          r AS (SELECT qid, vec_id,
            CAST(row_number() OVER (PARTITION BY qid
              ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
          FROM sc)
          SELECT qid, rank, vec_id FROM r WHERE rank <= 5
          ORDER BY qid, rank""",
    "ss3_label_centroids" ->
      """SELECT label, count(*) AS n_vecs,
           CAST(sum(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(18,6)))
             AS DOUBLE) / count(*) AS centroid_dim0
         FROM embeddings GROUP BY label ORDER BY label""",
    // both Lloyd rounds unrolled; every stage mirrors Similarity.kmeans
    // expression-for-expression (L2 left fold, d2/cid tie-break,
    // DECIMAL(18,9) per-dim sums -> one double division)
    "ss6_kmeans" ->
      s"""WITH corp AS (SELECT vec_id,
            [CAST(x AS DOUBLE) for x in embedding] AS vec FROM embeddings),
          c0 AS (SELECT vec_id AS cid, vec AS cvec FROM corp
            WHERE vec_id < 8),
          ${kmeansRound("c0", 1)},
          ${kmeansUpdate(1)},
          ${kmeansRound("c1", 2)},
          ${kmeansUpdate(2)},
          ${kmeansRound("c2", 3)}
          SELECT vec_id, cid FROM a3 ORDER BY vec_id"""
    // ss2/ss14/ss15: SignatureTruth oracles (head of this map).
  )

  /** One k-means assignment round in SQL: distances to `centCte`'s
    * centroids, keep the nearest (ties to the lowest cid). */
  private def kmeansRound(centCte: String, n: Int): String =
    s"""s$n AS (SELECT c.vec_id, k.cid, c.vec,
          list_sum([(c.vec[i] - k.cvec[i]) * (c.vec[i] - k.cvec[i])
            for i in range(1,65)]) AS d2
        FROM corp c CROSS JOIN $centCte k),
        a$n AS (SELECT vec_id, cid, vec FROM (SELECT vec_id, cid, vec,
            row_number() OVER (PARTITION BY vec_id
              ORDER BY d2 ASC, cid ASC) AS rn FROM s$n)
          WHERE rn = 1)"""

  /** One k-means centroid update in SQL: exact-decimal per-dim means of
    * assignment round `n`, reassembled in dimension order. */
  private def kmeansUpdate(n: Int): String =
    s"""m$n AS (SELECT cid, i,
          CAST(sum(CAST(vec[i] AS DECIMAL(18,9))) AS DOUBLE) /
            CAST(count(*) AS DOUBLE) AS mu
        FROM a$n, range(1, 65) t(i) GROUP BY cid, i),
        c$n AS (SELECT cid, list(mu ORDER BY i) AS cvec FROM m$n
          GROUP BY cid)"""
}
