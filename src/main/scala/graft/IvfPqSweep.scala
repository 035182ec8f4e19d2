package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ops.{Pipeline, Similarity}

/** ss20 operating-point sweep — the measured backing for the round-15
  * adopt-or-keep decision on `ss20_ivfpq_topk`, the heaviest gated llm
  * row (2.87 s at the 32g config of record). Round 10 adjudicated the
  * cost as compile-dominated (SCALE.md "ss10/ss20 cost adjudication"):
  * the literal-codebook argmin/ADC expression trees, not data movement.
  * This harness turns that adjudication's remaining question — is the
  * CONFIGURED point (nprobe=2, m=8, cb=16) the recall-optimal spend, or
  * does a smaller tree buy the same recall cheaper? — into an artifact.
  *
  * For each operating point it measures, in ONE session over the sf0.1
  * embeddings (Bench discipline: warmup, 3 INTERLEAVED reps, min
  * reported, pinned caches released after every rep exactly like the
  * llm sweep's `llmRun`):
  *   - wall seconds of the full ss20-shaped run (train + encode + probe
  *     + top-5), end to end — the same thing the bench times;
  *   - macro recall@5 vs the exact cosine brute-force top-5 on the same
  *     20-query sample (the ss14 audit's definition: Σhits / Σexact);
  *   - a HIGH-RESOLUTION recall leg: recall@20 vs the exact L2 top-20
  *     (the metric ivfPqTopK actually approximates) over a 100-query
  *     sample — 2,000 possible hits instead of 100, so a few-hit noise
  *     swing cannot rank the points. The catalog-shaped 20-query@5
  *     number would call 7 vs 9 hits a ranking; this leg exists so the
  *     adopt-or-keep decision rests on a signal, not on noise.
  *
  * Points: nprobe ∈ {1,2,4} at the configured (m=8, cb=16) tree, and
  * the smaller trees (m=4, cb=16), (m=8, cb=8), (m=4, cb=8) at the
  * configured nprobe=2 — the two dials the r14 verdict named, swept
  * one at a time around the shipped point. numCoarse=8, updates=1
  * throughout (the catalog configuration).
  *
  * Run: `sbt "runMain graft.IvfPqSweep [sfDir]"` (default sf0.1).
  * Output: SPARK_GRAFT_IVFPQ_OUT (default IVFPQAB.json), one object per
  * point: {"sec": minSec, "reps": [...], "recall": macroRecall}.
  * `tools/doc_sync_check.py` gates SCALE.md's quoted numbers against it.
  */
object IvfPqSweep {

  /** (label, nprobe, m, codebookSize) — label doubles as the JSON key. */
  val points: Seq[(String, Int, Int, Int)] = Seq(
    ("np1_m8_cb16", 1, 8, 16),
    ("np2_m8_cb16", 2, 8, 16), // shipped r15–r18 (bundled cost model)
    ("np4_m8_cb16", 4, 8, 16),
    ("np2_m4_cb16", 2, 4, 16),
    ("np2_m8_cb8", 2, 8, 8),
    ("np2_m4_cb8", 2, 4, 8))

  /** Round-19 SERVE-split points (the verdict's re-adjudication): the
    * round-15 keep of (nprobe=2, m=8, cb=16) priced RE-TRAINING into
    * every rep; with `ivfPqTrain`/`ivfPqServe` amortizing the
    * once-per-corpus k-means, the operating point should be chosen on
    * serve cost alone. nprobe sweeps the probed-cell fraction at the
    * shipped tree (np8 of numCoarse=8 = exhaustive probe, i.e. the PQ
    * quantization-error recall CEILING at this tree); the cb32/m16
    * trees probe whether a finer quantizer lifts that ceiling toward
    * ~0.9 for an acceptable serve (and once-per-corpus train) delta. */
  val servePoints: Seq[(String, Int, Int, Int)] = Seq(
    ("serve_np1_m8_cb16", 1, 8, 16),
    ("serve_np2_m8_cb16", 2, 8, 16), // shipped r15–r18
    ("serve_np4_m8_cb16", 4, 8, 16),
    ("serve_np8_m8_cb16", 8, 8, 16),
    ("serve_np2_m8_cb32", 2, 8, 32),
    ("serve_np3_m8_cb32", 3, 8, 32), // round-20 probe (r19 advice)
    ("serve_np4_m8_cb32", 4, 8, 32), // ADOPTED round 19 (see ss20 note)
    ("serve_np4_m16_cb16", 4, 16, 16))

  /** Round-20 refinement points (the r19 verdict's serve-time-recovery
    * probe): ADC retrieves a candidate pool (`_rrP` = pool size), exact
    * L2 over reconstructed vectors re-ranks it, top-k kept —
    * [[Similarity.ivfPqServeReranked]], the IVFADC+R shape. Re-ranking
    * fixes ADC-noise displacement (the measured np8 recall DROP), so
    * the question is whether a cheaper tree/probe + rerank reaches the
    * adopted recall (≥0.93) below the adopted serve cost (~1.2 s
    * planted). (label, nprobe, m, codebookSize, pool). */
  val rerankPoints: Seq[(String, Int, Int, Int, Int)] = Seq(
    ("serve_np2_m8_cb16_rr50", 2, 8, 16, 50),
    ("serve_np4_m8_cb16_rr50", 4, 8, 16, 50),
    ("serve_np8_m8_cb16_rr50", 8, 8, 16, 50),
    ("serve_np2_m8_cb32_rr50", 2, 8, 32, 50),
    ("serve_np3_m8_cb32_rr50", 3, 8, 32, 50),
    ("serve_np4_m8_cb32_rr50", 4, 8, 32, 50))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors(), 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ivfpq-sweep")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sfDir).cache()
    emb.count()
    val q = emb.filter(col("vec_id") < 20)
    val qWide = emb.filter(col("vec_id") < 100)
    // exact cosine top-5 (the ss14 audit's ground truth), one collect of
    // 100 pairs — sample-sized, not corpus-sized
    val exact: Set[(Long, Long)] =
      Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact L2 top-20 over the wide sample: ivfPqTopK ranks by
    // (approximate) squared L2, so THIS is the ground truth its recall
    // should be read against; 100 queries × 20 = 2,000 possible hits
    val exactL2: Set[(Long, Long)] = {
      val qq = qWide.select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qvec"))
      val cc = emb.select(col("vec_id"), col("embedding")
        .cast("array<double>").as("cvec"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid"))
        .orderBy(col("d2").asc, col("vec_id").asc)
      qq.crossJoin(cc).filter(col("qid") =!= col("vec_id"))
        .withColumn("d2", aggregate(
          zip_with(col("qvec"), col("cvec"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 20)
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }

    def run(np: Int, m: Int, cb: Int,
        qs: org.apache.spark.sql.DataFrame = q, k: Int = 5)
        : org.apache.spark.sql.DataFrame =
      Similarity.ivfPqTopK(qs, emb, "vec_id", "embedding", k,
        dim = 64, numCoarse = 8, nprobe = np, m = m, codebookSize = cb,
        updates = 1)
    def timedRun(np: Int, m: Int, cb: Int): Double = {
      val t0 = System.nanoTime()
      Force.run(run(np, m, cb))
      val sec = (System.nanoTime() - t0) / 1e9
      Pipeline.releaseCaches()
      sec
    }

    // ---- ANN family rows (round 17, r16 verdict stretch 8): ss2's
    // SRP-LSH and ss4's IVF at their CATALOG configurations, measured
    // against the same exact truths on the same fixture — so when this
    // sweep runs on the planted-cluster dir, their recall claims become
    // signal-rich the way ss20's did in round 16 (on uniform-random
    // embeddings the recall specs bind on the random floor).
    // METRIC NOTE (round-18, r17 advice): ss2/ss4 rank by exact COSINE
    // over their candidate sets, so the cosine recall@5 leg applies
    // unchanged, but the recall_l2@20 leg scores their cosine-ranked
    // top-k against L2-ranked ground truth — a CROSS-METRIC number
    // unless the fixture is unit-normalized. It is reported anyway
    // because on both shipped fixtures the orderings coincide to
    // within noise: the uniform embeddings are unit vectors (measured
    // norms 1 ± 1e-7) and the planted vectors are unit centers plus
    // eps=0.05 jitter (norms ≈ 1 ± 0.03, cluster separation ≫ the
    // norm spread, so top-20 = cluster siblings under either metric).
    // On an un-normalized corpus read the ss2/ss4 recall_l2 rows as a
    // conservative candidate-recall bound, not an operator ranking
    // score; ss20 (which ranks by L2 ADC) is the apples-to-apples row.
    val famPoints: Seq[(String,
        (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame)] = Seq(
      ("ss2_srp_t16_b6", (qs, k) => Similarity.annTopK(
        qs, emb, "vec_id", "embedding", k, tables = 16, bits = 6, dim = 64)),
      ("ss4_ivf_c16_np4", (qs, k) => Similarity.ivfTopK(
        qs, emb, "vec_id", "embedding", k, numCentroids = 16, nprobe = 4)))

    // recall first (also the warmup/codegen pass for each point)
    val recall: Map[String, Double] = (points.map { case (lbl, np, m, cb) =>
      val approx = run(np, m, cb).select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      Pipeline.releaseCaches()
      lbl -> (exact.intersect(approx).size.toDouble / exact.size)
    } ++ famPoints.map { case (lbl, f) =>
      val approx = f(q, 5).select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      Pipeline.releaseCaches()
      lbl -> (exact.intersect(approx).size.toDouble / exact.size)
    }).toMap
    val recallL2: Map[String, Double] = (points.map { case (lbl, np, m, cb) =>
      val approx = run(np, m, cb, qWide, 20).select("qid", "vec_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      Pipeline.releaseCaches()
      lbl -> (exactL2.intersect(approx).size.toDouble / exactL2.size)
    } ++ famPoints.map { case (lbl, f) =>
      val approx = f(qWide, 20).select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      Pipeline.releaseCaches()
      lbl -> (exactL2.intersect(approx).size.toDouble / exactL2.size)
    }).toMap

    val allLabels = points.map(_._1) ++ famPoints.map(_._1)
    val acc = allLabels.map(_ -> Vector.empty[Double])
      .to(collection.mutable.LinkedHashMap)
    (1 to 3).foreach { _ =>
      points.foreach { case (lbl, np, m, cb) =>
        acc(lbl) :+= timedRun(np, m, cb)
      }
      famPoints.foreach { case (lbl, f) =>
        val t0 = System.nanoTime()
        Force.run(f(q, 5))
        acc(lbl) :+= (System.nanoTime() - t0) / 1e9
        Pipeline.releaseCaches()
      }
    }

    // ---- serve-split sweep (round 19) ----
    // One tree at a time, STRICTLY sequential: train in its own scope,
    // measure every nprobe point against the pinned model, release the
    // scope BEFORE the next tree trains — two live trees would share
    // the plan-identical residual frame (same corpus, same numCoarse),
    // and releasing one scope would unpersist it under the other (the
    // r18 cache-identity finding; the Bench ss20TrainTimed ordering
    // rule, applied here by construction).
    val serveByTree = (servePoints.map(p => (p._3, p._4)) ++
        rerankPoints.map(p => (p._3, p._4))).distinct.sorted
      .map { tree =>
        (tree, servePoints.filter(p => (p._3, p._4) == tree),
          rerankPoints.filter(p => (p._3, p._4) == tree))
      }
    val serveResults: Seq[(String, Double, Vector[Double], Double, Double)] =
      serveByTree.flatMap { case ((m, cb), pts, rpts) =>
        val scope = new Pipeline.PinScope
        val t0 = System.nanoTime()
        val model = Pipeline.withScope(scope)(
          Similarity.ivfPqTrain(emb, "vec_id", "embedding",
            dim = 64, numCoarse = 8, m = m, codebookSize = cb, updates = 1))
        Force.run(model.encoded)
        val trainSec = (System.nanoTime() - t0) / 1e9
        def serve(qs: org.apache.spark.sql.DataFrame, k: Int, np: Int) =
          Similarity.ivfPqServe(qs, model, "vec_id", "embedding", k, np)
        // rerank pool keeps its k:pool RATIO for the two recall legs
        // (pool is quoted for k=20; the k=5 leg scales it down 4×) so
        // one label means one over-retrieval factor, not two
        def serveRr(qs: org.apache.spark.sql.DataFrame, k: Int, np: Int,
            pool: Int) =
          Similarity.ivfPqServeReranked(qs, model, "vec_id", "embedding",
            k, np, math.max(k, pool * k / 20))
        // recall legs double as the per-point warmup (codegen)
        val recalls = pts.map { case (lbl, np, _, _) =>
          val r5 = serve(q, 5, np).select("qid", "vec_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          val r20 = serve(qWide, 20, np).select("qid", "vec_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          lbl -> ((exact.intersect(r5).size.toDouble / exact.size,
            exactL2.intersect(r20).size.toDouble / exactL2.size))
        }.toMap ++ rpts.map { case (lbl, np, _, _, pool) =>
          val r5 = serveRr(q, 5, np, pool).select("qid", "vec_id")
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          val r20 = serveRr(qWide, 20, np, pool).select("qid", "vec_id")
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          lbl -> ((exact.intersect(r5).size.toDouble / exact.size,
            exactL2.intersect(r20).size.toDouble / exactL2.size))
        }.toMap
        val reps = (pts.map(_._1) ++ rpts.map(_._1)).map {
          lbl => lbl -> Vector.empty[Double]
        }.to(collection.mutable.LinkedHashMap)
        (1 to 3).foreach { _ =>
          pts.foreach { case (lbl, np, _, _) =>
            val s0 = System.nanoTime()
            Force.run(serve(q, 5, np))
            reps(lbl) :+= (System.nanoTime() - s0) / 1e9
          }
          rpts.foreach { case (lbl, np, _, _, pool) =>
            val s0 = System.nanoTime()
            Force.run(serveRr(q, 5, np, pool))
            reps(lbl) :+= (System.nanoTime() - s0) / 1e9
          }
        }
        scope.release()
        (pts.map(_._1) ++ rpts.map(_._1)).map { lbl =>
          val (r5, r20) = recalls(lbl)
          (lbl, trainSec, reps(lbl), r5, r20)
        }
      }

    // ---- self-truthed composition rows (round 18, r17 stretch 7) ----
    // The last two query-shaped similarity surfaces without a
    // signal-rich recall number, each scored against ITS OWN objective
    // truth (not L2 — see the famPoints metric note):
    //   ss11_mips_srp65 — MIPS served through the Shrivastava-Li
    //     augmentation (append sqrt(M²−‖x‖²) corpus-side, 0
    //     query-side) + the ss2 SRP-LSH index over the 65-dim
    //     augmented space; recall@20 vs exact INNER-PRODUCT truth
    //     (mipsTopK — magnitude-aware, MIPS's actual objective).
    //   ss18_mmr_ivf — the MMR re-rank composed with ss4's IVF
    //     candidate generator (the corpus-scale form the mmrTopK
    //     scaladoc names); recall = selection overlap@5 vs the
    //     exact-candidate MMR selection (MMR has no ranked truth
    //     beyond its own greedy objective).
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the exact transform the catalog's mipsViaCosine composes — shared
    // helper, so the row measures the shipped augmentation (r18 review)
    val (qAug, cAug) =
      Similarity.mipsAugment(qWide, emb, "vec_id", "embedding")
    def ss11Plan(k: Int) = Similarity.annTopK(
      qAug, cAug, "id", "vec", k, tables = 16, bits = 6, dim = 65)
    def ss18Plan() = Similarity.mmrRerank(
      Similarity.ivfTopK(qWide, emb, "vec_id", "embedding", 10,
        numCentroids = 16, nprobe = 4),
      emb, "vec_id", "embedding", 5, 0.5)
    val exactIp20 = pairSet(
      Similarity.mipsTopK(qWide, emb, "vec_id", "embedding", 20))
    val ss11Recall = {
      val r = pairSet(ss11Plan(20)).intersect(exactIp20).size.toDouble /
        exactIp20.size
      Pipeline.releaseCaches(); r
    }
    val exactSel = pairSet(Similarity.mmrTopK(
      qWide, emb, "vec_id", "embedding", m = 10, k = 5, lambda = 0.5))
    val ss18Recall = {
      val r = pairSet(ss18Plan()).intersect(exactSel).size.toDouble /
        exactSel.size
      Pipeline.releaseCaches(); r
    }
    val selfRows: Seq[(String, () => Unit, Double, String)] = Seq(
      ("ss11_mips_srp65", () => { Force.run(ss11Plan(20)); () },
        ss11Recall, "ip@20"),
      ("ss18_mmr_ivf", () => { Force.run(ss18Plan()); () },
        ss18Recall, "mmr_selection@5"))
    val selfAcc = selfRows.map { case (lbl, f, _, _) =>
      f(); Pipeline.releaseCaches() // warmup/codegen
      lbl -> (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f()
        val s = (System.nanoTime() - t0) / 1e9
        Pipeline.releaseCaches(); s
      }.toVector
    }.toMap

    def jnum(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
    val fields = allLabels.map { lbl =>
      val reps = acc(lbl)
      s""""$lbl":{"sec":${jnum(reps.min)},""" +
        s""""reps":${reps.map(jnum).mkString("[", ",", "]")},""" +
        s""""recall":${jnum(recall(lbl))},""" +
        s""""recall_l2_at20":${jnum(recallL2(lbl))}}"""
    }.mkString(",")
    val selfFields = selfRows.map { case (lbl, _, rec, truth) =>
      val reps = selfAcc(lbl)
      s""""$lbl":{"sec":${jnum(reps.min)},""" +
        s""""reps":${reps.map(jnum).mkString("[", ",", "]")},""" +
        s""""recall_self":${jnum(rec)},"truth":"$truth"}"""
    }.mkString(",")
    val serveFields = serveResults.map {
      case (lbl, trainSec, reps, r5, r20) =>
        s""""$lbl":{"sec":${jnum(reps.min)},""" +
          s""""reps":${reps.map(jnum).mkString("[", ",", "]")},""" +
          s""""train_sec":${jnum(trainSec)},""" +
          s""""recall":${jnum(r5)},"recall_l2_at20":${jnum(r20)}}"""
    }.mkString(",")
    val json = s"""{"sf_dir":"$sfDir","k":5,"num_coarse":8,"queries":20,""" +
      s""""recall_l2_queries":100,$fields,$selfFields,$serveFields}"""
    val path = sys.env.getOrElse("SPARK_GRAFT_IVFPQ_OUT", "IVFPQAB.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json + "\n")
    allLabels.foreach { lbl =>
      System.err.println(
        f"[ivfpq] $lbl%-16s min ${acc(lbl).min}%.3f s  recall@5 " +
          f"${recall(lbl)}%.3f  recall_l2@20 ${recallL2(lbl)}%.3f")
    }
    selfRows.foreach { case (lbl, _, rec, truth) =>
      System.err.println(
        f"[ivfpq] $lbl%-16s min ${selfAcc(lbl).min}%.3f s  " +
          f"recall_self $rec%.3f  (truth: $truth)")
    }
    serveResults.foreach { case (lbl, trainSec, reps, r5, r20) =>
      System.err.println(
        f"[ivfpq] $lbl%-20s serve ${reps.min}%.3f s  train $trainSec%.2f s" +
          f"  recall@5 $r5%.3f  recall_l2@20 $r20%.3f")
    }
    System.err.println(s"[ivfpq] wrote $path")
    spark.stop()
  }
}
