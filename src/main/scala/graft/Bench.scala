package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** Benchmark main — 8-query TPC-H-class headline suite (the shapes the
  * reference's README bench claims, README.md:5) on
  * SPARK_GRAFT_SF_DIR, one JSON contract line on stdout.
  *
  * Methodology mirrors the reference's own setup (BASELINE.md): tables are
  * pre-loaded before the timed loop (the reference eagerly materializes at
  * CREATE, Microbase.scala:960-983 — here `cache()` + force), two warmup
  * passes absorb plan/codegen compilation and JIT stragglers, then each
  * query is timed end-to-end (5 reps INTERLEAVED round-robin across
  * queries; median AND min reported, ALL reps + GC time emitted so an
  * outlier rep is diagnosable from the artifact alone). An informational
  * `tpch22_total` times every TPC-H shape in the catalog once.
  *
  * The JSON line is printed to stdout and also written to
  * `BENCH_LAST.json` (launchers like sbt prefix stdout, which defeats a
  * log-scrape json parse). A `bucketed` field re-times the two
  * shuffle-dominated queries over pre-bucketed lineitem/orders — the
  * measured version of the co-located-join story in SCALE.md.
  *
  * `BENCH_LAST.json` is the MOST RECENT capture, overwritten by every
  * run (including the driver's end-of-round run). The capture OF RECORD
  * — the one SCALE.md quotes and `tools/doc_sync_check.py` gates — is
  * `BENCH_RECORD.json`, promoted by an explicit
  * `cp BENCH_LAST.json BENCH_RECORD.json` + commit after adjudicating
  * the capture (keep-best across spaced runs; stall_flags/stall_retries
  * carry the noise provenance). This split exists because the r12 and
  * r13 end-of-round driver runs both overwrote the then-gated
  * BENCH_LAST.json with tenancy-contaminated captures, and each
  * following round had to spend its opening re-adjudicating the docs.
  */
object Bench {

  /** The timed suite: 8 TPC-H-class queries (scan/filter/agg, 3-to-6-way
    * broadcast joins, conditional aggregation, disjunctive predicates). */
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q6_forecast_revenue", "q10_returned_items", "q12_priority_shipping",
    "q14_promo_effect", "q19_disjunctive_filter")

  /** Stall sentinel (r12 lesson): the r12 driver run recorded ss20 reps
    * of 8.8/8.1/12.9 s with 599–798 ms GC per rep and q21 reps
    * [1.57, 3.25, 5.40] on code commit-identical to a round that
    * measured 2.84 s / [1.2, 1.1, 0.98] — a background-load signature
    * that was only diagnosable by hand-reading rep arrays. Flag, in the
    * artifact itself, every rep whose stop-the-world GC exceeds
    * `gcThresholdMs` (clean runs top out well under 100 ms per rep;
    * contaminated reps measured 468–798 ms) or whose wall time exceeds
    * `ratio`× that query's own min (a one-sided environment stall; a
    * real plan regression moves ALL reps). A run with a non-trivial
    * stall_flag_count is machine-detectably contaminated and must not
    * become the artifact of record without adjudication. Sub-50 ms
    * query mins are exempt from the ratio rule (scheduler jitter alone
    * can triple them). Returns one JSON object string per flagged rep. */
  /** The sentinel's per-rep decision rule, shared by [[stallFlags]]
    * (which reports) and [[retryFlagged]] (which re-runs) so the two can
    * never diverge: fat stop-the-world GC, or wall time beyond `ratio`×
    * the query's own min — with sub-50 ms mins exempt from the ratio
    * rule (scheduler jitter alone can triple them). */
  private[graft] def repFlagged(sec: Double, gcMs: Long, minSec: Double,
      gcThresholdMs: Long, ratio: Double): Boolean =
    (minSec > 0.05 && sec > ratio * minSec) || gcMs > gcThresholdMs

  private[graft] def stallFlags(section: String,
      rows: Seq[(String, Seq[Double], Seq[Long])],
      gcThresholdMs: Long = 150L, ratio: Double = 2.5): Seq[String] =
    rows.flatMap { case (q, reps, gcs) =>
      val mn = if (reps.nonEmpty) reps.min else 0.0
      reps.zipWithIndex.flatMap { case (v, i) =>
        val gc = if (i < gcs.size) gcs(i) else 0L
        if (repFlagged(v, gc, mn, gcThresholdMs, ratio))
          Some(s"""{"section":"$section","query":"$q","rep":${i + 1},""" +
            f""""sec":$v%.4f,"min":$mn%.4f,"gc_ms":$gc}""")
        else None
      }
    }

  /** Bounded auto-retry of stall-flagged reps (r13 verdict item 3): the
    * sentinel DETECTS daytime-tenancy contamination; this lets a capture
    * CONVERGE to the quiet-box band without a human re-running the job.
    * For each query whose rep array carries a flag (the same rules as
    * [[stallFlags]]), re-run the query — `pause` runs first, spacing the
    * attempt so a transient host stall can clear — and replace the WORST
    * flagged rep iff the retry beat it ("keep the best"; a retry that is
    * itself slow is recorded but changes nothing). At most `maxRetries`
    * re-runs per query, so a genuinely loaded host bounds the extra work
    * instead of spinning. The caller computes the artifact's stall_flags
    * on the POST-retry reps — a converged run reads clean — and every
    * attempt lands in `stall_retries` provenance (original rep value and
    * GC, retry value and GC, whether it replaced), so the
    * contamination-and-recovery history stays readable from the JSON
    * alone. */
  private[graft] def retryFlagged(
      section: String,
      rows: Seq[(String, Seq[Double], Seq[Long])],
      rerun: String => (Double, Long),
      maxRetries: Int = 2,
      pause: () => Unit = () => Thread.sleep(3000),
      gcThresholdMs: Long = 150L, ratio: Double = 2.5)
      : (Seq[(String, Seq[Double], Seq[Long])], Seq[String]) = {
    val prov = Seq.newBuilder[String]
    val out = rows.map { case (q, reps0, gcs0) =>
      var reps = reps0.toVector
      var gcs = gcs0.toVector
      var budget = math.max(0, maxRetries)
      // worst flagged rep index under the current array, if any
      def worstFlagged: Option[Int] = {
        val mn = if (reps.nonEmpty) reps.min else 0.0
        val idxs = reps.indices.filter { i =>
          val gc = if (i < gcs.size) gcs(i) else 0L
          repFlagged(reps(i), gc, mn, gcThresholdMs, ratio)
        }
        if (idxs.isEmpty) None else Some(idxs.maxBy(reps))
      }
      var worst = worstFlagged
      while (worst.isDefined && budget > 0) {
        pause()
        val i = worst.get
        val origGc = if (i < gcs.size) gcs(i) else 0L
        // a retry failure must not discard the section's already-measured
        // rows (the headline/tpch22/llm reps are complete by now): record
        // the error in provenance, stop retrying this query, keep the
        // original rep and its flag
        scala.util.Try(rerun(q)) match {
          case scala.util.Success((sec, gc)) =>
            budget -= 1
            // Accept a retry that strictly beats the flagged rep — or, when
            // the rep was flagged ONLY by the GC rule (the min-rep shape:
            // ratio can't flag the min), a clean-GC retry that is itself
            // ratio-clean AND within 5% of the rep it replaces. Without
            // the acceptance, a retry that PROVED the stall transient is
            // discarded and the budget burns re-retrying the same rep;
            // without the 5% bound (round-15 review), the window was
            // ratio×min — wide enough for a clean-GC retry up to 2.5× the
            // min (unbounded when min ≤ 50 ms) to REPLACE a faster
            // measurement, inflating the reported min/median.
            val mn = reps.min
            val gcOnlyFlag = !(mn > 0.05 && reps(i) > ratio * mn)
            val retryClean = gc <= gcThresholdMs && sec <= reps(i) * 1.05 &&
              !(mn > 0.05 && sec > ratio * mn)
            val replaced = sec < reps(i) || (gcOnlyFlag && retryClean)
            prov += (s"""{"section":"$section","query":"$q","rep":${i + 1},""" +
              f""""orig_sec":${reps(i)}%.4f,"orig_gc_ms":$origGc,""" +
              f""""retry_sec":$sec%.4f,"retry_gc_ms":$gc,"replaced":$replaced}""")
            if (replaced) {
              reps = reps.updated(i, sec)
              if (i < gcs.size) gcs = gcs.updated(i, gc)
            }
            worst = worstFlagged
          case scala.util.Failure(e) =>
            budget = 0
            val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("""[\\"\n\r\t]""", " ").take(160)
            prov += (s"""{"section":"$section","query":"$q","rep":${i + 1},""" +
              f""""orig_sec":${reps(i)}%.4f,"orig_gc_ms":$origGc,""" +
              s""""retry_error":"$msg","replaced":false}""")
            worst = None
        }
      }
      (q, reps: Seq[Double], gcs: Seq[Long])
    }
    (out, prov.result())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors(), 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      // The fixtures are single small parquet files; at the default 128 MB
      // maxPartitionBytes each table scans (and caches) as ONE partition,
      // so every query's scan stage runs single-threaded regardless of
      // cores. Split to ~1 MB so the cached tables hold tens of
      // partitions and scans use the machine. (At cluster scale this knob
      // goes the other way — 256–512 MB — per SCALE.md; it is a
      // data-size-to-parallelism dial either way.)
      .config("spark.sql.files.maxPartitionBytes", (1L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (64L << 10).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-bench-wh-").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Pre-computation (reference parity): cache + force the TPC-H tables.
    // Queries re-reading the same parquet paths hit the cached
    // InMemoryRelation via logical-plan cache matching.
    Tables.tpch.foreach { t => Tables.load(spark, sfDir, t).cache().count() }

    // THREE warmup passes: the first absorbs plan + whole-stage-codegen
    // compilation, the second catches the stragglers (C2 recompiles, the
    // first GC young-gen resize), the third settles allocation-rate
    // ergonomics — at sub-second magnitudes one straggler rep moves even
    // a median-of-5 (r8's recorded headline doubled vs r6 purely from
    // rep-loop GC churn; per-query gc_ms up to 1.16 s proved it).
    (1 to 3).foreach { _ =>
      headline.foreach(q => Force.run(SparkEntry.queries(q)(spark, sfDir)))
    }
    // GC settle before the timed reps: force a full collection and give
    // concurrent phases a beat to finish, so the timed loop starts from a
    // compacted heap instead of paying the warmups' garbage.
    System.gc()
    Thread.sleep(1000)

    /** Total stop-the-world GC time across all collectors, in ms. */
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
    }

    // Timed pass: 5 reps per query, report the median — but emit EVERY
    // rep (plus the GC time that elapsed across the query's reps) in the
    // artifact, so a 3× outlier is diagnosable from the JSON alone: a
    // noisy environment shows one blown rep among four steady ones (and
    // usually a fat gc_ms), a real regression shows five consistently
    // slow reps. Each rep is still end-to-end (plan + execute +
    // materialize), same warmed-cache methodology as the reference's
    // pre-loaded tables.
    //
    // Reps are INTERLEAVED round-robin across queries (rep 1 of every
    // query, then rep 2 of every query, …), not run back-to-back per
    // query: a multi-second environment stall (page-cache writeback, a
    // competing process, a JIT deopt storm) then lands in at most one
    // rep of each query — where the median discards it — instead of
    // concentrating 3 of one query's 5 reps and tripling that query's
    // median while its neighbors stay clean (the r6 "q3 regression" and
    // the r3→r4 "q10 regression" were exactly this ambiguity). The
    // per-query MIN is emitted alongside the median: min is immune to
    // one-sided noise, so median >> min flags "stalled environment"
    // while median ≈ min ≫ last round flags a real plan regression.
    val repCount = 5
    val repsByQuery = collection.mutable.Map(
      headline.map(_ -> Vector.empty[Double]): _*)
    val gcByQuery = collection.mutable.Map(
      headline.map(_ -> Vector.empty[Long]): _*)
    // The one timing discipline every section shares (headline, tpch22,
    // llm, ss20_train — the stall sentinel and drift watch compare
    // across sections, so they must never diverge): gc delta + wall
    // clock around a Force.run of the full plan.
    def timedBody(body: => Unit): (Double, Long) = {
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      body
      ((System.nanoTime() - t0) / 1e9, gcMillis() - gc0)
    }
    // One timed end-to-end execution of `q` — the same measurement the
    // rep loops take, shared with the stall-retry path so a retried rep
    // is measured identically to the rep it may replace. Graft-pinned
    // frames are released AFTER the timed window (round-18 honesty fix:
    // q15 persists+pins its per-supplier aggregate at construction, and
    // Spark's cache manager matches plan-identical frames — without the
    // release, every rep after the warmup read the warmup's cached
    // aggregate instead of executing the query, so the tpch22 q15 row
    // timed a cache read; captures from r18 on pay the honest
    // re-execution, ~0.33 → ~0.7 s at sf0.1).
    def timedRun(q: String): (Double, Long) = {
      val r = timedBody(Force.run(SparkEntry.queries(q)(spark, sfDir)))
      graft.ops.Pipeline.releaseCaches()
      r
    }
    // Stall-retry budget (see retryFlagged): per-query bound on re-runs
    // of flagged reps. SPARK_GRAFT_BENCH_RETRIES=0 disables (a pure
    // "record the contamination" capture); default 2.
    val retryBudget =
      sys.env.get("SPARK_GRAFT_BENCH_RETRIES").map(_.toInt).getOrElse(2)
    val retryProv = Seq.newBuilder[String]
    (1 to repCount).foreach { _ =>
      headline.foreach { q =>
        val (sec, gc) = timedRun(q)
        repsByQuery(q) :+= sec
        gcByQuery(q) :+= gc
      }
    }
    val timed = {
      val rows0 = headline.map(q =>
        (q, repsByQuery(q): Seq[Double], gcByQuery(q): Seq[Long]))
      val (rows, prov) =
        retryFlagged("headline", rows0, timedRun, retryBudget)
      retryProv ++= prov
      rows
    }
    val results = timed.map { case (q, reps, _) =>
      q -> reps.sorted.apply(repCount / 2)
    }
    val mins = timed.map { case (q, reps, _) => q -> reps.min }

    // Informational full-suite sweep: every TPC-H shape in the catalog —
    // not part of the headline metric (BASELINE.md defines the 8-query
    // suite) but a regression in e.g. q9/q18/q21 becomes visible
    // round-over-round instead of timed nowhere. Same discipline as the
    // headline: one warmup pass over the whole suite, then 3 INTERLEAVED
    // reps with the per-query MIN reported and every rep + its GC delta
    // in the artifact — r10 committed a single-rep sweep whose heavy rows
    // (q10 6.5 s, q4 3.9 s) contradicted the same JVM's rep'd sections
    // (q10 min 1.02 s) and was un-adjudicable from the JSON alone; this
    // section was the last one violating the reps+min+gc house rule.
    // Disable with SPARK_GRAFT_BENCH_TPCH22=0.
    // Informational sweeps are wrapped: a crash in one must NOT kill the
    // headline artifact (round 7's driver bench lost its number exactly
    // this way — a loader regression threw inside the tpch22 sweep and the
    // whole process exited rc=1 with nothing recorded).
    // NonFatal only: an OutOfMemoryError or similar fatal JVM state must
    // kill the process rather than record a healthy-looking headline from
    // an unreliable JVM.
    def informational[A](label: String)(body: => Seq[A]): Seq[A] =
      try body catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] $label sweep failed, omitting: ${e.getMessage}")
          Nil
      }
    // Saved-table pair for the bucketed-layout paths: identical parquet
    // tables except for the bucketing spec. Bucket count is sized to the
    // DATA, not the core count: each bucket holds roughly one scan-task's
    // worth (~16 MB compressed here; ~128 MB at cluster scale) — 32
    // buckets over an 11 MB fact table measured SLOWER than shuffling.
    // Written lazily once; reused by the tpch22 bucketed mode, the layout
    // experiment, and the end-to-end sweep.
    // One-time cost of the bucketed layout (the two writeBucketed calls),
    // charged into the bucketed_e2e section's break-even arithmetic.
    var bucketedWriteSec: Double = -1.0
    lazy val bucketedTablesReady: Boolean =
      try {
        val factBytes =
          graft.ops.Pipeline.directoryBytes(spark, s"$sfDir/lineitem.parquet")
        val b = sys.env.get("SPARK_GRAFT_BENCH_BUCKETS").map(_.toInt)
          .getOrElse(math.max(4, (factBytes / (16L << 20)).toInt))
        val liSrc = Tables.load(spark, sfDir, "lineitem")
        val ordSrc = Tables.load(spark, sfDir, "orders")
        liSrc.write.mode("overwrite").format("parquet").saveAsTable("bench_li_p")
        ordSrc.write.mode("overwrite").format("parquet").saveAsTable("bench_ord_p")
        val t0 = System.nanoTime()
        Tables.writeBucketed(liSrc, "bench_li_b", b, "l_orderkey")
        Tables.writeBucketed(ordSrc, "bench_ord_b", b, "o_orderkey")
        bucketedWriteSec = (System.nanoTime() - t0) / 1e9
        true
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] bucketed table write failed: ${e.getMessage}")
          false
      }

    // SPARK_GRAFT_BUCKETED=1 routes the WHOLE tpch22 sweep over the
    // bucketed fact tables through the unmodified SparkEntry entry points
    // (Tables.overrides) — the reproducible end-to-end form of the
    // co-located-join claim, not just the side experiment.
    val tpch22Bucketed =
      sys.env.get("SPARK_GRAFT_BUCKETED").contains("1")
    val tpch22Raw: Seq[(String, Seq[Double], Seq[Long])] = informational("tpch22") {
      if (sys.env.get("SPARK_GRAFT_BENCH_TPCH22").contains("0")) Nil
      else {
        if (tpch22Bucketed && bucketedTablesReady) {
          Tables.overrides("lineitem") = spark.table("bench_li_b")
          Tables.overrides("orders") = spark.table("bench_ord_b")
        }
        val qs = graft.queries.TpchQueries.queries.keys.toSeq
          .sortBy(n => n.drop(1).takeWhile(_.isDigit).toInt)
        try {
          qs.foreach(q => Force.run(SparkEntry.queries(q)(spark, sfDir))) // warmup/codegen
          graft.ops.Pipeline.releaseCaches() // drop warmup pins (q15) so rep 1 executes, not cache-reads
          val acc = collection.mutable.Map(qs.map(_ -> Vector.empty[Double]): _*)
          val gcAcc = collection.mutable.Map(qs.map(_ -> Vector.empty[Long]): _*)
          (1 to 3).foreach { _ =>
            qs.foreach { q =>
              val (sec, gc) = timedRun(q)
              acc(q) :+= sec
              gcAcc(q) :+= gc
            }
          }
          // retry INSIDE the try: the bucketed-mode table overrides must
          // still be live when a flagged rep re-runs
          val (rows, prov) = retryFlagged("tpch22",
            qs.map(q => (q, acc(q): Seq[Double], gcAcc(q): Seq[Long])),
            timedRun, retryBudget)
          retryProv ++= prov
          rows
        } finally {
          Tables.overrides.remove("lineitem"); Tables.overrides.remove("orders")
        }
      }
    }
    // per-query min = steady-state cost; the total is a sum of mins
    val tpch22: Seq[(String, Double)] =
      tpch22Raw.map { case (q, reps, _) => q -> reps.min }

    // Informational LLM-pipeline sweep: representative beyond-reference
    // operators (dedup, similarity join, text filters, packing,
    // behavioral) — the throughput evidence for the non-TPC-H half of the
    // catalog, which the headline metric never touches. One warmup pass,
    // then 3 INTERLEAVED reps per query with the per-query MIN reported
    // (same discipline as the headline, same reason: r9's single-rep
    // sweep "showed" dd16 4.7→26 s and ta14 0.13→1.7 s while pl21 —
    // which composes ta14 — improved 5×; a single rep in a 24-query
    // sweep attributes environment stalls and cache evictions to
    // whichever query they land on). Raw reps go to the full artifact
    // (`llm_reps`) so median-vs-min noise stays diagnosable. Disable
    // with SPARK_GRAFT_BENCH_LLM=0.
    // dd3 (MinHash-LSH) is the timed similarity join — the scale path.
    // The exactness baselines are deliberately NOT here: dd7's global
    // PPJoin admits huge candidate sets on the shared-token word-salad
    // fixtures (measured 107 s at sf0.1 vs 3 s at sf0.01) and dd5's demo
    // blocking brute-forces inside blocks (26 s) — both are documented as
    // oracle baselines whose 100 TB path is dd3/dd12, and a minutes-long
    // informational entry would dominate the whole bench run. dd23
    // (signal agreement) left the suite in round 16 for the same reason:
    // its signals deliberately reuse the dd5/dd15 BASELINE generators
    // (trigram Jaccard + containment — the methodology audit compares
    // against exact truth, that is its point), so its honest Force-timed
    // cost is the baselines' quadratic 18 s, which would be a third of
    // llm_total while measuring the generators the suite already
    // excludes. Round 17 restores the timed row as dd27: the SAME
    // agreement matrix composed over the bucketed scale-path signals
    // (exact/prefix md5 equi-joins + dd3's MinHash-LSH + dd8's SimHash
    // buckets) — the 100 TB form, every input shuffle-keyed, never n².
    // Each rep also records its stop-the-world GC delta (`llm_gc_ms` in
    // the artifact): a rep-2-style stall cluster (r10 saw dd16 39.1 s in
    // one rep) is then attributable from the JSON alone — fat gc_ms on
    // the blown rep says heap churn, flat gc_ms says external stall.
    // --- ss20 train/serve split (round 18) -------------------------------
    // The old ss20_ivfpq_topk llm row bundled PQ codebook TRAINING
    // (k-means — once-per-corpus at 100 TB) with query SERVING, so the
    // per-query figure misstated the serve cost and the training job was
    // the stall source in two consecutive gated captures. Split: the
    // model is trained ONCE into its own pin scope (which the per-rep
    // releaseCaches cannot touch — the scoped-pinning contract), serve
    // reps probe the pinned code frame, and training cost is its own
    // gated section (`ss20_train`: reps + min + gc + stall sentinel,
    // fresh scope per rep released outside the timed window).
    // `ss20_ivfpq_topk` (the composed one-call form) stays the
    // oracle-checked catalog entry; it is not re-timed here.
    val ss20Scope = new graft.ops.Pipeline.PinScope
    var ss20Model: Option[graft.ops.Similarity.IvfPqModel] = None
    // Parameters track the catalog entry's round-19 adopted operating
    // point (nprobe=4, m=8, cb=32 — see the ss20_ivfpq_topk keep-note):
    // measured at 32g/sf0.1, ss20_serve moved 0.91–0.98 → ~1.48 s and
    // ss20_train 1.7–1.9 → ~2.8 s for recall_l2@20 0.835 → 0.934, so
    // compare the two rows across the r18→r19 boundary
    // per-configuration, not per-row.
    def ss20Train(): graft.ops.Similarity.IvfPqModel =
      graft.ops.Similarity.ivfPqTrain(
        Tables.embeddings(spark, sfDir), "vec_id", "embedding",
        dim = 64, numCoarse = 8, m = 8, codebookSize = 32, updates = 1)
    def ss20Trained(): graft.ops.Similarity.IvfPqModel =
      ss20Model.getOrElse {
        val mdl = graft.ops.Pipeline.withScope(ss20Scope)(ss20Train())
        Force.run(mdl.encoded) // materialize the code frame train-side
        // serving reads only the code frame; the corpus-sized residual
        // cache would otherwise sit in memory across the whole llm
        // sweep, competing under LRU with the cached tables the timed
        // reps read (r18 review) — drop it once the codes exist
        mdl.residuals.unpersist(blocking = false)
        ss20Model = Some(mdl)
        mdl
      }
    def ss20ServePlan(): DataFrame = {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(spark, sfDir)
      graft.ops.Similarity.ivfPqServe(
        emb.filter(col("vec_id") < 20), ss20Trained(),
        "vec_id", "embedding", 5, nprobe = 4)
    }
    // One timed end-to-end training run: coarse collect + residual
    // materialization + Lloyd rounds + encoded-frame materialization,
    // pinned into a throwaway scope released AFTER the timed window.
    // MUST run only after ss20Scope is released: Spark's cache manager
    // matches plan-identical frames, so a still-cached serve model
    // would turn this run into a cache read (not a training run) and
    // this scope.release() would unpersist the serve model's frames
    // (r18 review finding).
    def ss20TrainTimed(): (Double, Long) = {
      // Machine-check of the must-run-after-release ordering (round-19
      // advice — it previously lived only in comments): a still-pinned
      // serve model would turn this "training" run into a
      // plan-identical cache READ, and this scope's release would then
      // unpersist the serve model out from under any later consumer.
      // Both halves checked: the scope queue is drained AND the model's
      // encoded frame has actually left the cache manager (release()
      // removes entries synchronously even with blocking=false).
      require(ss20Scope.isEmpty && ss20Model.forall(
          _.encoded.storageLevel == org.apache.spark.storage.StorageLevel.NONE),
        "ss20TrainTimed must run only after ss20Scope.release(): a " +
          "cached plan-identical serve model would make this a cache " +
          "read, and releasing the throwaway scope would unpersist the " +
          "serve model (r18 cache-identity finding)")
      val scope = new graft.ops.Pipeline.PinScope
      val r = timedBody {
        val mdl = graft.ops.Pipeline.withScope(scope)(ss20Train())
        Force.run(mdl.encoded)
      }
      scope.release()
      r
    }

    val llmRepsFull: Seq[(String, Seq[Double], Seq[Long])] = informational("llm") {
      if (sys.env.get("SPARK_GRAFT_BENCH_LLM").contains("0")) Nil
      else {
        val suite = Seq(
        "dd1_exact_dedup", "dd3_minhash_dup_pairs", "dd12_repeated_chunks",
        "dd16_sorted_neighborhood",
        "ta2_quality_score", "ta16_gopher_rules", "ta14_boilerplate_strip",
        "ta18_sentence_dedup",
        "ss4_ivf_topk", "pl3_context_packing", "ev5_transition_matrix",
        "ev16_rolling_wau",
        // the composed flagship (quality+dedup+decontamination+balance
        // in one plan) and the batch sessionizer — both late-round-7
        "pl21_corpus_pipeline", "ev18_sessions",
        // round-9 additions: the Bloom exact-dup ingest gate, the
        // multi-signal agreement audit, scene cuts, the shard planner,
        // and the lexical-diversity audit
        "dd22_bloom_ingest_gate",
        "mm7_scene_cuts", "pl26_shard_plan", "ta26_lexical_diversity",
        "ss18_mmr_topk", "dd24_semantic_decontamination",
        "ss19_rocchio_expand", "pl27_source_interleave",
        // the crawl-admission flagship (all three ingest gates composed)
        "dd25_ingest_pipeline",
        // round-20 addition: the payload-slimmed sorted-neighborhood
        // path (xxhash64 grams, 8 B/gram through the id-join exchanges)
        // cataloged as dd28 in the r20 build — timed NEXT TO dd16 so the
        // string-oracle form and the shipped 100 TB form stay comparable
        // in every capture (ABRW "dd16hash" measured the pair at
        // 1.37–1.39× across ×1/×10/×30; llm_total grows by this row's
        // cost at the r19→r20 boundary — compare per-query)
        "dd28_sorted_neighborhood_hashed",
        // round-10 additions: span-level dedup, the source-cap/
        // contribution-cap balancers, and the IVF-PQ SERVE row —
        // round 18 split the old ss20_ivfpq_topk bundle: codebook
        // training (once-per-corpus at 100 TB, and the stall source in
        // the r16+r17 gated captures) is timed separately as
        // `ss20_train`; this row is the per-query serve cost against
        // the pinned trained model (scoped pins keep the model alive
        // across the per-rep releaseCaches)
        "dd26_dup_spans", "pl29_source_caps", "ev26_contribution_cap",
        "ss20_serve",
        // round-17 addition: the scale-path signal-agreement matrix
        // (dd23's timed dual over bucketed signals — see the dd23 note)
        "dd27_lsh_signal_agreement")
        // ss20_serve resolves through the shared model; every other row
        // is its unmodified SparkEntry catalog entry
        def llmPlan(q: String): DataFrame =
          if (q == "ss20_serve") ss20ServePlan()
          else SparkEntry.queries(q)(spark, sfDir)
        // warmup pass (plan + codegen for every query, so rep 1 of query
        // 1 doesn't pay a JIT storm its neighbors skip); ss20_serve's
        // warmup also trains+pins the model it serves against
        suite.foreach { q =>
          Force.run(llmPlan(q))
          graft.ops.Pipeline.releaseCaches()
        }
        val acc = collection.mutable.Map(suite.map(_ -> Vector.empty[Double]): _*)
        val gcAcc = collection.mutable.Map(suite.map(_ -> Vector.empty[Long]): _*)
        // the shared `timed` discipline, routed through llmPlan; caches
        // released AFTER the timed window, exactly like timedRun
        def llmRun(q: String): (Double, Long) = {
          val r = timedBody(Force.run(llmPlan(q)))
          graft.ops.Pipeline.releaseCaches()
          r
        }
        (1 to 3).foreach { _ =>
          suite.foreach { q =>
            val (sec, gc) = llmRun(q)
            acc(q) :+= sec
            gcAcc(q) :+= gc
          }
        }
        val (rows, prov) = retryFlagged("llm",
          suite.map(q => (q, acc(q): Seq[Double], gcAcc(q): Seq[Long])),
          llmRun, retryBudget)
        retryProv ++= prov
        rows
      }
    }
    // The serve model's pins are no longer needed once the llm sweep
    // (including its retries) has run — and they MUST be gone before
    // the training rows below: a still-cached plan-identical model
    // would turn the training warmup into a cache read and let its
    // throwaway scope release unpersist the model (r18 review finding;
    // Spark's cache manager matches by canonicalized plan).
    ss20Scope.release()
    // Gated training rows: same reps+min+gc+retry discipline as every
    // timed section. Runs AFTER the llm sweep so its throwaway training
    // scopes never interleave with serve reps; shares the llm kill
    // switch (train and serve are the two halves of one split row).
    val ss20TrainRaw: Seq[(String, Seq[Double], Seq[Long])] =
      informational("ss20_train") {
        if (sys.env.get("SPARK_GRAFT_BENCH_LLM").contains("0")) Nil
        else {
          ss20TrainTimed() // warmup (training-plan codegen)
          val reps = (1 to 3).map(_ => ss20TrainTimed())
          val rows0 = Seq(("ss20_train",
            reps.map(_._1): Seq[Double], reps.map(_._2): Seq[Long]))
          val (rows, prov) = retryFlagged("ss20_train", rows0,
            _ => ss20TrainTimed(), retryBudget)
          retryProv ++= prov
          rows
        }
      }
    val llmRepsRaw: Seq[(String, Seq[Double])] =
      llmRepsFull.map { case (q, reps, _) => (q, reps) }
    // Per-query MIN is the reported number (steady-state cost; immune to
    // the one-sided stalls a 24-query sweep accumulates).
    val llmSuite: Seq[(String, Double)] = llmRepsRaw.map { case (q, reps) => q -> reps.min }

    // (The r9/r10 `tpch_repd` two-query subset is gone: it existed only
    // because the full tpch22 sweep was single-rep, and the sweep now
    // carries the same reps+min+gc discipline for every query.)

    // Bucketed-layout experiment on the two fact-to-fact queries, measured
    // apples-to-apples (the r2 numbers were not: plain read startup-cached
    // tables while bucketed read freshly written ones, and AQE could
    // broadcast the small cached side — so the comparison said nothing
    // about exchanges). Both variants here:
    //   - read UNCACHED parquet tables freshly written to the warehouse,
    //     identical except for the bucketing spec;
    //   - run with autoBroadcastJoinThreshold=-1, because the 100 TB
    //     question bucketing answers is "fact⋈fact where neither side can
    //     broadcast" — at fixture SF AQE would otherwise broadcast orders
    //     and hide the layout entirely;
    //   - are gated on plan shape: the bucketed variant must execute with
    //     strictly fewer shuffle exchanges than the shuffled one (the
    //     fact-join Exchange pair gone), else nothing is reported.
    // Reported as `bucketed` vs its true baseline `shuffled`; neither is
    // part of `value`. Disable with SPARK_GRAFT_BENCH_BUCKETED=0.
    val layout: Option[(Seq[(String, Seq[Double])], Seq[(String, Seq[Double])])] =
      if (sys.env.get("SPARK_GRAFT_BENCH_BUCKETED").contains("0")) None
      else try {
        require(bucketedTablesReady, "bucketed tables unavailable")
        val cust = Tables.load(spark, sfDir, "customer")
        val nat = Tables.load(spark, sfDir, "nation")
        def runs(li: DataFrame, ord: DataFrame): Seq[(String, () => DataFrame)] = Seq(
          "q3_shipping_priority" ->
            (() => graft.queries.TpchQueries.q3Body(li, ord, cust)),
          "q10_returned_items" ->
            (() => graft.queries.TpchQueries.q10Body(li, ord, cust, nat)))
        val shuffled = runs(spark.table("bench_li_p"), spark.table("bench_ord_p"))
        val bucketed = runs(spark.table("bench_li_b"), spark.table("bench_ord_b"))
        val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          // Warmup both variants; the warmup run doubles as the plan gate.
          // The gate executes the inspected Dataset itself (count() would
          // spawn a separate QueryExecution and leave this one's adaptive
          // plan un-finalized) and counts real ShuffleExchange nodes in the
          // FINAL adaptive plan — not substring hits, which also match
          // Broadcast/ReusedExchange.
          import org.apache.spark.sql.execution.SparkPlan
          import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
          import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
          def countShuffles(p: SparkPlan): Int = p match {
            case a: AdaptiveSparkPlanExec => countShuffles(a.executedPlan)
            case q: QueryStageExec => countShuffles(q.plan)
            case s: ShuffleExchangeLike =>
              1 + s.children.map(countShuffles).sum
            case other => other.children.map(countShuffles).sum
          }
          def exchanges(f: () => DataFrame): Int = {
            val df = f(); df.collect()
            countShuffles(df.queryExecution.executedPlan)
          }
          val gate = (shuffled zip bucketed).map { case ((q, sf_), (_, bf)) =>
            (q, exchanges(sf_), exchanges(bf))
          }
          val bad = gate.filter { case (_, s, bk) => bk >= s }
          if (bad.nonEmpty) {
            System.err.println(
              s"[bench] bucketed plans not exchange-reduced, not reporting: $bad")
            None
          } else {
            // 3 reps, report the min (plus the raw reps for the
            // artifact): single runs at these magnitudes are dominated by
            // GC/JIT noise (driver r2/r3 runs swung 2× between rounds);
            // min-of-3 is the steady-state cost of each layout.
            def time(rs: Seq[(String, () => DataFrame)]) = rs.map { case (k, f) =>
              val reps = (1 to 3).map { _ =>
                val t0 = System.nanoTime()
                Force.run(f())
                (System.nanoTime() - t0) / 1e9
              }
              (k, reps)
            }
            Some((time(shuffled), time(bucketed)))
          }
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      } catch {
        case e: Exception =>
          System.err.println(s"[bench] bucketed mode failed: ${e.getMessage}")
          None
      }

    // End-to-end bucketed sweep: the two fact⋈fact queries through the
    // UNMODIFIED SparkEntry.queries entry points (not the q3Body/q10Body
    // harness), with lineitem/orders resolved via Tables.overrides to the
    // plain vs bucketed saved tables — proving the co-located-join win
    // survives the real query path, not just the side experiment. Both
    // legs read fresh uncached fact tables (dims stay cached in both);
    // broadcast disabled for the same reason as the layout experiment.
    // Reported as `e2e_plain`/`e2e_bucketed`; min-of-3 per query.
    val bucketedE2e: Seq[(String, Double)] = informational("bucketed_e2e") {
      if (sys.env.get("SPARK_GRAFT_BENCH_BUCKETED").contains("0") ||
          !bucketedTablesReady) Nil
      else {
        val qs = Seq("q3_shipping_priority", "q10_returned_items")
        val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          def leg(li: String, ord: String, suffix: String): Seq[(String, Double)] = {
            Tables.overrides("lineitem") = spark.table(li)
            Tables.overrides("orders") = spark.table(ord)
            try qs.map { q =>
              Force.run(SparkEntry.queries(q)(spark, sfDir)) // warmup/codegen
              val reps = (1 to 3).map { _ =>
                val t0 = System.nanoTime()
                Force.run(SparkEntry.queries(q)(spark, sfDir))
                (System.nanoTime() - t0) / 1e9
              }
              s"${q}_$suffix" -> reps.min
            } finally {
              Tables.overrides.remove("lineitem"); Tables.overrides.remove("orders")
            }
          }
          leg("bench_li_p", "bench_ord_p", "e2e_plain") ++
            leg("bench_li_b", "bench_ord_b", "e2e_bucketed")
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      }
    }

    // Materialized-partsupp experiment: the 5 partsupp-family TPC-H
    // queries run their derived-view CTE (a full lineitem group-by) once
    // PER QUERY in the tpch22 sweep — correct for the oracle contract,
    // but SCALE.md's deployment story is "materialize partsupp ONCE,
    // reuse". This measures that story: same query bodies, `partsupp`
    // now a cached materialized temp view (materialization time charged
    // to `partsupp_build`), vs their CTE forms. Informational; disable
    // with SPARK_GRAFT_BENCH_PSMAT=0.
    // Materialize-once is now the DEFAULT Spark path (Tables.registerAll
    // registers a cached partsupp; the q2/q9/q11/q16/q20 entries run raw
    // bodies against it). This experiment keeps the comparison honest by
    // timing the old per-query-CTE form (the oracle text, which carries
    // the derivation inline) against the default path, plus the one-time
    // materialization cost it amortizes.
    val psmat: Seq[(String, Double)] = informational("psmat") {
      if (sys.env.get("SPARK_GRAFT_BENCH_PSMAT").contains("0")) Nil
      else {
        import graft.queries.TpchQueries
        Tables.registerAll(spark, sfDir)
        // min-of-2 per query: the r10 full run recorded cte 3.2 s vs
        // materialized 4.4 s — inverting r9's 7.1 vs 3.0 — purely from
        // single-rep noise; same discipline as every other section now.
        def timeAll(run: String => org.apache.spark.sql.DataFrame): Double =
          TpchQueries.partsuppRaw.keys.toSeq.sorted.map { q =>
            Force.run(run(q)) // warmup/codegen
            (1 to 2).map { _ =>
              val t0 = System.nanoTime()
              Force.run(run(q))
              (System.nanoTime() - t0) / 1e9
            }.min
          }.sum
        // CTE leg: the oracle text re-derives partsupp inside every query
        // (twice for q11's HAVING scalar subquery) — what each execution
        // paid before materialize-once became the default.
        val cte = timeAll(q => spark.sql(TpchQueries.oracle(q)))
        // Cold-build leg: drop the memoized cache first, else the timed
        // materialization plan-matches the live InMemoryRelation and
        // measures nothing.
        Tables.invalidatePartsupp(spark, sfDir)
        val t0 = System.nanoTime()
        Tables.partsupp(spark, sfDir).count()
        val build = (System.nanoTime() - t0) / 1e9
        Tables.registerAll(spark, sfDir)
        val mat = timeAll(q => SparkEntry.queries(q)(spark, sfDir))
        Seq("partsupp_cte_total" -> cte, "partsupp_build" -> build,
          "partsupp_materialized_total" -> mat)
      }
    }

    // Skew-join experiment: synthesize the adversarial 99%-hot-key fact
    // join (99% of lineitem rows collapse onto one key) and measure three
    // physical strategies on IDENTICAL inputs, broadcast disabled (the
    // 100 TB question is fact⋈dim-too-big-to-broadcast under skew):
    //   naive  — sort-merge join, AQE fully off: one reducer owns the hot
    //            key, the straggler the other strategies exist to kill;
    //   aqe    — AQE skew-join ON with thresholds scaled to fixture size
    //            (production tunes the same knobs relative to partition
    //            sizes): runtime split of the oversized partition;
    //   salted — explicit (key, salt-of-32) rewrite via Joins.saltedUniform
    //            (round-robin salt: the hot key's rows are byte-identical
    //            in no column, but uniform spreading is the general tool).
    // Gated on result-count equality across strategies — a strategy that
    // changes the answer reports nothing. Informational; min-of-2 per
    // strategy. Disable with SPARK_GRAFT_BENCH_SKEW=0.
    //
    // Measured finding (sf0.1, 99% hot key ≈ 594k rows ≈ 30 MB): naive
    // 0.46 s, aqe 0.42 s, salted 0.49 s — the fixture sits BELOW the
    // skew crossover: one task absorbs the hot partition well inside its
    // budget, so AQE's split is near-free and salting's replicated-dim
    // exchange is pure overhead. That ordering is itself the lesson the
    // experiment exists to teach: salt only when the hot key EXCEEDS a
    // task's budget (at 100 TB a single hot key can be hundreds of GB —
    // 1000× past the crossover), and prefer AQE's runtime split until
    // then. SCALE.md §skew carries the full decision rule.
    val skew: Seq[(String, Double)] = informational("skew") {
      if (sys.env.get("SPARK_GRAFT_BENCH_SKEW").contains("0")) Nil
      else {
        import org.apache.spark.sql.functions._
        // 99% of fact rows collapse onto key 1; the dim stays SMALL
        // (~1% of order keys + the hot key) so the replicated-dim cost
        // of salting is the operator's own overhead, not an artifact of
        // replicating a fact-sized table.
        def key(c: String) =
          when(col(c) % 100 < 99, lit(1L)).otherwise(col(c))
        val li = Tables.load(spark, sfDir, "lineitem")
          .select(key("l_orderkey").as("skew_key"), col("l_extendedprice"))
        val dim = Tables.load(spark, sfDir, "orders")
          .select(key("o_orderkey").as("skew_key")).distinct()
          .withColumn("dim_payload", col("skew_key") * 2L)
        val confKeys = Seq(
          "spark.sql.adaptive.enabled",
          "spark.sql.autoBroadcastJoinThreshold",
          "spark.sql.adaptive.skewJoin.enabled",
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes",
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        val saved = confKeys.map(k => k -> spark.conf.getOption(k))
        def leg(confs: Map[String, String])(result: => Long): (Long, Double) =
          try {
            confs.foreach { case (k, v) => spark.conf.set(k, v) }
            result // warmup, and the count the equality gate checks
            val reps = (1 to 2).map { _ =>
              val t0 = System.nanoTime()
              val n = result
              (n, (System.nanoTime() - t0) / 1e9)
            }
            (reps.head._1, reps.map(_._2).min)
          } finally saved.foreach {
            case (k, Some(v)) => spark.conf.set(k, v)
            case (k, None)    => spark.conf.unset(k)
          }
        val off = Map(
          "spark.sql.adaptive.enabled" -> "false",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1")
        val (nNaive, tNaive) = leg(off)(Force.run(li.join(dim, "skew_key")))
        val (nAqe, tAqe) = leg(Map(
          "spark.sql.adaptive.enabled" -> "true",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1",
          "spark.sql.adaptive.skewJoin.enabled" -> "true",
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1m",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1m",
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2"))(
          Force.run(li.join(dim, "skew_key")))
        val (nSalt, tSalt) = leg(off)(
          Force.run(graft.ops.Joins.saltedUniform(li, dim, "skew_key",
            "skew_key", salt = 16)))
        if (nNaive != nAqe || nNaive != nSalt) {
          System.err.println(
            s"[bench] skew legs disagree on rows ($nNaive/$nAqe/$nSalt), not reporting")
          Nil
        } else Seq("skew_naive" -> tNaive, "skew_aqe" -> tAqe,
          "skew_salted" -> tSalt)
      }
    }

    def jsonMap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def jsonRepMap(kvs: Seq[(String, Seq[Double])]): String =
      kvs.map { case (k, vs) =>
        "\"" + k + "\":" + vs.map(v => f"$v%.4f").mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val repsField = jsonRepMap(timed.map { case (q, reps, _) => (q, reps) })
    // artifact-schema continuity: headline gc_ms stays the per-query SUM
    // across reps (as in every prior round); the per-rep values feed the
    // stall sentinel below.
    val gcField = jsonMap(timed.map { case (q, _, gcMs) => (q, gcMs.sum.toDouble) })
    val minField = jsonMap(mins)
    def jsonGcMap(kvs: Seq[(String, Seq[Long])]): String =
      kvs.map { case (k, vs) =>
        "\"" + k + "\":" + vs.mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    val tpch22Field =
      if (tpch22.isEmpty) ""
      else s""","tpch22_total":${tpch22.map(_._2).sum},"tpch22":${jsonMap(tpch22)}""" +
        s""","tpch22_reps":${jsonRepMap(tpch22Raw.map { case (q, r, _) => (q, r) })}""" +
        s""","tpch22_gc_ms":${jsonGcMap(tpch22Raw.map { case (q, _, g) => (q, g) })}"""
    val llmField =
      if (llmSuite.isEmpty) ""
      else s""","llm_total":${llmSuite.map(_._2).sum},"llm":${jsonMap(llmSuite)}""" +
        s""","llm_reps":${jsonRepMap(llmRepsRaw)}""" +
        s""","llm_gc_ms":${jsonGcMap(llmRepsFull.map { case (q, _, g) => (q, g) })}"""
    val ss20TrainField =
      if (ss20TrainRaw.isEmpty) ""
      else {
        val (_, reps, gcs) = ss20TrainRaw.head
        s""","ss20_train_sec":${reps.min}""" +
          s""","ss20_train_reps":${reps.map(r => f"$r%.4f").mkString("[", ",", "]")}""" +
          s""","ss20_train_gc_ms":${gcs.mkString("[", ",", "]")}"""
      }
    val skewField =
      if (skew.isEmpty) "" else s""","skew":${jsonMap(skew)}"""
    val psmatField =
      if (psmat.isEmpty) "" else s""","psmat":${jsonMap(psmat)}"""
    val layoutField = layout.map { case (sh, bk) =>
      s""","shuffled":${jsonMap(sh.map { case (k, r) => (k, r.min) })}""" +
      s""","bucketed":${jsonMap(bk.map { case (k, r) => (k, r.min) })}""" +
      s""","shuffled_reps":${jsonRepMap(sh)},"bucketed_reps":${jsonRepMap(bk)}"""
    }.getOrElse("")
    // bucketed_write_sec sits next to the e2e numbers so the artifact
    // itself carries the amortization arithmetic: the bucketed legs are
    // only wins once the one-time layout cost divides over enough reads
    // (r10 verdict flagged the raw juxtaposition as misleading).
    val e2eField =
      if (bucketedE2e.isEmpty) ""
      else s""","bucketed_e2e":${jsonMap(bucketedE2e)}""" +
        (if (bucketedWriteSec >= 0)
           s""","bucketed_write_sec":$bucketedWriteSec""" else "")
    val layoutTag =
      if (tpch22Bucketed) s""","tpch22_layout":"bucketed"""" else ""
    // Stall sentinel over every rep'd section (thresholds + rationale on
    // the stallFlags method, which BenchSentinelSpec pins). Flags are
    // computed on the POST-retry reps — a capture that converged via
    // retryFlagged reads clean here, and the contamination-and-recovery
    // history lives in stall_retries.
    val allFlags =
      stallFlags("headline", timed) ++
      stallFlags("tpch22", tpch22Raw) ++
      stallFlags("llm", llmRepsFull) ++
      stallFlags("ss20_train", ss20TrainRaw)
    val retries = retryProv.result()
    val stallField =
      s""","stall_flag_count":${allFlags.size}""" +
        s""","stall_flags":${allFlags.mkString("[", ",", "]")}""" +
        s""","stall_retry_count":${retries.size}""" +
        s""","stall_retries":${retries.mkString("[", ",", "]")}"""
    // sf is the NUMERIC scale factor (matching the driver's BENCH_r{N}
    // encoding — the r12 advice flagged the path-vs-number mismatch);
    // the directory travels separately as sf_dir.
    val sfNum = "sf([0-9.]+)/?$".r.findFirstMatchIn(sfDir).map(_.group(1))
    val sfField = sfNum.getOrElse("\"" + sfDir + "\"")
    val totalMin = mins.map(_._2).sum
    // stdout carries the STRICT contract line only — exactly the five
    // documented fields {metric,value,unit,queries,sf}, nothing else:
    // r8's full line outgrew the driver's log-scrape window and r9's slim
    // line still carried value_min/queries_min beyond the documented
    // shape; both rounds recorded `"parsed": null`. Every extra field
    // (min, reps, gc, informational sections) lives in BENCH_LAST.json.
    val slim =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${jsonMap(results)},"sf":$sfField}"""
    val full =
      s"""{"metric":"total","value":$total,"value_min":$totalMin,"unit":"sec","queries":${jsonMap(results)},"queries_min":$minField,"reps":$repsField,"gc_ms":$gcField$tpch22Field$layoutTag$llmField$ss20TrainField$psmatField$skewField$layoutField$e2eField$stallField,"sf":$sfField,"sf_dir":"$sfDir"}"""
    println(slim)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LAST.json"), full + "\n")
    spark.stop()
  }
}
