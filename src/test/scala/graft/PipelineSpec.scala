package graft

import org.apache.spark.sql.functions._
import graft.ops.Pipeline
import graft.sources.Tables

/** Invariants for the training-pipeline utilities. */
class PipelineSpec extends GraftSuite {

  private lazy val docs = Tables.documents(spark, sf)

  test("mixture sampling keeps the binding source whole and is reproducible") {
    val target = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)
    val mixed = Pipeline.mixtureSample(docs, "source", target, seed = 11L)
    val got = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // only requested sources survive
    assert(got.keySet.subsetOf(target.keySet))
    val have = docs.filter(col("source").isin(target.keys.toSeq: _*))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // equal availability + largest share → src0 binds and is kept WHOLE
    assert(got("src0") === have("src0"))
    // downsampled sources never exceed availability or the binding source
    got.foreach { case (s, n) => assert(n <= have(s)) }
    // seeded: bit-for-bit reproducible
    val again = Pipeline.mixtureSample(docs, "source", target, seed = 11L)
    assert(mixed.exceptAll(again).count() === 0)
    assert(again.exceptAll(mixed).count() === 0)
  }

  test("split assignment is deterministic, exhaustive, and proportional") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = Pipeline.assignSplit(docs, col("doc_id"), seed = 7L, splits)
    // exhaustive: every row gets exactly one valid split label
    val bymSplit = assigned.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bymSplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bymSplit.values.sum === docs.count())
    // proportional within a loose tolerance at fixture size
    val n = docs.count().toDouble
    assert(math.abs(bymSplit("train") / n - 0.8) < 0.1, bymSplit)
    // deterministic: same seed → identical assignment; the split is a
    // pure function of the KEY, so repartitioning cannot move rows
    // (unlike randomSplit)
    val again = Pipeline.assignSplit(
      docs.repartition(7), col("doc_id"), seed = 7L, splits)
    assert(assigned.select("doc_id", "split")
      .exceptAll(again.select("doc_id", "split")).count() === 0)
    // different seed → a different permutation
    val other = Pipeline.assignSplit(docs, col("doc_id"), seed = 8L, splits)
    assert(assigned.select("doc_id", "split")
      .exceptAll(other.select("doc_id", "split")).count() > 0)
  }

  test("observe metrics count rows and violations on the producing scan") {
    val observed = Pipeline.withQualityMetrics(
      docs, "quality",
      "n_rows" -> count(lit(1)),
      "null_text" -> count(when(col("text").isNull, 1)),
      "bad_lang" -> count(when(!col("lang").isin("en", "de", "fr", "es", "zh"), 1)))
    // collect() on the DERIVED frame: metrics attach to the QueryExecution
    // that actually ran (df.count() would spawn a separate one and leave
    // this plan's metrics empty — same trap as the bench plan gate)
    val out = observed.filter(col("n_chars") > 0)
    val produced = out.collect().length.toLong
    val m = Pipeline.observedMetrics(out, "quality")
    assert(m("n_rows") === docs.count())
    assert(m("null_text") === 0L)
    assert(m("bad_lang") === 0L)
    assert(produced > 0)
  }

  test("compaction rewrites many small files into size-targeted ones") {
    import java.nio.file.Files
    val inDir = Files.createTempDirectory("graft-frag-").toString
    // fragment the docs table into many tiny files
    docs.repartition(64).write.mode("overwrite").parquet(inDir)
    val nIn = new java.io.File(inDir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nIn >= 32, s"expected a fragmented input, got $nIn files")
    val outDir = Files.createTempDirectory("graft-compact-").toString
    val inputBytes = new java.io.File(inDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val target = inputBytes / 4 // aim for ~4 output files
    val parts = Pipeline.compact(spark, inDir, outDir, target)
    val outFiles = new java.io.File(outDir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts >= 4 && parts <= 6, s"parts=$parts")
    assert(outFiles === parts, s"outFiles=$outFiles parts=$parts")
    // content unchanged
    assert(spark.read.parquet(outDir).exceptAll(docs).count() === 0)
    assert(docs.exceptAll(spark.read.parquet(outDir)).count() === 0)
  }

  test("token chunking covers every token with the declared overlap") {
    val chunkSize = 64; val stride = 48
    val chunks = Pipeline.chunkByTokens(
        docs, col("doc_id"), col("text"), chunkSize, stride)
      .collect()
      .groupBy(_.getLong(0))
    val tokenCounts = docs
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(chunks.keySet === tokenCounts.keySet)
    chunks.foreach { case (docId, rows) =>
      val n = tokenCounts(docId)
      val byIdx = rows.sortBy(_.getInt(1))
      // chunk indices are dense from 0 and the count is the stride formula
      assert(byIdx.map(_.getInt(1)).toSeq === (0 until rows.length))
      assert(rows.length === (n - 1) / stride + 1)
      byIdx.zipWithIndex.foreach { case (r, i) =>
        // every chunk holds exactly the tokens from its start to
        // min(start + chunkSize, n) — so consecutive chunks overlap by
        // chunkSize - stride tokens and the union covers 0 until n
        assert(r.getInt(2) === math.min(i * stride + chunkSize, n) - i * stride)
      }
      val lastStart = (rows.length - 1) * stride
      assert(lastStart < n && lastStart + chunkSize >= n)
    }
  }

  test("stratified sample hits requested per-stratum rates (±tolerance)") {
    val fr = Map("en" -> 0.8, "de" -> 0.2, "fr" -> 0.5, "es" -> 0.5, "zh" -> 0.5)
    val sampled = Pipeline.stratifiedSample(docs, "lang", fr, seed = 42L)
    val rates = sampled.groupBy("lang").agg(count(lit(1)).as("n"))
      .join(docs.groupBy("lang").agg(count(lit(1)).as("total")), "lang")
      .withColumn("rate", col("n").cast("double") / col("total"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rate")).toMap
    fr.foreach { case (k, f) =>
      assert(math.abs(rates.getOrElse(k, 0.0) - f) < 0.25,
        s"stratum $k rate ${rates.get(k)} vs $f")
    }
  }

  test("stratified sample is reproducible for a fixed seed") {
    val fr = Map("en" -> 0.5, "de" -> 0.5, "fr" -> 0.5, "es" -> 0.5, "zh" -> 0.5)
    val a = Pipeline.stratifiedSample(docs, "lang", fr, 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Pipeline.stratifiedSample(docs, "lang", fr, 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("deterministic shuffle is a stable permutation") {
    val base = docs.select("doc_id")
    val s1 = Pipeline.deterministicShuffle(base, 13L, col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    val s2 = Pipeline.deterministicShuffle(base, 13L, col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(s1 === s2, "same seed must give the same order")
    assert(s1.sorted === base.collect().map(_.getLong(0)).toSeq.sorted)
    val other = Pipeline.deterministicShuffle(base, 14L, col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(s1 !== other, "different seeds should permute differently")
  }

  test("two-phase packing matches the naive global-window prefix sum") {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col("doc_id"),
      graft.ops.TextAnalysis.wsTokenCount(col("text")).as("n_tokens"))
    val fast = Pipeline.packByTokenBudget(
        base, col("doc_id"), col("n_tokens"), budget = 8192)
      .orderBy("doc_id").select("doc_id", "cum_tokens", "bin")
      .collect().toSeq
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = base
      .withColumn("cum_tokens", sum(col("n_tokens").cast("long")).over(w))
      .withColumn("bin",
        floor((col("cum_tokens") - col("n_tokens")).cast("double") / 8192)
          .cast("int"))
      .orderBy("doc_id").select("doc_id", "cum_tokens", "bin")
      .collect().toSeq
    assert(fast === naive)
  }

  test("exact-k per stratum: exact sizes, deterministic, layout-stable") {
    val have = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val s1 = Pipeline.exactKPerStratum(docs, "source", 10, 7L, col("doc_id"))
    val sizes = s1.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // EXACTLY min(k, |stratum|) per stratum — not "approximately"
    assert(sizes === have.map { case (k, n) => k -> math.min(10L, n) })
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    // pure function of (seed, key): identical on any partitioning
    val ids2 = Pipeline.exactKPerStratum(
        docs.repartition(13), "source", 10, 7L, col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
    // a different seed picks a (virtually surely) different sample
    val ids3 = Pipeline.exactKPerStratum(docs, "source", 10, 8L, col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 !== ids3)
  }

  test("weighted sample: exact k, deterministic, weight-monotone") {
    import spark.implicits._
    val s1 = Pipeline.weightedSample(
      docs, k = 50, seed = 3L, col("n_chars"), col("doc_id"))
    assert(s1.count() === 50)
    // pure function of (seed, key, weight): identical on any layout
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Pipeline.weightedSample(
        docs.repartition(11), k = 50, seed = 3L,
        col("n_chars"), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
    // a dominant weight is (effectively) always selected: u^(1/w) → 1
    // as w grows, while unit-weight keys stay uniform
    (1L to 5L).foreach { seed =>
      val rows = (0L until 100L).map(i => (i, if (i == 42L) 1e6 else 1.0))
        .toDF("id", "w")
      val picked = Pipeline.weightedSample(rows, k = 10, seed, col("w"),
          col("id"))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(picked.contains(42L), s"seed $seed")
      assert(picked.size === 10)
    }
    // zero/negative weights are excluded outright
    val withZero = Seq((1L, 0.0), (2L, -3.0), (3L, 2.0)).toDF("id", "w")
    val kept = Pipeline.weightedSample(withZero, 3, 1L, col("w"), col("id"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L))
  }

  test("releaseCaches frees the prefix-sum's pinned frames after the action") {
    val cm = spark.sharedState.cacheManager
    Pipeline.releaseCaches() // drain pins left over from earlier tests
    val cleanBefore = cm.isEmpty
    val packed = Pipeline.packByTokenBudget(
      docs, col("doc_id"), col("n_chars"), budget = 4096)
    packed.count() // the consuming action
    // the two-phase prefix sum pinned its range-partitioned frame
    assert(!cm.isEmpty)
    Pipeline.releaseCaches()
    // releasing drops the pin; when no other suite left caches behind,
    // the session's cache manager ends the run empty (the Verify-loop
    // contract: 140 queries, zero graft-pinned entries at exit)
    if (cleanBefore) assert(cm.isEmpty)
  }

  test("pin scopes isolate concurrent callers from releaseCaches") {
    // The round-17 concurrency caveat, closed: a caller that wraps its
    // operator calls in withScope owns its pins — a releaseCaches()
    // fired by ANOTHER caller (the global/default release point) must
    // not unpersist its in-flight frames. Two scoped callers on their
    // own threads + a default-scope caller, interleaved releases.
    // KNOWN LIMIT (pinned in the PinScope scaladoc): Spark's cache is
    // plan-keyed, so these two callers — whose pinned `ranged` plans
    // are identical (the budget only affects post-pin computation) —
    // actually share ONE cache entry, and the FIRST scope.release()
    // drops it for both; what protects the survivor is the prefix-sum
    // fingerprint guard (refuse-loudly on membership drift, tested
    // below), not scope isolation. This test therefore pins the scope
    // LIFECYCLE semantics: default-release can't touch scoped queues,
    // each scope drains only its own.
    Pipeline.releaseCaches() // drain pins left over from earlier tests
    val base = docs.select("doc_id", "n_chars")
    val scopeA = new Pipeline.PinScope
    val scopeB = new Pipeline.PinScope
    import java.util.concurrent.{CountDownLatch, Executors}
    val pool = Executors.newFixedThreadPool(2)
    val built = new CountDownLatch(2)
    val released = new CountDownLatch(1)
    def scopedRun(scope: Pipeline.PinScope, budget: Int) = pool.submit(
      new java.util.concurrent.Callable[Seq[org.apache.spark.sql.Row]] {
        def call() = Pipeline.withScope(scope) {
          val packed = Pipeline.packByTokenBudget(
            docs, col("doc_id"), col("n_chars"), budget = budget)
          built.countDown()
          released.await() // hostile releaseCaches fires BEFORE our action
          packed.orderBy("doc_id").collect().toSeq
        }
      })
    val fa = scopedRun(scopeA, 4096)
    val fb = scopedRun(scopeB, 2048)
    built.await()
    // both scoped callers have pinned; the default scope has not
    assert(!scopeA.isEmpty && !scopeB.isEmpty)
    assert(Pipeline.pinned.isEmpty)
    // the hostile global release: must not touch either scope's pins
    Pipeline.releaseCaches()
    assert(!scopeA.isEmpty && !scopeB.isEmpty)
    released.countDown()
    val ra = fa.get(120, java.util.concurrent.TimeUnit.SECONDS)
    val rb = fb.get(120, java.util.concurrent.TimeUnit.SECONDS)
    pool.shutdown()
    // results are correct (match a naive global running-sum reference)
    val naive = base.orderBy("doc_id").collect().toSeq
    assert(ra.size === naive.size && rb.size === naive.size)
    // each caller releases its own token; the other's QUEUE survives —
    // but pin the documented plan-identity LIMIT against real cache
    // state: these two callers' pinned frames are plan-identical, so
    // they shared ONE cache entry and A's release dropped it for B too
    // (B is protected downstream by the fingerprint guard, not here)
    val bFrames = scopeB.snapshot
    assert(bFrames.nonEmpty)
    scopeA.release()
    assert(scopeB.isEmpty === false)
    assert(bFrames.forall(_.storageLevel ===
        org.apache.spark.storage.StorageLevel.NONE),
      "plan-identical cross-scope entries share cache: A's release " +
        "must have dropped B's entry too (if this ever starts FAILING, " +
        "Spark made caching handle-scoped and the PinScope scaladoc + " +
        "fingerprint-guard rationale should be revisited)")
    scopeB.release()
    assert(scopeA.isEmpty && scopeB.isEmpty)
    // and an unwrapped call still lands in the default scope, released
    // by the classic harness release point (back-compat contract)
    val packed = Pipeline.packByTokenBudget(
      docs, col("doc_id"), col("n_chars"), budget = 4096)
    packed.count()
    assert(!Pipeline.pinned.isEmpty)
    Pipeline.releaseCaches()
    assert(Pipeline.pinned.isEmpty)
  }

  test("prefix-sum phase 2 REFUSES on a partition-fingerprint mismatch") {
    // The round-18 guard: phase 2 verifies per-partition (row count,
    // xor of the materialized content hash) against what the offsets
    // collect observed. A pinned range-partitioned frame recomputed
    // with different boundaries (cache evicted under LRU, or a
    // plan-identical frame unpersisted by another caller — Spark's
    // cache manager keys entries by canonicalized PLAN, not DataFrame
    // handle) keeps a self-consistent _pid, so only this content check
    // can catch it; stale broadcast offsets would otherwise produce
    // silently wrong running sums. Unit-tested with a doctored
    // expectation map against the package-private phase-2 pass.
    import spark.implicits._
    val frame = Seq((1L, 10L), (2L, 20L), (3L, 30L))
      .toDF("id", "v")
      .repartition(1)
      .withColumn("_pid", spark_partition_id())
      .withColumn("_prs", col("v"))
      .withColumn(Pipeline.RunningSumFingerprintCol,
        xxhash64(col("id"), col("v")))
      .sortWithinPartitions("id")
    val truth = frame.groupBy("_pid")
      .agg(count(lit(1)).as("n"), expr(s"bit_xor(${Pipeline.RunningSumFingerprintCol})").as("hx"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val offsets = truth.keys.map(_ -> 0L).toMap
    // matching fingerprint: passes and sums correctly
    val ok = Pipeline.runningSumPass(frame, "run", offsets, truth)
      .orderBy("id").select("id", "run").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(ok.toSeq === Seq((1L, 10L), (2L, 30L), (3L, 60L)))
    // doctored count: refuses loudly
    val badN = truth.map { case (p, (n, hx)) => p -> ((n + 1L, hx)) }
    val e1 = intercept[Exception] {
      Pipeline.runningSumPass(frame, "run", offsets, badN).collect()
    }
    assert(chain(e1).contains("fingerprint mismatch"), chain(e1))
    // doctored content hash: refuses loudly
    val badH = truth.map { case (p, (n, hx)) => p -> ((n, hx ^ 42L)) }
    val e2 = intercept[Exception] {
      Pipeline.runningSumPass(frame, "run", offsets, badH).collect()
    }
    assert(chain(e2).contains("fingerprint mismatch"), chain(e2))
  }

  private def chain(e: Throwable): String = {
    var t = e; val sb = new StringBuilder
    while (t != null) { sb.append(t.getMessage).append('\n'); t = t.getCause }
    sb.toString
  }

  test("globalPosition matches a global row_number window") {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select("doc_id")
    val fast = Pipeline.globalPosition(
        base, "pos", xxhash64(lit(7L), col("doc_id")), col("doc_id"))
      .orderBy("doc_id").select("doc_id", "pos").collect().toSeq
    val naive = base
      .withColumn("pos", row_number().over(
          Window.orderBy(xxhash64(lit(7L), col("doc_id")), col("doc_id")))
        .cast("long"))
      .orderBy("doc_id").select("doc_id", "pos").collect().toSeq
    assert(fast === naive)
  }

  test("zValue matches a local bit-interleave reference") {
    import spark.implicits._
    def zRef(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (7L, 2L),
      (255L, 255L), (1023L, 511L), (65535L, 65535L), (12345L, 54321L))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Pipeline.zValue(col("x"), col("y"), 16).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === zRef(x, y, 16), s"z($x,$y)")
    }
    // canonical small values: z(1,0)=1, z(0,1)=2, z(1,1)=3
    assert(got((1L, 0L)) === 1L && got((0L, 1L)) === 2L && got((1L, 1L)) === 3L)
  }

  test("z-ordered layout prunes a single-dimension band to fewer files") {
    import spark.implicits._
    // 64×64 grid; a y-band predicate is the layout's worst case for an
    // x-sorted table (every x-stripe contains every y → all files touched)
    // and the showcase for z-order (files are ~quadrants → only the
    // quadrant rows intersecting the band are touched).
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x, y)))
      .toDF("x", "y")
    val zDir = java.nio.file.Files
      .createTempDirectory("graft-z-").toString + "/t"
    val xDir = java.nio.file.Files
      .createTempDirectory("graft-x-").toString + "/t"
    Pipeline.zorderWrite(grid, zDir,
      Pipeline.zValue(col("x"), col("y"), 6), files = 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir)
    def filesTouched(dir: String): Long =
      spark.read.parquet(dir)
        .filter(col("y") >= 8 && col("y") < 16)
        .select(input_file_name()).distinct().count()
    val zFiles = filesTouched(zDir)
    val xFiles = filesTouched(xDir)
    // x-sorted: the band lives in (essentially) every nonempty file;
    // z-ordered: only the quadrant row intersecting the band (~4 of 16,
    // plus range-boundary slop). Range sampling can leave a partition
    // empty, so compare the two layouts rather than pinning exact counts.
    assert(xFiles >= 12L, s"x-layout expected to touch ~all files: $xFiles")
    assert(zFiles * 2 <= xFiles,
      s"z-layout should touch at most half the files x-layout does: " +
      s"z=$zFiles x=$xFiles")
    // and both layouts return the same rows, obviously
    assert(spark.read.parquet(zDir)
      .filter(col("y") >= 8 && col("y") < 16).count() === 64L * 8)
  }

  test("winsorize clips exactly at the requested percentiles") {
    import spark.implicits._
    // 0..100: p05 = 5.0, p95 = 95.0 under linear interpolation
    val df = (0 to 100).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    val w = Pipeline.winsorize(df, col("v"), "v", 0.05, 0.95)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(0L) === 5.0 && w(3L) === 5.0 && w(5L) === 5.0)
    assert(w(50L) === 50.0)
    assert(w(95L) === 95.0 && w(99L) === 95.0 && w(100L) === 95.0)
  }

  test("bpeTrain reproduces hand-computed Sennrich merges") {
    import spark.implicits._
    // words: aaab ×2, ab ×1
    // round 1: (a,a)=4 beats (a,b)=3 -> "aa"; greedy rewrite aaab=[aa,a,b]
    // round 2: (a,b)=3 beats (aa,a)=2 -> "ab"
    // round 3: (aa,ab)=2 -> "aaab"
    val docs = Seq("aaab aaab ab").toDF("text")
    val merges = Pipeline.bpeTrain(docs, col("text"), merges = 3)
    assert(merges === Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    val vocab = Pipeline.appliedVocab(docs, col("text"), merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab === Map("aaab" -> 2L, "ab" -> 1L))
  }

  test("bpe merge apply consumes overlaps left-first") {
    import spark.implicits._
    // "aaa": (a,a) counted at both positions; after the merge the greedy
    // left-first rewrite leaves [aa, a], so round 2 merges (aa, a)
    val docs = Seq("aaa aaa").toDF("text")
    val merges = Pipeline.bpeTrain(docs, col("text"), merges = 2)
    assert(merges === Seq(("a", "a"), ("aa", "a")))
  }

  test("bpeMergePairs weights pairs by word frequency") {
    import spark.implicits._
    val docs = Seq("aaab aaab ab").toDF("text")
    val got = Pipeline.bpeMergePairs(docs, col("text"), topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.head === ("aa" -> 4L)) // two positions × freq 2
    assert(got.toMap.apply("ab") === 3L)
  }

  test("context packing fills bins to the budget in id order") {
    val packed = Pipeline.packByTokenBudget(
      docs.select(col("doc_id"),
        graft.ops.TextAnalysis.wsTokenCount(col("text")).as("n_tokens")),
      col("doc_id"), col("n_tokens"), budget = 1000)
    // bins are contiguous in id order and nonnegative
    val bins = packed.orderBy("doc_id").select("bin").collect().map(_.getInt(0))
    assert(bins.head === 0)
    assert(bins.zip(bins.tail).forall { case (a, b) => b >= a })
    // every bin's token sum (minus its possibly-straddling last doc) fits
    val over = packed.groupBy("bin").agg(sum(col("n_tokens")).as("s"),
        max(col("n_tokens")).as("m"))
      .filter(col("s") - col("m") > 1000).count()
    assert(over === 0)
  }

  test("runningTotal matches the naive global running-sum window") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "v")
    val got = Pipeline.runningTotal(df.repartition(5), col("v"), "cum", col("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    Pipeline.releaseCaches()
    var acc = 0L
    (1 to 500).foreach { i =>
      acc += i % 7
      assert(got(i.toLong) === acc, s"at id $i")
    }
  }

  test("prefix-sum phase 2 adds no second shuffle (one range exchange)") {
    import spark.implicits._
    // the old Window.partitionBy(_pid) phase 2 made Spark insert an
    // Exchange hashpartitioning(_pid) after the range repartition — the
    // corpus shuffled TWICE per prefix sum, keyed on ~numShufflePartitions
    // distinct pids (round-16 review, plan-verified). Phase 2 is now a
    // partition-local sort + sequential pass; pin the plan shape.
    val df = (1 to 400).map(i => (i.toLong, (i % 5).toLong)).toDF("id", "v")
    for (out <- Seq(
        Pipeline.runningTotal(df, col("v"), "cum", col("id")),
        Pipeline.globalPosition(df, "pos", col("id")),
        Pipeline.packByTokenBudget(df, col("id"), col("v"), budget = 7))) {
      out.collect()
      val p = out.queryExecution.executedPlan.toString
      assert(!p.contains("hashpartitioning(_pid"),
        s"phase 2 re-shuffled on _pid:\n$p")
      Pipeline.releaseCaches()
    }
  }

  test("source reweighting: weights positive and sum to 1") {
    val w = SparkEntry.queries("pl15_source_reweight")(spark, sf)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(w.nonEmpty)
    w.foreach { case (n, q, wt) =>
      assert(n > 0 && q > 0.0 && q <= 1.0 && wt > 0.0)
    }
    assert(math.abs(w.map(_._3).sum - 1.0) < 1e-9)
  }

  test("curriculumBuckets: quartiles per stratum in length order, stable") {
    import spark.implicits._
    val docs = ((1 to 8).map(i => (i.toLong, "en", i * 10)) ++
      (9 to 11).map(i => (i.toLong, "fr", i)))
      .toDF("doc_id", "lang", "n_chars")
    val got = Pipeline.curriculumBuckets(docs,
        strata = Seq(col("lang")),
        order = Seq(col("n_chars").asc, col("doc_id").asc), n = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    // en: 8 docs → 2 per quartile in length order
    assert((1 to 8).map(got(_)).toSeq === Seq(1, 1, 2, 2, 3, 3, 4, 4))
    // fr: 3 docs over 4 buckets → sizes 1,1,1 (ntile leaves bucket 4 empty)
    assert((9 to 11).map(got(_)).toSeq === Seq(1, 2, 3))
    // deterministic under a different physical layout
    val re = Pipeline.curriculumBuckets(docs.repartition(7),
        strata = Seq(col("lang")),
        order = Seq(col("n_chars").asc, col("doc_id").asc), n = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(re === got)
  }

  test("leakage-safe split: near-dup cluster members never straddle splits") {
    import spark.implicits._
    // the whole point: every near-dup cluster lands in ONE split — a
    // doc-id-keyed hash split would scatter members across the cut and
    // leak paraphrases of training docs into the eval set
    val out = graft.SparkEntry
      .queries("pl28_leakage_safe_split")(spark, sf)
    val straddling = out.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
      .count()
    assert(straddling === 0L, "a cluster crossed the split boundary")
    // multi-member clusters exist in the fixture, so the invariant is
    // not vacuous, and all three splits are populated
    val multi = out.groupBy("cluster_id").count().filter(col("count") > 1)
    assert(multi.count() > 0L)
    assert(out.select("split").distinct().count() === 3L)
  }

  test("interleaveBySource: round-robin order, no SinglePartition, layout-stable") {
    import spark.implicits._
    // A has 3 docs, B has 2 → training order A1 B1 A2 B2 A3
    val docs = Seq((10L, "A"), (11L, "A"), (12L, "A"), (20L, "B"),
      (21L, "B")).toDF("doc_id", "source")
    def run(df: org.apache.spark.sql.DataFrame) = Pipeline
      .interleaveBySource(df, col("doc_id"), col("source"))
      .orderBy("train_pos").collect()
      .map(r => (r.getLong(3), r.getLong(0))).toSeq
    val got = run(docs)
    assert(got === Seq((1L, 10L), (2L, 20L), (3L, 11L), (4L, 21L),
      (5L, 12L)))
    assert(run(docs.repartition(4)) === got)
    val p = Pipeline.interleaveBySource(docs, col("doc_id"), col("source"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("SinglePartition"), p)
  }

  test("shardPlan: greedy cut at target, oversize doc unsplit, layout-stable") {
    import spark.implicits._
    // tokens in id order: 3,3,3,3 at target 5 → exclusive cums 0,3,6,9
    // → shards 0,0,1,1 (a shard overshoots by its last doc, never splits)
    val even = Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L))
      .toDF("doc_id", "tok")
    def run(df: org.apache.spark.sql.DataFrame, target: Long) = Pipeline
      .shardPlan(df, col("doc_id"), col("tok"), target)
      .orderBy("shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(run(even, 5L) === Seq((0L, 2L, 6L, 1L, 2L), (1L, 2L, 6L, 3L, 4L)))
    // a doc bigger than the target still lands whole; the NEXT doc opens
    // a fresh shard (cums 0,12 → shards 0,2 — shard ids need not be
    // consecutive when one doc spans multiple target multiples)
    val big = Seq((1L, 12L), (2L, 2L)).toDF("doc_id", "tok")
    assert(run(big, 5L) === Seq((0L, 1L, 12L, 1L, 1L), (2L, 1L, 2L, 2L, 2L)))
    // deterministic under a different physical layout (two-phase total)
    assert(run(even.repartition(3), 5L) === run(even, 5L))
  }

  test("lengthBatches: sort order, batch cut, exact padding waste") {
    import spark.implicits._
    // lengths sorted (len, id): (2,1),(5,2),(3,5),(4,5),(1,10)
    val rows = Seq((1L, 10L), (2L, 1L), (3L, 5L), (4L, 5L), (5L, 2L))
      .toDF("doc_id", "len")
    val got = Pipeline
      .lengthBatches(rows, col("len"), col("doc_id"), batchSize = 2)
      .orderBy("batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq === Seq(
      (0L, 2L, 2L, 3L, 1L),    // [(2,len1),(5,len2)]: pads len-1 → 2
      (1L, 2L, 5L, 10L, 0L),   // equal lengths → zero waste
      (2L, 1L, 10L, 10L, 0L))) // ragged final batch, no waste alone
    // deterministic under a different physical layout (two-phase rank)
    val re = Pipeline
      .lengthBatches(rows.repartition(5), col("len"), col("doc_id"), 2)
      .orderBy("batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(re.toSeq === got.toSeq)
  }

  test("corpusPipeline: each gate drops its doc, decisions are auditable") {
    import spark.implicits._
    val t1 = "these have been words that stay"
    val docs = Seq(
      // eval doc (excluded from output, contamination reference)
      (0L, "the cat and dog run fast", "en", "s", 24L),
      (1L, "zz xx", "en", "s", 5L),                      // fails quality
      (2L, t1, "en", "s", 31L),                          // dup canonical
      (3L, t1, "en", "s", 31L),                          // dup copy
      (4L, "the cat and dog swim well", "en", "s", 25L), // contaminated
      (5L, "those have been symbols that stand", "en", "s", 40L),
      (6L, "words that move and feel alive", "fr", "s", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Pipeline.corpusPipeline(docs, col("doc_id") === 0L,
        nGram = 2, minWords = 3, contThreshold = 0.1)
      .collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(4), r.getBoolean(5),
        r.getBoolean(6), r.getBoolean(7), r.getBoolean(8)))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L)) // eval absent
    //                 (quality, canonical, contaminated, balance, keep)
    assert(got(1L) === ((false, true, false, false, false)))
    // eligible en docs {2 (31 chars), 5 (40)}; fr {6} → target 1, so the
    // longer en doc 5 wins the balance cap and 2 is the documented loser
    assert(got(2L) === ((true, true, false, false, false)))
    assert(got(3L) === ((true, false, false, false, false)))
    assert(got(4L) === ((true, true, true, false, false)))
    assert(got(5L) === ((true, true, false, true, true)))
    assert(got(6L) === ((true, true, false, true, true)))
  }

  test("balancedDownsample: min-stratum cap, priority order, tie-break") {
    import spark.implicits._
    val rows = Seq(
      ("a", 1L, 5.0), ("a", 2L, 9.0), ("a", 3L, 9.0),
      ("b", 4L, 1.0),
      ("c", 5L, 2.0), ("c", 6L, 7.0))
      .toDF("lang", "doc_id", "score")
    val got = Pipeline.balancedDownsample(rows, col("lang"),
        Seq(col("score").desc, col("doc_id").asc))
      .collect().map(r => r.getLong(1)).toSet
    // min stratum (b) has 1 row → one winner per stratum: a's score tie
    // at 9.0 breaks to the smaller id 2; c keeps its best 6
    assert(got === Set(2L, 4L, 6L))
  }

  test("psiDrift: identical halves → 0, shifted half → null + positive") {
    import spark.implicits._
    def run(cmp: Seq[Long]) = Pipeline.psiDrift(
        (Seq(1L, 2L, 3L, 4L).map((_, true)) ++ cmp.map((_, false)))
          .toDF("v", "is_ref"),
        col("v"), col("is_ref"), nBuckets = 2)
      .orderBy("bucket").collect()
    // same distribution on both sides: every term exactly 0.0
    val same = run(Seq(1L, 2L, 3L, 4L))
    assert(same.map(_.getInt(0)).toSeq === Seq(0, 1))
    assert(same.forall(r => r.getDouble(5) === 0.0))
    // cmp mass all above the ref median: bucket 0 empty on the cmp side
    // → null term (not a divide/ln crash); bucket 1 term = −0.5·ln 0.5
    val shifted = run(Seq(100L, 200L))
    assert(shifted(0).getLong(1) === 2L && shifted(0).getLong(2) === 0L)
    assert(shifted(0).isNullAt(5))
    assert(shifted(1).getDouble(5) === -0.5 * math.log(0.5))
  }

  test("dsirWeights: target-like docs outscore non-target, bounds hold") {
    import spark.implicits._
    // target slice shares vocabulary with doc 30 (target-like) but not
    // with doc 31 (alien vocabulary): DSIR must rank 30 above 31
    val rows = (1L to 20L).map(i => (i, true, "the quick brown fox jumps")) ++
      Seq((30L, false, "the quick brown fox runs"),
          (31L, false, "zqx wvu ytr plk mno"))
    val got = Pipeline.dsirWeights(
        rows.toDF("doc_id", "is_t", "text"), "doc_id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // every doc has >= 2 tokens -> n_features = n_tokens - 1
    assert(got(1L)._1 === 4L && got(31L)._1 === 4L)
    // Padé surrogate of the log-ratio is bounded: |w| < 2 per feature
    got.values.foreach { case (nf, nano, _) =>
      assert(math.abs(nano) < 2e9 * nf) }
    // the shared-vocab doc scores strictly above the alien-vocab doc,
    // and pure-target docs score above both
    assert(got(30L)._3 > got(31L)._3)
    assert(got(1L)._3 > got(30L)._3)
    // weight column is exactly the nano sum over 1e9 (the exact path)
    got.values.foreach { case (_, nano, w) => assert(w === nano / 1e9) }
  }

  test("epochSchedule: exact sqrt-share targets, 4-epoch cap and deficit") {
    import spark.implicits._
    // inventories 10000 vs 100 tokens; sqrt shares 10:1; budget
    // 3.5x inventory = 35350 -> targets 32136 / 3213 (exact floors);
    // the small source's target implies 32 epochs -> capped at 400
    val df = Seq(("A", 10000L), ("B", 100L)).toDF("source", "t")
    val got = Pipeline.epochSchedule(df, "source", col("t"),
        floor(sum(col("n_tokens")).cast("double") * lit(3.5)))
      .orderBy("source").collect()
    val a = got(0); val b = got(1)
    assert(a.getLong(1) === 10000L && b.getLong(1) === 100L)
    assert(a.getLong(2) === 32136L, a) // floor(1e8/1.1e8 * 35350)
    assert(b.getLong(2) === 3213L, b)
    assert(a.getLong(3) === 32136L && a.getLong(4) === 0L)
    assert(b.getLong(3) === 400L && b.getLong(4) === 2813L)
    assert(a.getDouble(5) === 3.2136 && b.getDouble(5) === 4.0)
  }

  test("temperatureMixture: sqrt-share targets, upweights small sources") {
    import spark.implicits._
    // 400 vs 100 rows: alpha=1/2 shares are 2/3 vs 1/3 of the budget
    // (250), so targets are 166 vs 83 -> keep fractions 0.415 vs 0.83:
    // the SMALL source keeps a strictly larger fraction (the mixing
    // lever this operator exists for)
    val rows = (1L to 400L).map((_, "big")) ++ (401L to 500L).map((_, "small"))
    val df = rows.toDF("doc_id", "source")
    val kept = Pipeline.temperatureMixture(df, "source", col("doc_id"), "t:")
    val bySrc = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val fBig = bySrc("big") / 400.0
    val fSmall = bySrc("small") / 100.0
    assert(fSmall > fBig, s"small kept $fSmall <= big kept $fBig")
    // kept counts concentrate on the exact targets (binomial, 4 sigma)
    assert(math.abs(bySrc("big") - 166L) <= 40, bySrc)
    assert(math.abs(bySrc("small") - 83L) <= 16, bySrc)
    // pure function of (salt, key): bit-reproducible
    val again = Pipeline.temperatureMixture(df, "source", col("doc_id"), "t:")
    assert(kept.exceptAll(again).count() === 0)
    assert(again.exceptAll(kept).count() === 0)
    // a different salt draws a different sample (not degenerate)
    val other = Pipeline.temperatureMixture(df, "source", col("doc_id"), "u:")
    assert(other.exceptAll(kept).count() > 0)
  }

  test("sourceCaps: absolute per-source ceiling, quality order, stable") {
    import spark.implicits._
    // source A: 3 docs, cap 2 → lowest-quality one dropped;
    // source B: 1 doc → untouched. Quality ties break to the lower id.
    val df = Seq(
      (1L, "A", 0.9), (2L, "A", 0.5), (3L, "A", 0.9), (4L, "B", 0.1))
      .toDF("doc_id", "source", "q")
    val res = Pipeline.sourceCaps(
      df, col("doc_id"), col("source"), col("q"), cap = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getBoolean(3)))
    assert(res === Array(
      (1L, "A", 1L, true),   // 0.9, tie with doc 3 → lower id ranks first
      (2L, "A", 3L, false),  // lowest quality in A → over the cap
      (3L, "A", 2L, true),
      (4L, "B", 1L, true)))  // a small source is never inflated
    // deterministic under repartitioning (the 100 TB reproducibility bar)
    val again = Pipeline.sourceCaps(
      df.repartition(7), col("doc_id"), col("source"), col("q"), cap = 2)
    assert(again.exceptAll(Pipeline.sourceCaps(
      df, col("doc_id"), col("source"), col("q"), cap = 2)).count() === 0)
  }
}
