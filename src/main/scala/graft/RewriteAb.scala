package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Rewrite-vs-literal A/B harness — the measured backing for SCALE.md's
  * subquery-rewrite claims, promoted from round-14's throwaway probes so
  * the quoted numbers live in a committed artifact (`ABRW.json`) that
  * `tools/doc_sync_check.py` gates, instead of drifting as prose.
  *
  * For each scale dir and each adjudicated shape it times, in ONE
  * session over cached tables (warmup + 3 interleaved reps, min
  * reported — the Bench discipline):
  *   - q2  window rewrite        vs the literal correlated-min text
  *   - q18 agg-first rewrite     vs the literal IN-subquery text
  *   - q20 kept literal text     vs the round-14 rewrite probe (the
  *     counter-example: here the LITERAL is the catalog entry and the
  *     probe exists only in this harness, so the keep-decision stays
  *     re-measurable after Spark upgrades)
  *   - q17 agg-first rewrite     vs the literal correlated-avg text
  *   - q21 window rewrite        vs the literal EXISTS/NOT-EXISTS text
  *   - ta16 constant-factor forms vs the retired round-16 expressions
  *     (array_intersect stop-hits + regexp_count symbols vs 8
  *     array_contains scans + replaced-string length)
  * Literal texts run over the same cached-partsupp views the catalog
  * uses (`Tables.registerAll`), so the A/B isolates plan shape, not
  * caching.
  *
  * Run: `sbt "runMain graft.RewriteAb <dir1> <dir2> ..."` (defaults:
  * sf0.1 ×1 plus the ScaleCurve work dirs x10/x30). Output:
  * SPARK_GRAFT_ABRW_OUT (default ABRW.json), one object per
  * (factor, query): {"rewrite": minSec, "literal": minSec, reps...}.
  * SPARK_GRAFT_ABRW_CASES selects a case subset (requires an explicit
  * OUT path; merge focused rows into ABRW.json deliberately).
  */
object RewriteAb {

  /** The pre-round-17 ta16 expression forms — stop-hits as 8 interpreted
    * `array_contains` lambda scans (one per stopword) and the symbol
    * count as `length(regexp_replace(...))` (builds a stripped copy of
    * the document) — kept here as the measured A/B baseline for the
    * round-17 constant-factor pass (the q20/dd16 convention: the
    * retired side lives in the harness, re-measurable after Spark
    * upgrades). Values are bit-identical to the catalog form. */
  private def ta16LegacyProbe(docs: DataFrame): DataFrame = {
    import graft.ops.TextAnalysis.gopherStopwords
    val text = col("text")
    val toks = split(text, " ")
    val nWords = size(toks)
    val meanWordLen =
      (length(text) - (nWords - lit(1))).cast("double") / nWords.cast("double")
    val symbolRatio =
      length(regexp_replace(text, "[a-z0-9 ]", "")).cast("double") /
        nWords.cast("double")
    val alphaFrac =
      size(filter(toks, t => t.rlike("^[a-z]+$"))).cast("double") /
        nWords.cast("double")
    val stopHits = size(filter(
      typedLit(gopherStopwords), w => array_contains(toks, w)))
    val wordsOk = nWords >= 20 && nWords <= 100000
    val lenOk = meanWordLen >= 3.0 && meanWordLen <= 10.0
    val symOk = symbolRatio <= 0.1
    val alphaOk = alphaFrac >= 0.8
    val stopOk = stopHits >= 2
    docs.select(col("doc_id"),
      nWords.as("n_words"), meanWordLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), alphaFrac.as("alpha_frac"),
      stopHits.as("stopword_hits"),
      wordsOk.as("words_ok"), lenOk.as("len_ok"), symOk.as("symbol_ok"),
      alphaOk.as("alpha_ok"), stopOk.as("stop_ok"),
      (wordsOk && lenOk && symOk && alphaOk && stopOk).as("pass"))
      .orderBy("doc_id")
  }

  /** The round-14 q20 rewrite probe (semi-join-first aggregation) — see
    * the keep-note on TpchQueries "q20_part_promotion" for why this is
    * NOT the catalog entry. */
  private def q20Probe(s: SparkSession, d: String): DataFrame = {
    val smallParts = Tables.part(s, d)
      .filter(col("p_name").like("small%")).select("p_partkey")
    val shipped = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(smallParts, col("l_partkey") === col("p_partkey"), "leftsemi")
      .groupBy("l_partkey", "l_suppkey")
      .agg((lit(0.5) *
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double"))
        .as("half_shipped"))
    val qualifying = Tables.partsupp(s, d)
      .join(smallParts, col("ps_partkey") === col("p_partkey"), "leftsemi")
      .join(shipped,
        col("ps_partkey") === col("l_partkey") &&
          col("ps_suppkey") === col("l_suppkey"))
      .filter(col("ps_availqty") > col("half_shipped"))
      .select("ps_suppkey")
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .filter(col("n_regionkey").isin(0, 1, 2)).select("n_nationkey")),
        col("s_nationkey") === col("n_nationkey"), "leftsemi")
      .join(qualifying, col("s_suppkey") === col("ps_suppkey"), "leftsemi")
      .select("s_suppkey", "s_name", "s_acctbal")
      .orderBy("s_suppkey")
  }

  /** Round-19 q7 probe: pre-aggregate the lineitem⋈supplier⋈nation side
    * by (l_orderkey, supp_region, l_year) BEFORE the orders/customer
    * joins — lineitem→order is ~4:1 and the supplier-region filter
    * keeps 2 of 5 regions, so far fewer rows cross the two remaining
    * joins. Values identical to the catalog text: quantized unit sums
    * are associative longs, and the guard carriers compose exactly
    * (max of partial maxes, sum of partial counts). The catalog keeps
    * the literal four-join text unless this wins — q7's verdict-audited
    * plan is "right but four joins"; this is the one untried idea. */
  private def q7Probe(s: SparkSession, d: String): DataFrame = {
    import graft.queries.OracleSafe.{units, quantGuarded}
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"),
        col("n_regionkey").as("supp_region"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nk"),
        col("n_regionkey").as("cust_region"))
    val pre = Tables.lineitem(s, d)
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .filter(col("supp_region").isin(0, 1))
      .groupBy(col("l_orderkey"), col("supp_region"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(units(rev, 1e4)).as("_u"),
        max(abs(units(rev, 1e4))).as("_mu1"),
        count(lit(1)).as("_n1"))
    pre
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(col("cust_region").isin(0, 1) &&
        col("supp_region") =!= col("cust_region"))
      .groupBy(col("supp_region"), col("cust_region"), col("l_year"))
      .agg((sum(col("_u")).cast("double") / lit(1e4)).as("revenue"),
        max(col("_mu1")).as("_mu"), sum(col("_n1")).as("_n"))
      .withColumn("revenue", quantGuarded(col("revenue"), col("_mu"),
        col("_n"), "double", "q7_probe"))
      .drop("_mu", "_n")
      .orderBy("supp_region", "cust_region", "l_year")
  }

  def main(args: Array[String]): Unit = {
    // A case subset must NOT overwrite the full artifact of record with
    // a partial one (the ScaleCurve subset-guard convention): selecting
    // SPARK_GRAFT_ABRW_CASES requires an explicit SPARK_GRAFT_ABRW_OUT;
    // merge the focused rows into ABRW.json deliberately afterwards.
    require(!sys.env.contains("SPARK_GRAFT_ABRW_CASES") ||
        sys.env.contains("SPARK_GRAFT_ABRW_OUT"),
      "SPARK_GRAFT_ABRW_CASES selects a subset: set SPARK_GRAFT_ABRW_OUT " +
        "explicitly so the run cannot overwrite ABRW.json")
    val caseFilter: String => Boolean =
      sys.env.get("SPARK_GRAFT_ABRW_CASES") match {
        case Some(cs) =>
          val names = cs.split(",").map(_.trim).filter(_.nonEmpty).toSet
          names.contains
        case None => _ => true
      }
    val work = sys.env.getOrElse("SPARK_GRAFT_SCALE_WORK", "/tmp/graft_scale")
    val dirs: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", s"$work/x10", s"$work/x30")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors(), 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-rewrite-ab")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // Key by trailing xN when present, else the dir basename: two dirs
    // without an xN suffix must not both collapse to "x1" (json.load
    // keeps only the last duplicate key — a scale point would silently
    // vanish from the gated artifact). Dirs are canonicalized FIRST so a
    // trailing slash / relative path / symlink spelling of the base
    // fixture still keys as x1, and key distinctness is required BEFORE
    // the first measurement — a duplicate must abort in milliseconds,
    // not after a tens-of-minutes ×30 sweep (round-15 review finding).
    // Canonicalize BOTH sides of the base-fixture comparison: if any
    // component of /root/testdata is a symlink, getCanonicalFile resolves
    // it on the argument side, so comparing against the hardcoded literal
    // string would silently key the base fixture as "sf0.1" instead of
    // "x1" and break the ABRW doc-sync expectations (round-16 advice).
    lazy val baseFixture =
      new java.io.File("/root/testdata/sf0.1").getCanonicalFile
    def factorKey(dir: String): String = {
      val canon = new java.io.File(dir).getCanonicalFile
      "x(\\d+)$".r.findFirstMatchIn(canon.getPath)
        .map(m => s"x${m.group(1)}")
        .getOrElse(if (canon == baseFixture) "x1" else canon.getName)
    }
    val keys = dirs.map(factorKey)
    require(keys.distinct.size == keys.size,
      s"duplicate factor keys across dirs: ${keys.mkString(", ")} — " +
        "each dir must resolve to a distinct JSON key")
    val out = new StringBuilder
    val dirResults = dirs.zip(keys).map { case (dir, factor) =>
      Tables.tpch.foreach(t => Tables.load(spark, dir, t).cache().count())
      Tables.registerAll(spark, dir)
      val liRows = Tables.load(spark, dir, "lineitem").count()
      lazy val docs = { val d = Tables.load(spark, dir, "documents")
        .cache(); d.count(); d }
      val snKey = substring(
        regexp_replace(lower(col("text")), "[^a-z0-9]", ""), 1, 12)
      // (name, rewrite plan, literal plan) — Force.run executes the full
      // plan (a bare .count() lets Catalyst prune the compute, see Force)
      val tpchCases: Seq[(String, () => Unit, () => Unit)] = Seq(
        ("q2",
          () => { Force.run(SparkEntry.queries("q2_min_cost_supplier")(spark, dir)); () },
          () => { Force.run(spark.sql(graft.queries.TpchQueries.q2Raw)); () }),
        ("q18",
          () => { Force.run(SparkEntry.queries("q18_large_volume")(spark, dir)); () },
          () => { Force.run(spark.sql(SparkEntry.oracleSql("q18_large_volume"))); () }),
        ("q20",
          () => { Force.run(q20Probe(spark, dir)); () },
          () => { Force.run(spark.sql(graft.queries.TpchQueries.q20Raw)); () }),
        ("q17",
          () => { Force.run(SparkEntry.queries("q17_small_quantity")(spark, dir)); () },
          () => { Force.run(spark.sql(graft.queries.TpchQueries.q17Sql)); () }),
        ("q21",
          () => { Force.run(SparkEntry.queries("q21_suppliers_waiting")(spark, dir)); () },
          () => { Force.run(spark.sql(graft.queries.TpchQueries.q21Sql)); () }),
        // q15 single-scan rewrite (round 17): aggregate-once + pinned
        // per-supplier frame + broadcast max vs the literal CTE text,
        // whose plan re-executes the fact aggregation under the
        // scalar-max subquery. The rewrite pins — release after.
        ("q15",
          () => {
            Force.run(SparkEntry.queries("q15_top_supplier")(spark, dir))
            graft.ops.Pipeline.releaseCaches()
          },
          () => { Force.run(spark.sql(graft.queries.TpchQueries.q15Sql)); () }),
        // q7 probe-and-measure (round 19): order-level pre-aggregation
        // before the customer join vs the kept four-join catalog text
        // (the q20 convention — the probe lives only here unless it
        // wins). "rewrite" = probe, "literal" = catalog entry.
        ("q7",
          () => { Force.run(q7Probe(spark, dir)); () },
          () => { Force.run(SparkEntry.queries("q7_nation_volume")(spark, dir)); () }))
      // dd16 probe (round 15): single-sort ranged variant vs the
      // two-phase globalPosition catalog implementation. "rewrite" =
      // the probe, "literal" = the catalog entry (the q20 convention).
      // Runs as its OWN section after the tpch group: its per-rep
      // pinned gram/range caches (GBs at ×30) evicted the interleaved
      // tpch reps' cached tables when it shared the loop — the first
      // combined capture showed q20's literal reps inflating 3× at ×10
      // on zero code change.
      val dd16Cases: Seq[(String, () => Unit, () => Unit)] = Seq(
        ("dd16",
          () => {
            Force.run(graft.ops.Dedup.sortedNeighborhoodPairsRanged(docs,
              col("doc_id"), col("text"), snKey, 5, 3, 0.5))
            graft.ops.Pipeline.releaseCaches()
          },
          () => {
            Force.run(graft.ops.Dedup.sortedNeighborhoodPairs(docs,
              col("doc_id"), col("text"), snKey, 5, 3, 0.5))
            graft.ops.Pipeline.releaseCaches()
          }),
        // dd16 verification-gate A/B (round 19): the shared gram-merge
        // verification stage with the lossless mask-bound pre-gate +
        // early-exit merge (preGate=true) vs the ungated full-merge
        // incumbent (the catalog default — the A/B was a WASH, see the
        // verifySortedNeighborhoodCand keep-note; kept re-measurable
        // here per the q20 convention). Both sides run the SAME
        // two-phase candidate pipeline, so this isolates verification
        // cost. Pair-set bit-equality pinned in DedupSpec.
        ("dd16gate",
          () => {
            Force.run(graft.ops.Dedup.sortedNeighborhoodPairs(docs,
              col("doc_id"), col("text"), snKey, 5, 3, 0.5,
              preGate = true))
            graft.ops.Pipeline.releaseCaches()
          },
          () => {
            Force.run(graft.ops.Dedup.sortedNeighborhoodPairs(docs,
              col("doc_id"), col("text"), snKey, 5, 3, 0.5,
              preGate = false))
            graft.ops.Pipeline.releaseCaches()
          }),
        // dd16 payload-slimming A/B (round 19, the remedy the dd16gate
        // wash diagnosed): hashed-gram verification (sorted xxhash64
        // arrays — half the join payload, long merges) vs the
        // string-gram catalog form. Pair-set equality pinned in
        // DedupSpec (64-bit collisions ≈ 1e-14/pair; the string form
        // stays the oracle-exact catalog entry regardless).
        ("dd16hash",
          () => {
            Force.run(graft.ops.Dedup.sortedNeighborhoodPairsHashed(docs,
              col("doc_id"), col("text"), snKey, 5, 3, 0.5))
            graft.ops.Pipeline.releaseCaches()
          },
          () => {
            Force.run(graft.ops.Dedup.sortedNeighborhoodPairs(docs,
              col("doc_id"), col("text"), snKey, 5, 3, 0.5))
            graft.ops.Pipeline.releaseCaches()
          }))
      // ta16 constant-factor A/B (round 17): the catalog gopherRules
      // (one array_intersect stop-hit pass + regexp_count symbol count)
      // vs the retired forms (8 array_contains scans + replaced-string
      // length). Both sides run the full rule table over the SAME
      // cached docs frame, so the A/B isolates expression cost.
      val ta16Cases: Seq[(String, () => Unit, () => Unit)] = Seq(
        ("ta16",
          () => {
            Force.run(docs.select(col("doc_id") +:
              graft.ops.TextAnalysis.gopherRules(col("text"), 20): _*)
              .orderBy("doc_id"))
            ()
          },
          () => { Force.run(ta16LegacyProbe(docs)); () }),
        // ta14 window-clustering A/B (round 18, ADOPTED): the catalog
        // lag-based single-(chunk_md5)-clustering form (one
        // exchange+sort for both window functions) vs the retired
        // two-window form ((md5, doc_id) marker then (md5) sum — two
        // full-data exchange+sort passes). Bit-equivalence pinned in
        // TextAnalysisSpec; adopted on 1.03–1.13× wins at every point.
        ("ta14",
          () => {
            Force.run(graft.ops.TextAnalysis.stripBoilerplateChunks(
              docs, col("doc_id"), col("text"), 8, 1L).orderBy("doc_id"))
            ()
          },
          () => {
            Force.run(graft.ops.TextAnalysis.stripBoilerplateChunksTwoWindow(
              docs, col("doc_id"), col("text"), 8, 1L).orderBy("doc_id"))
            ()
          }),
        // dd22 Bloom-pair A/B (round 19): Catalyst's BloomFilterAggregate
        // + BloomFilterMightContain (codegen'd long probe) vs the
        // broadcast-UDF string probe — the one remaining hot-path UDF.
        // Both sides build their sketch per rep (the dd22 catalog entry
        // builds per call) and share the exact verification, so the A/B
        // isolates sketch build + probe cost. Verdicts identical (no
        // false negatives either way; fps die in the exact semi-join).
        ("dd22bloom",
          () => {
            Force.run(graft.ops.Dedup.bloomIngestGateNative(
              docs.filter(col("doc_id") % 5 =!= 0),
              docs.filter(col("doc_id") % 5 === 0),
              col("doc_id"), substring(col("text"), 1, 64),
              expectedItems = 1000L, fpp = 0.01).orderBy("incoming_id"))
            ()
          },
          () => {
            Force.run(graft.ops.Dedup.bloomIngestGate(
              docs.filter(col("doc_id") % 5 =!= 0),
              docs.filter(col("doc_id") % 5 === 0),
              col("doc_id"), substring(col("text"), 1, 64),
              expectedItems = 1000L).orderBy("incoming_id"))
            ()
          }))
      def runGroup(cases: Seq[(String, () => Unit, () => Unit)])
          : Seq[(String, Vector[Double], Vector[Double])] = {
        cases.foreach { case (_, rw, lt) => rw(); lt() } // warmup
        val acc = cases.map { case (name, _, _) =>
          name -> (Vector.empty[Double], Vector.empty[Double])
        }.to(collection.mutable.LinkedHashMap)
        (1 to 3).foreach { _ =>
          cases.foreach { case (name, rw, lt) =>
            val (a, b) = acc(name)
            acc(name) = (a :+ time(rw()), b :+ time(lt()))
          }
        }
        acc.map { case (n, (a, b)) => (n, a, b) }.toSeq
      }
      val measured =
        runGroup(tpchCases.filter(c => caseFilter(c._1))) ++
          runGroup(dd16Cases.filter(c => caseFilter(c._1))) ++
          runGroup(ta16Cases.filter(c => caseFilter(c._1)))
      val fields = measured.map { case (name, rw, lt) =>
        f""""$name":{"rewrite":${rw.min}%.4f,"literal":${lt.min}%.4f,""" +
          s""""rewrite_reps":${rw.map(v => f"$v%.4f").mkString("[", ",", "]")},""" +
          s""""literal_reps":${lt.map(v => f"$v%.4f").mkString("[", ",", "]")}}"""
      }.mkString(",")
      spark.catalog.clearCache()
      s""""$factor":{"dir":"$dir","lineitem_rows":$liRows,$fields}"""
    }
    out ++= dirResults.mkString("{", ",", "}")
    val path = sys.env.getOrElse("SPARK_GRAFT_ABRW_OUT", "ABRW.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      out.toString + "\n")
    System.err.println(s"[abrw] wrote $path")
    spark.stop()
  }
}
