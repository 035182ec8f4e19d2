package graft

import org.apache.spark.sql.SparkSession
import graft.sources.Tables

/** Benchmark main — 8-query TPC-H-class headline suite (the shapes the
  * reference's README bench claims, README.md:5) on
  * SPARK_GRAFT_SF_DIR, one JSON contract line on stdout.
  *
  * Methodology mirrors the reference's own setup (BASELINE.md): tables are
  * pre-loaded before the timed loop (the reference eagerly materializes at
  * CREATE, Microbase.scala:960-983 — here `cache()` + force), one warmup
  * pass absorbs plan/codegen compilation, then each query is timed
  * end-to-end including result materialization.
  *
  * The JSON line is printed to stdout and also written to
  * `BENCH_LAST.json` (launchers like sbt prefix stdout, which defeats a
  * log-scrape json parse). A `bucketed` field re-times the two
  * shuffle-dominated queries over pre-bucketed lineitem/orders — the
  * measured version of the co-located-join story in SCALE.md.
  */
object Bench {

  /** The timed suite: 8 TPC-H-class queries (scan/filter/agg, 3-to-6-way
    * broadcast joins, conditional aggregation, disjunctive predicates). */
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q6_forecast_revenue", "q10_returned_items", "q12_priority_shipping",
    "q14_promo_effect", "q19_disjunctive_filter")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors(), 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
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

    // Warmup pass: plan + whole-stage-codegen compilation.
    headline.foreach(q => SparkEntry.queries(q)(spark, sfDir).count())

    // Timed pass.
    val results = headline.map { q =>
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      q -> (System.nanoTime() - t0) / 1e9
    }

    // Bucketed re-timing of the two shuffle-dominated queries: lineitem
    // and orders pre-bucketed on the join key make the fact-to-fact join
    // exchange-free (the durable index replacement — JoinsSpec proves the
    // plan, this measures it). Reported separately; not part of `value`.
    // Disable with SPARK_GRAFT_BENCH_BUCKETED=0.
    val bucketed: Option[Seq[(String, Double)]] =
      if (sys.env.get("SPARK_GRAFT_BENCH_BUCKETED").contains("0")) None
      else try {
        val b = cpus.toInt
        Tables.writeBucketed(
          Tables.load(spark, sfDir, "lineitem"), "bench_li_b", b, "l_orderkey")
        Tables.writeBucketed(
          Tables.load(spark, sfDir, "orders"), "bench_ord_b", b, "o_orderkey")
        val li = spark.table("bench_li_b").cache()
        val ord = spark.table("bench_ord_b").cache()
        li.count(); ord.count()
        val cust = Tables.load(spark, sfDir, "customer")
        val nat = Tables.load(spark, sfDir, "nation")
        val runs: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
          "q3_shipping_priority" ->
            (() => graft.queries.TpchQueries.q3Body(li, ord, cust)),
          "q10_returned_items" ->
            (() => graft.queries.TpchQueries.q10Body(li, ord, cust, nat)))
        runs.foreach(_._2().count()) // warmup
        Some(runs.map { case (k, f) =>
          val t0 = System.nanoTime()
          f().count()
          k -> (System.nanoTime() - t0) / 1e9
        })
      } catch {
        case e: Exception =>
          System.err.println(s"[bench] bucketed mode failed: ${e.getMessage}")
          None
      }

    def jsonMap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val bucketedField =
      bucketed.map(b => s""","bucketed":${jsonMap(b)}""").getOrElse("")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${jsonMap(results)}$bucketedField,"sf":"$sfDir"}"""
    // stdout for the driver's log scrape AND a file for robust parsing
    // (sbt prefixes stdout lines with [info], which breaks json.loads).
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LAST.json"), line + "\n")
    spark.stop()
  }
}
