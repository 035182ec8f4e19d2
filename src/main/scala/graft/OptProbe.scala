package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.sources.Tables

/** Round-20 optimization probe harness: same-session A/B of runtime-conf
  * candidates over the catalog queries they could move, under the Bench
  * timing discipline (warmup, interleaved reps, min reported, GC delta
  * per rep). Same-session interleaving is the house method for A/B
  * decisions — cross-capture ratios are confounded by machine-hour drift
  * (SCALE.md drift watch).
  *
  * Case A (guide §3.1): AQE SortMergeJoin → ShuffledHashJoin conversion
  * (`spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold`). The five
  * timed-suite queries whose final plans carry a SortMergeJoin today:
  * q9 (lineitem⋈partsupp), q20 (partsupp⋈agg'd lineitem), dd25
  * (left-outer gate join), ss4 (probe⋈corpus on cid, 64-dim payload
  * through two sorts), dd27 (agreement left-outers).
  *
  * Run: `sbt "runMain graft.OptProbe <sfDir>"`. Output: one JSON line
  * per (query, mode) with min/reps, written to SPARK_GRAFT_OPTPROBE_OUT
  * (default /tmp/optprobe.json) and echoed to stdout.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors(), 32).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-optprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", (1L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (64L << 10).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-optprobe-wh-").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.tpch.foreach { t => Tables.load(spark, sfDir, t).cache().count() }

    val queries = sys.env.get("SPARK_GRAFT_OPTPROBE_QUERIES")
      .map(_.split(",").toSeq).getOrElse(Seq(
        "q9_product_profit", "q20_part_promotion", "dd25_ingest_pipeline",
        "ss4_ivf_topk", "dd27_lsh_signal_agreement"))
    // modes: conf-key settings applied around each run (runtime AQE confs)
    val modes: Seq[(String, Map[String, String])] = Seq(
      "smj" -> Map(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "0"),
      "shj" -> Map(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold" -> "67108864"))

    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
    }
    def run(q: String, confs: Map[String, String]): (Double, Long) = {
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toSeq
      try {
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        val gc0 = gcMillis(); val t0 = System.nanoTime()
        Force.run(SparkEntry.queries(q)(spark, sfDir))
        val r = ((System.nanoTime() - t0) / 1e9, gcMillis() - gc0)
        graft.ops.Pipeline.releaseCaches()
        r
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
    // warmup both modes (codegen per distinct final plan)
    for (q <- queries; (_, confs) <- modes) run(q, confs)
    val acc = collection.mutable.Map[(String, String), Vector[(Double, Long)]]()
      .withDefaultValue(Vector.empty)
    val reps = sys.env.get("SPARK_GRAFT_OPTPROBE_REPS").map(_.toInt).getOrElse(3)
    // Mode order ALTERNATES per rep (round-20 lesson: with a fixed
    // order, decaying host load reads as a systematic win for whichever
    // mode runs second — the falsified shj "win" of probe run 1).
    (1 to reps).foreach { r =>
      val ms = if (r % 2 == 0) modes.reverse else modes
      for (q <- queries; (mode, confs) <- ms)
        acc((q, mode)) :+= run(q, confs)
    }
    // Rewrite probes: code-shape A/Bs (label -> the two plan builders),
    // timed under the same discipline. dd26: the corpus-wide gram
    // occurrence count as a window over hashpartitioning(gram) + string
    // sort (incumbent, 1 exchange always) vs groupBy(gram).count>1 +
    // left-semi join back (partial map-side agg, no sort; AQE broadcasts
    // the dup-gram set when small, degrades to a second gram exchange
    // when not — data-dependent at scale).
    import org.apache.spark.sql.functions._
    def dd26SemiForm(s: SparkSession, d: String): DataFrame = {
      val k = 5
      val grams = Tables.documents(s, d)
        .select(col("doc_id"),
          graft.ops.TextAnalysis.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= k)
        .select(col("doc_id"), posexplode(
          transform(
            sequence(lit(1), size(col("toks")) - (k - 1)),
            i => concat_ws(" ", slice(col("toks"), i, lit(k)))))
          .as(Seq("p0", "gram")))
        .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
          col("gram"))
      val dup = grams.groupBy("gram").agg(count(lit(1)).as("_n"))
        .filter(col("_n") > 1L).select("gram")
      val hits = grams.join(dup, Seq("gram"), "left_semi")
        .select(col("doc_id"), col("pos").as("s"),
          (col("pos") + (k - 1)).cast("long").as("e"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("s").asc, col("e").asc)
      val prevMax = max(col("e")).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
      hits
        .withColumn("_nf",
          when(prevMax.isNull || col("s") > prevMax + 1L, 1L).otherwise(0L))
        .withColumn("span_id",
          sum(col("_nf")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "span_id")
        .agg(
          min(col("s")).as("span_start"),
          max(col("e")).as("span_end"),
          (max(col("e")) - min(col("s")) + 1L).as("span_tokens"))
        .orderBy("doc_id", "span_start")
    }
    // PQ-encoder shape (the ss20_train hot loop): per corpus row, argmin
    // over codebookSize sub-vector distances in each of m subspaces —
    // m·cb distance folds per row. Times the round-20 native vec_sqdist
    // against the retired interpreted aggregate(zip_with) fold on
    // identical plans (both forms bit-identical by SimilaritySpec).
    def pqCodeShape(dist: (Column, Column) => Column): DataFrame = {
      val m = 8; val sub = 8; val cb = 32
      def litVec(v: Seq[Double]): Column = array(v.map(lit): _*)
      val books: Seq[Seq[Seq[Double]]] = Seq.tabulate(m)(j =>
        Seq.tabulate(cb)(c => Seq.tabulate(sub)(dd =>
          ((j * 31 + c * 17 + dd * 7) % 100).toDouble / 50.0 - 1.0)))
      val emb = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"),
          graft.ops.Similarity.asDouble(col("embedding")).as("vec"))
      def codeExpr(j: Int): Column = {
        val dists = array(books(j).map(c =>
          dist(slice(col("vec"), j * sub + 1, sub), litVec(c))): _*)
        (array_position(dists, array_min(dists)) - 1).cast("int")
      }
      emb.select(
        col("vec_id") +: (0 until m).map(j => codeExpr(j).as(s"_c$j")): _*)
    }
    // dd26 with the RETIRED interpreted gram builder (the pre-round-20
    // transform/sequence/slice HOF) but the incumbent window shape —
    // isolates the native word_ngrams swap from everything else.
    def dd26RetiredGrams(s: SparkSession, d: String): DataFrame = {
      val k = 5
      val grams = Tables.documents(s, d)
        .select(col("doc_id"),
          graft.ops.TextAnalysis.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= k)
        .select(col("doc_id"), posexplode(
          transform(
            sequence(lit(1), size(col("toks")) - (k - 1)),
            i => concat_ws(" ", slice(col("toks"), i, lit(k)))))
          .as(Seq("p0", "gram")))
        .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
          col("gram"))
      import org.apache.spark.sql.expressions.Window
      val hits = grams
        .withColumn("_n",
          count(lit(1)).over(Window.partitionBy(col("gram"))))
        .filter(col("_n") > 1L)
        .select(col("doc_id"), col("pos").as("s"),
          (col("pos") + (k - 1)).cast("long").as("e"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("s").asc, col("e").asc)
      val prevMax = max(col("e")).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
      hits
        .withColumn("_nf",
          when(prevMax.isNull || col("s") > prevMax + 1L, 1L).otherwise(0L))
        .withColumn("span_id",
          sum(col("_nf")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "span_id")
        .agg(
          min(col("s")).as("span_start"),
          max(col("e")).as("span_end"),
          (max(col("e")) - min(col("s")) + 1L).as("span_tokens"))
        .orderBy("doc_id", "span_start")
    }
    val rewriteCases: Seq[(String, () => DataFrame)] = Seq(
      "dd26_window" ->
        (() => SparkEntry.queries("dd26_dup_spans")(spark, sfDir)),
      "dd26_retired_grams" -> (() => dd26RetiredGrams(spark, sfDir)),
      "dd26_semi" -> (() => dd26SemiForm(spark, sfDir)),
      "pqcode_native" ->
        (() => pqCodeShape(graft.functions.Vectors.vec_sqdist)),
      "pqcode_hof" ->
        (() => pqCodeShape(graft.ops.Similarity.sqDistDeclarative)))
    def runCase(f: () => DataFrame): (Double, Long) = {
      val gc0 = gcMillis(); val t0 = System.nanoTime()
      Force.run(f())
      val r = ((System.nanoTime() - t0) / 1e9, gcMillis() - gc0)
      graft.ops.Pipeline.releaseCaches()
      r
    }
    val caseAcc = collection.mutable.Map[String, Vector[(Double, Long)]]()
      .withDefaultValue(Vector.empty)
    if (!sys.env.get("SPARK_GRAFT_OPTPROBE_REWRITES").contains("0")) {
      rewriteCases.foreach { case (_, f) => runCase(f) } // warmup
      (1 to reps).foreach { r =>
        val cs = if (r % 2 == 0) rewriteCases.reverse else rewriteCases
        cs.foreach { case (l, f) => caseAcc(l) :+= runCase(f) }
      }
    }

    val sb = new StringBuilder
    for ((l, _) <- rewriteCases; rs = caseAcc(l) if rs.nonEmpty) {
      val line = s"""{"case":"$l","min":${rs.map(_._1).min},""" +
        s""""reps":${rs.map(r => f"${r._1}%.4f").mkString("[", ",", "]")},""" +
        s""""gc_ms":${rs.map(_._2).mkString("[", ",", "]")}}"""
      println("[optprobe] " + line)
      sb.append(line).append('\n')
    }
    for (q <- queries; (mode, _) <- modes) {
      val rs = acc((q, mode))
      val line = s"""{"query":"$q","mode":"$mode","min":${rs.map(_._1).min},""" +
        s""""reps":${rs.map(r => f"${r._1}%.4f").mkString("[", ",", "]")},""" +
        s""""gc_ms":${rs.map(_._2).mkString("[", ",", "]")}}"""
      println("[optprobe] " + line)
      sb.append(line).append('\n')
    }
    val out = sys.env.getOrElse("SPARK_GRAFT_OPTPROBE_OUT", "/tmp/optprobe.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    spark.stop()
  }
}
