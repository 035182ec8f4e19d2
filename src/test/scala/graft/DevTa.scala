package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Dev-only decomposition probe for the ta16/ta2 constant-factor pass:
  * times each rule metric in isolation on cached sf0.1 documents,
  * plus candidate variant expressions, min-of-3 via Force.run. */
object DevTa {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").cache()
    docs.count()

    val toks = split(col("text"), " ")
    val nWords = size(toks)
    val stopw = TextAnalysis.gopherStopwords
    val cases: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "baseline_id" -> col("doc_id"),
      "n_words" -> nWords,
      "mean_word_len" -> ((length(col("text")) - (nWords - lit(1))).cast("double") / nWords.cast("double")),
      "symbol_repl" -> (length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double") / nWords.cast("double")),
      "symbol_count" -> (regexp_count(col("text"), lit("[^a-z0-9 ]")).cast("double") / nWords.cast("double")),
      "alpha_hof" -> (size(filter(toks, t => t.rlike("^[a-z]+$"))).cast("double") / nWords.cast("double")),
      "alpha_la" -> (regexp_count(col("text"), lit("(?<=^| )[a-z]+(?= |$)")).cast("double") / nWords.cast("double")),
      "stop_hof" -> size(filter(typedLit(stopw), w => array_contains(toks, w))),
      "stop_intersect" -> size(array_intersect(toks, typedLit(stopw))),
      "ta2_punct_repl" -> (length(regexp_replace(lower(col("text")), "[a-z0-9\\s]", "")).cast("double") / greatest(length(col("text")), lit(1)).cast("double")),
      "ta2_punct_count" -> (regexp_count(lower(col("text")), lit("[^a-z0-9\\s]")).cast("double") / greatest(length(col("text")), lit(1)).cast("double")),
      "ta2_stopratio" -> TextAnalysis.stopwordRatio(col("text")),
      "ta2_stop_rx" -> (regexp_count(lower(col("text")), lit("(?<=^|\\s)(the|a|of|and|is|to|in)(?=\\s|$)")).cast("double") / greatest(size(split(lower(col("text")), "\\s+")), lit(1)).cast("double")),
      "ta2_full" -> TextAnalysis.qualityScore(col("text")),
      "ta16_full" -> lit(0) // placeholder, replaced below
    )
    cases.foreach { case (name, c) =>
      val df = if (name == "ta16_full")
        docs.select(col("doc_id") +: TextAnalysis.gopherRules(col("text"), 20): _*)
      else docs.select(col("doc_id"), c.as("v"))
      Force.run(df) // warmup
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Force.run(df)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[devta] $name%-18s min ${times.min}%.3f s  reps ${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
