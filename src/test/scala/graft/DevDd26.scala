package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Pipeline, TextAnalysis}
import graft.sources.Tables

/** Dev-only dd26 stage decomposition at sf0.1: where does the 1.4 s
  * duplicate-span row spend — gram explode, the gram-keyed count
  * window, or the doc-keyed interval union? */
object DevDd26 {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, "/root/testdata/sf0.1").cache()
    docs.count()
    val k = 5
    def grams() = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), posexplode(
        transform(
          sequence(lit(1), size(col("toks")) - (k - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(k)))))
        .as(Seq("p0", "gram")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"),
        col("gram"))
    def hits() = grams()
      .withColumn("_n", count(lit(1)).over(Window.partitionBy(col("gram"))))
      .filter(col("_n") > 1L)
      .select(col("doc_id"), col("pos").as("s"),
        (col("pos") + (k - 1)).cast("long").as("e"))
    // variant: aggregate-then-semijoin — dup grams are FEW (only
    // recurring ones), so count with map-side combine then semi-join
    // the gram stream against the dup set instead of windowing the
    // full gram corpus
    def hitsSemi() = {
      val g = grams()
      val dups = g.groupBy("gram").agg(count(lit(1)).as("_n"))
        .filter(col("_n") > 1L).select("gram")
      g.join(dups, Seq("gram"), "left_semi")
        .select(col("doc_id"), col("pos").as("s"),
          (col("pos") + (k - 1)).cast("long").as("e"))
    }
    val cases = Seq(
      "grams_only" -> (() => grams()),
      "hits_window" -> (() => hits()),
      "hits_semijoin" -> (() => hitsSemi()),
      "full_dd26" -> (() => SparkEntry.queries("dd26_dup_spans")(spark, "/root/testdata/sf0.1")))
    cases.foreach { case (_, f) => Force.run(f()); Pipeline.releaseCaches() }
    cases.foreach { case (lbl, f) =>
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Force.run(f())
        val s = (System.nanoTime() - t0) / 1e9
        Pipeline.releaseCaches(); s
      }
      println(f"[devdd26] $lbl%-14s min ${reps.min}%.3f s reps ${reps.map(r => f"$r%.3f").mkString(",")}")
    }
    // sanity: identical hit sets
    val a = hits().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = hitsSemi().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    println(s"[devdd26] hit-set equal: ${a == b} (${a.size} rows)")
    spark.stop()
  }
}
