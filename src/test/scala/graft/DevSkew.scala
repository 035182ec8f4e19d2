package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Pipeline

/** Dev-only skew A/B for the corpus-wide occurrence count in
  * repeatedChunkStats/duplicateSpans: whole-partition WINDOW
  * (count over partitionBy(key); no map-side combine, one task per hot
  * key, AQE cannot split a window partition) vs GROUPBY+JOIN-BACK
  * (partial agg collapses hot keys before the shuffle; SMJ streams and
  * AQE skew-join can split). Run on the x10 replica docs (organic key
  * distribution) and on a skewed variant (one chunk repeated ~400k
  * times via text duplication). */
object DevSkew {
  def windowForm(chunks: DataFrame): DataFrame =
    chunks
      .withColumn("n_occ", count(lit(1)).over(Window.partitionBy(col("chunk_md5"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_occ") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))

  def joinForm(chunks: DataFrame): DataFrame = {
    val occ = chunks.groupBy("chunk_md5").agg(count(lit(1)).as("n_occ"))
    chunks.join(occ, "chunk_md5")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("n_occ") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/tmp/graft_scale/x10/documents.parquet")
      .select("doc_id", "text")
    // skewed corpus: every doc also contributes one IDENTICAL 16-token
    // boilerplate prefix chunk (the hot-key shape: one chunk_md5 carries
    // |corpus| occurrences)
    val hot = (1 to 16).map(_ => "boilerplate").mkString(" ")
    val skewed = base.select(col("doc_id"),
      concat(lit(hot + " "), col("text")).as("text"))
    for ((lbl, docs) <- Seq("organic_x10" -> base, "skewed_x10" -> skewed)) {
      val chunks = Pipeline.chunkByTokens(docs, col("doc_id"), col("text"), 16, 16)
        .persist()
      chunks.count()
      for ((form, f) <- Seq("window" -> (windowForm _), "joinback" -> (joinForm _))) {
        Force.run(f(chunks)) // warmup
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); Force.run(f(chunks)); (System.nanoTime() - t0) / 1e9
        }
        println(f"[devskew] $lbl%-12s $form%-9s min ${ts.min}%.3f s reps ${ts.map(t => f"$t%.3f").mkString(",")}")
      }
      // equivalence while we're here
      val a = windowForm(chunks).orderBy("doc_id").collect()
      val b = joinForm(chunks).orderBy("doc_id").collect()
      assert(a.sameElements(b), s"$lbl: forms disagree")
      chunks.unpersist()
    }
    spark.stop()
  }
}
