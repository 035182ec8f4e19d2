package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only ta14 stage decomposition at sf0.1. */
object DevTa14 {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text").cache()
    docs.count()
    val cs = 16
    val chunks = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("chunk_idx", explode(sequence(lit(0),
        ((size(col("toks")) - 1) / lit(cs)).cast("int"))))
      .select(col("doc_id"), col("chunk_idx"),
        concat_ws(" ", slice(col("toks"), col("chunk_idx") * cs + 1, lit(cs))).as("chunk_text"))
      .withColumn("chunk_md5", md5(col("chunk_text")))
    val wDocMark = Window.partitionBy(col("chunk_md5"), col("doc_id")).orderBy(col("chunk_idx").asc)
    val wChunk = Window.partitionBy(col("chunk_md5"))
    val marked = chunks
      .withColumn("_first", when(row_number().over(wDocMark) === 1 && col("doc_id").isNotNull, 1L).otherwise(0L))
      .withColumn("chunk_df", sum(col("_first")).over(wChunk))
    // alternative: chunk array via transform + posexplode (single token-array pass)
    val chunksAlt = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(0), ((size(col("toks")) - 1) / lit(cs)).cast("int")),
        i => concat_ws(" ", slice(col("toks"), i * cs + 1, lit(cs))))).as(Seq("chunk_idx", "chunk_text")))
      .withColumn("chunk_md5", md5(col("chunk_text")))
    val cases = Seq(
      "chunks_only" -> chunks,
      "chunks_alt" -> chunksAlt,
      "marked_windows" -> marked,
      "full_ta14" -> SparkEntry.queries("ta14_boilerplate_strip")(spark, "/root/testdata/sf0.1"))
    cases.foreach { case (lbl, df) =>
      Force.run(df)
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); Force.run(df); (System.nanoTime()-t0)/1e9 }
      println(f"[devta14] $lbl%-15s min ${ts.min}%.3f s reps ${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
