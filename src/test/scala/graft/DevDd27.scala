package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Pipeline}
import graft.sources.Tables

/** Dev-only dd27 per-signal cost decomposition at sf0.1 (round-18
  * verdict item 3: which signal leg dominates the ~1.9 s row?). */
object DevDd27 {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d).cache()
    docs.count()
    def legs(): Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "exact_text" -> (() => Dedup.keyEqualityPairs(
        docs, col("doc_id"), col("text"))),
      "prefix64" -> (() => Dedup.keyEqualityPairs(
        docs, col("doc_id"), substring(col("text"), 1, 64))),
      "minhash_j05" -> (() => Dedup.minhashNearDupPairs(
        docs, col("doc_id"), col("text"),
        shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5)
        .select("id_a", "id_b")),
      "simhash_h3" -> (() => Dedup.simhashNearDupPairs(
        docs, col("doc_id"), col("text"), maxHamming = 3)
        .select("id_a", "id_b")))
    // warmup then min-of-3 per leg, Force-timed
    legs().foreach { case (_, f) => Force.run(f()); Pipeline.releaseCaches() }
    legs().foreach { case (lbl, f) =>
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Force.run(f())
        val s = (System.nanoTime() - t0) / 1e9
        Pipeline.releaseCaches(); s
      }
      println(f"[devdd27] $lbl%-12s min ${reps.min}%.3f s reps ${reps.map(r => f"$r%.3f").mkString(",")}")
    }
    // and the full composed row for reference
    val full = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      Force.run(SparkEntry.queries("dd27_lsh_signal_agreement")(spark, d))
      val s = (System.nanoTime() - t0) / 1e9
      Pipeline.releaseCaches(); s
    }
    println(f"[devdd27] full_dd27     min ${full.min}%.3f s reps ${full.map(r => f"$r%.3f").mkString(",")}")
    spark.stop()
  }
}
