package graft

/** Dev-only micro-timer: `sbt "Test/runMain graft.DevTime <sfDir> <q1> ..."`
  * times named SparkEntry queries (one warmup + one timed run each). */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("dd2_minhash_signature", "dd3_minhash_dup_pairs", "dd4_simhash")
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      // Force.run, not .count(): a count lets Catalyst prune the compute
      Force.run(SparkEntry.queries(n)(spark, sfDir)) // warmup
      val t0 = System.nanoTime()
      Force.run(SparkEntry.queries(n)(spark, sfDir))
      println(f"[devtime] $n%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
