package graft

object DevQ15 {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    // q15's entry persists + pins its revenue frame at CONSTRUCTION
    // time; release between constructions like every rep-loop caller
    // (RewriteAb does the same) or a dev loop accumulates pinned frames
    val df = SparkEntry.queries("q15_top_supplier")(spark, "/root/testdata/sf0.1")
    Force.run(df)
    val p = df.queryExecution.executedPlan.toString
    val scans = p.linesIterator.count(l => l.contains("Scan parquet") && l.contains("lineitem"))
    val inmem = p.linesIterator.count(l => l.contains("InMemory") && l.toLowerCase.contains("lineitem"))
    val aggs = p.linesIterator.count(_.trim.startsWith("+- *(") )
    println(s"[devq15] lineitem parquet scans=$scans inmem=$inmem")
    println(p.linesIterator.filter(l => l.contains("Scan") || l.contains("HashAggregate") && l.contains("l_suppkey")).take(12).map(_.trim.take(100)).mkString("\n"))
    graft.ops.Pipeline.releaseCaches()
  }
}
