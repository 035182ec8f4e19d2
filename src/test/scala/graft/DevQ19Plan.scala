package graft

/** Dev-only: q19's join strategy at the ×30 point (the steepest
  * headline α — the growing broadcast build is the step). */
object DevQ19Plan {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    Seq("/root/testdata/sf0.1" -> "x1", "/tmp/graft_scale/x30" -> "x30")
      .foreach { case (dir, lbl) =>
        val df = SparkEntry.queries("q19_disjunctive_filter")(spark, dir)
        Force.run(df)
        val p = df.queryExecution.executedPlan.toString
        val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
        val smj = p.linesIterator.count(_.contains("SortMergeJoin"))
        val shj = p.linesIterator.count(_.contains("ShuffledHashJoin"))
        println(s"[devq19] $lbl broadcastHash=$bhj sortMerge=$smj shuffledHash=$shj")
      }
    spark.stop()
  }
}
