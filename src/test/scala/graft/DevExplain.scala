package graft

/** Dev-only: print the executed join strategy of q19 at x1 vs x30. */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    for ((lbl, dir) <- Seq("x1" -> "/root/testdata/sf0.1",
        "x30" -> "/tmp/graft_scale/x30")) {
      val df = SparkEntry.queries("q19_disjunctive_filter")(spark, dir)
      Force.run(df)
      val plan = df.queryExecution.executedPlan.toString
      val joins = plan.linesIterator.filter(_.contains("Join")).map(_.trim.take(80)).toList
      println(s"[devex] $lbl joins: ${joins.mkString(" | ")}")
    }
    spark.stop()
  }
}
