package graft

import org.apache.spark.sql.functions._

/** Dev-only: exchange census for the ta14 catalog vs lag forms. */
object DevTa14Plan {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.spark
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    def census(lbl: String, df: org.apache.spark.sql.DataFrame): Unit = {
      Force.run(df)
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      import org.apache.spark.sql.execution.SortExec
      def walk(p: SparkPlan): (Int, Int) = {
        val self = p match {
          case _: ShuffleExchangeLike => (1, 0)
          case _: SortExec => (0, 1)
          case _ => (0, 0)
        }
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(walk(a.executedPlan))
          case q: QueryStageExec => Seq(walk(q.plan))
          case o => o.children.map(walk)
        }
        kids.foldLeft(self) { case ((e, s), (e2, s2)) => (e + e2, s + s2) }
      }
      val (ex, so) = walk(df.queryExecution.executedPlan)
      println(s"[devta14plan] $lbl exchanges=$ex sorts=$so")
    }
    census("retired_2w", graft.ops.TextAnalysis.stripBoilerplateChunksTwoWindow(
      docs, col("doc_id"), col("text"), 8, 1L).orderBy("doc_id"))
    census("catalog_lag", graft.ops.TextAnalysis.stripBoilerplateChunks(
      docs, col("doc_id"), col("text"), 8, 1L).orderBy("doc_id"))
    spark.stop()
  }
}
