package graft

import org.apache.spark.sql.SparkSession

/** Interactive SQL shell — the reference's user-facing entry point
  * (Microbase.scala:942-1099: `while(true) { readLine → parse → eval →
  * pipe-print }`), re-expressed on Spark.
  *
  * The reference hand-rolls a Catalyst-dialect parser, a CSV loader for
  * `CREATE TABLE ... USING csv OPTIONS(path ..., delimiter '|')`, and a
  * row printer; on Spark every one of those is `spark.sql`: the same DDL
  * is native Spark SQL (the reference copied the dialect from Spark in the
  * first place), and queries run through the full Catalyst + Tungsten
  * stack instead of an interpreted volcano loop.
  *
  * Output format mirrors the reference's printer (Microbase.scala:1072-1085):
  * one row per line, columns `|`-separated, dates rendered ISO
  * (LocalDate.ofEpochDay ⇒ yyyy-MM-dd, which is exactly
  * java.sql.Date.toString here). Results stream through
  * `toLocalIterator` so a huge SELECT never materializes on the driver.
  */
object Repl {

  /** Render one cell the way the reference prints it. */
  def render(v: Any): String = v match {
    case null               => "null"
    case d: java.sql.Date   => d.toString // ISO yyyy-MM-dd (M:1078-1080)
    case t: java.sql.Timestamp => t.toLocalDateTime.toString
    case other              => other.toString
  }

  /** Execute one statement; return an iterator of pipe-joined rows.
    * DDL (CREATE TABLE ...) returns an empty result, like the reference. */
  def runStatement(spark: SparkSession, statement: String): Iterator[String] = {
    val sql = statement.trim.stripSuffix(";").trim
    if (sql.isEmpty) Iterator.empty
    else {
      val df = spark.sql(sql)
      import scala.jdk.CollectionConverters._
      df.toLocalIterator().asScala
        .map(row => row.toSeq.map(render).mkString("|"))
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-repl")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var line: String = null
    while ({
      println("$>")
      line = scala.io.StdIn.readLine()
      line != null && line.trim != "exit" && line.trim != "quit"
    }) {
      try runStatement(spark, line).foreach(println)
      catch { case e: Exception => System.err.println(e.getMessage) }
    }
    spark.stop()
  }
}
