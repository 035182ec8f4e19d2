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
  * A line may hold several `;`-separated statements, and
  * `source <file>` runs a script of statements — the two conveniences
  * the reference's one-statement-per-readLine loop lacks.
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

  /** Split input into individual SQL statements on `;`, ignoring
    * semicolons inside '…'/"…"/`…` quoted literals and identifiers
    * (doubled quotes re-enter quote mode, so '' escapes survive). */
  def splitStatements(input: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    input.foreach { c =>
      if (quote != 0) {
        cur.append(c)
        if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' | '`' => quote = c; cur.append(c)
        case ';' => out += cur.toString; cur.clear()
        case _ => cur.append(c)
      }
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Execute one input line, which may hold several `;`-separated
    * statements and/or `source <file>` commands (the file's statements
    * run in order, split the same way). Output rows concatenate in
    * statement order, lazily — a huge SELECT still streams. */
  def runLine(spark: SparkSession, line: String): Iterator[String] =
    splitStatements(line).iterator.flatMap { stmt =>
      if (stmt.toLowerCase.startsWith("source ")) {
        val path = stmt.drop("source ".length).trim
        val text = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), "UTF-8")
        splitStatements(text).iterator
          .flatMap(s => runStatement(spark, s))
      } else runStatement(spark, stmt)
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
      try runLine(spark, line).foreach(println)
      catch { case e: Exception => System.err.println(e.getMessage) }
    }
    spark.stop()
  }
}
