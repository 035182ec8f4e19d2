package graft

import java.nio.file.Files

/** Smoke test for the interactive SQL entry point: runs the reference's
  * own example statements (Microbase.scala:943-946 — CREATE TABLE R/S/T
  * over pipe-delimited CSVs, then a projected/ordered/limited SELECT)
  * through Repl.runStatement and checks the pipe-printed output. */
class ReplSpec extends GraftSuite {

  private lazy val dataDir = {
    val dir = Files.createTempDirectory("graft-repl-")
    Files.writeString(dir.resolve("R.data"), "1|10\n2|20\n3|30\n2|25\n")
    Files.writeString(dir.resolve("S.data"),
      "1|alpha|2020-01-05\n2|beta|2021-03-09\n3|gamma|2022-12-31\n")
    Files.writeString(dir.resolve("T.data"), "1|100\n2|200\n")
    dir
  }

  private def run(sql: String): Seq[String] =
    Repl.runStatement(spark, sql).toSeq

  test("reference DDL registers pipe-delimited CSV tables via spark.sql") {
    // The reference's commented-in statements, M:944-946 (paths swapped
    // for fixture copies; the dialect is identical — it IS Spark SQL).
    assert(run(s"""CREATE TABLE r_repl (bar int, baz int) USING csv
        OPTIONS(path '$dataDir/R.data', delimiter '|');""").isEmpty)
    assert(run(s"""CREATE TABLE s_repl (c int, b string, a date) USING csv
        OPTIONS(path '$dataDir/S.data', delimiter '|');""").isEmpty)
    assert(run(s"""CREATE TABLE t_repl (c int, d int) USING csv
        OPTIONS(path '$dataDir/T.data', delimiter '|');""").isEmpty)
    assert(run("SELECT count(*) FROM r_repl") === Seq("4"))
  }

  test("reference SELECT prints pipe-delimited rows in order") {
    run(s"""CREATE TABLE IF NOT EXISTS r_repl (bar int, baz int) USING csv
        OPTIONS(path '$dataDir/R.data', delimiter '|');""")
    // M:943 — projection with computed alias, multi-key sort, limit.
    val out = run(
      "SELECT bar, bar * 15 as biz, baz FROM r_repl Order by bar asc,baz asc limit 10;")
    assert(out === Seq("1|15|10", "2|30|20", "2|30|25", "3|45|30"))
  }

  test("dates render ISO like the reference printer and nulls are safe") {
    run(s"""CREATE TABLE IF NOT EXISTS s_repl (c int, b string, a date) USING csv
        OPTIONS(path '$dataDir/S.data', delimiter '|');""")
    val out = run("SELECT c, a FROM s_repl ORDER BY c")
    assert(out === Seq("1|2020-01-05", "2|2021-03-09", "3|2022-12-31"))
    assert(run("SELECT CAST(NULL AS INT), 'x'") === Seq("null|x"))
  }

  test("a line with multiple ;-separated statements runs each in order") {
    val out = Repl.runLine(spark,
      s"""CREATE TABLE IF NOT EXISTS r_repl (bar int, baz int) USING csv
          OPTIONS(path '$dataDir/R.data', delimiter '|');
          SELECT count(*) FROM r_repl; SELECT max(baz) FROM r_repl""").toSeq
    assert(out === Seq("4", "30"))
    // semicolons inside string literals do not split
    assert(Repl.runLine(spark, "SELECT 'a;b'; SELECT 2").toSeq === Seq("a;b", "2"))
    assert(Repl.splitStatements("SELECT 'it''s; fine'; SELECT 1").size === 2)
  }

  test("source <file> runs every statement of a script") {
    val script = Files.createTempFile("graft-repl-script-", ".sql")
    Files.writeString(script,
      s"""CREATE TABLE IF NOT EXISTS t_repl (c int, d int) USING csv
          OPTIONS(path '$dataDir/T.data', delimiter '|');
          SELECT count(*) FROM t_repl;
          SELECT c, d FROM t_repl ORDER BY c;""")
    val out = Repl.runLine(spark, s"source $script").toSeq
    assert(out === Seq("2", "1|100", "2|200"))
  }

  test("reference index options map to cache / pruning, table stays queryable") {
    // M:994-1024 — the reference builds a hash index and a tree index at
    // CREATE from OPTIONS. Here hash_index → eager table cache (the
    // in-memory equi-join build side), tree_index → already served by
    // parquet/CSV pushdown + min-max pruning, logged only.
    run(s"""CREATE TABLE idx_repl (bar int, baz int) USING csv
        OPTIONS(path '$dataDir/R.data', delimiter '|',
                hash_index 'bar', tree_index 'baz');""")
    assert(spark.catalog.isCached("idx_repl"),
      "hash_index option should cache the table")
    assert(run("SELECT bar, baz FROM idx_repl WHERE bar = 2 ORDER BY baz")
      === Seq("2|20", "2|25"))
    spark.catalog.uncacheTable("idx_repl")
  }

  test("main-equivalent loop runs the reference smoke session end-to-end") {
    // The production read-eval-print loop (Repl.loop — exactly what
    // Repl.main binds to StdIn/println) driven with the reference's own
    // commented-in smoke session (M:943-946): CREATE R/S/T over
    // pipe-delimited CSVs, then the projected/ordered/limited SELECT —
    // plus a failing statement mid-session to pin error recovery, and
    // `exit` to terminate. Asserts the full emission stream: a "$>"
    // prompt before every read and the pipe-formatted rows in order.
    val session = Iterator(
      s"""CREATE TABLE r_loop (bar int, baz int) USING csv
          OPTIONS(path '$dataDir/R.data', delimiter '|');""",
      s"""CREATE TABLE s_loop (c int, b string, a date) USING csv
          OPTIONS(path '$dataDir/S.data', delimiter '|');""",
      s"""CREATE TABLE t_loop (c int, d int) USING csv
          OPTIONS(path '$dataDir/T.data', delimiter '|');""",
      "SELECT broken FROM nowhere", // must not kill the loop (M: try/eval)
      "SELECT bar, bar * 15 as biz, baz FROM r_loop Order by bar asc,baz asc limit 10;",
      "exit")
    val emitted = Seq.newBuilder[String]
    Repl.loop(spark, () => session.next(), emitted += _)
    assert(emitted.result() === Seq(
      "$>", "$>", "$>", "$>", "$>",
      "1|15|10", "2|30|20", "2|30|25", "3|45|30",
      "$>"))
  }

  test("join across the repl-created tables works") {
    run(s"""CREATE TABLE IF NOT EXISTS r_repl (bar int, baz int) USING csv
        OPTIONS(path '$dataDir/R.data', delimiter '|');""")
    run(s"""CREATE TABLE IF NOT EXISTS t_repl (c int, d int) USING csv
        OPTIONS(path '$dataDir/T.data', delimiter '|');""")
    val out = run(
      "SELECT bar, d FROM r_repl JOIN t_repl ON bar = c ORDER BY bar, d")
    assert(out === Seq("1|100", "2|200", "2|200"))
  }
}
