package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Source/DDL coverage (SURVEY.md §2a): the reference's pipe-delimited CSV
  * loader with declared schema (S1/S2), eager materialization, and the
  * five reference primitive types — rebuilt over Spark's CSV source. */
class SourcesSpec extends GraftSuite {

  test("pipe-delimited CSV round-trips the nation table") {
    val dir = Files.createTempDirectory("graft-csv-").toString
    val nation = Tables.nation(spark, sf)
    nation.write.mode("overwrite").option("delimiter", "|").csv(dir)
    val schema = Tables.referenceSchema(
      "n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int")
    val loaded = Tables.createCsvTable(spark, "nation_csv", dir, schema)
    // reference uppercases registered names (Microbase.scala:953-958)
    assert(loaded.columns.toSeq === Seq("N_NATIONKEY", "N_NAME", "N_REGIONKEY"))
    assert(loaded.count() === nation.count())
    val viaSql = spark.sql(
      "SELECT count(*) AS n FROM nation_csv WHERE N_REGIONKEY = 0")
      .collect().head.getLong(0)
    val expected = nation.filter(col("n_regionkey") === 0).count()
    assert(viaSql === expected)
  }

  test("eager load materializes at create (cache) like the reference") {
    val dir = Files.createTempDirectory("graft-csv2-").toString
    Tables.region(spark, sf).write.mode("overwrite")
      .option("delimiter", "|").csv(dir)
    val schema = Tables.referenceSchema(
      "r_regionkey" -> "int", "r_name" -> "string")
    val df = Tables.createCsvTable(spark, "region_csv", dir, schema,
      eager = true)
    df.count() // force
    assert(df.storageLevel.useMemory, "eager table should be cached")
    df.unpersist()
  }

  test("reference type mapping covers exactly the five primitive types") {
    import org.apache.spark.sql.types._
    assert(Tables.referenceType("int") === IntegerType)
    assert(Tables.referenceType("float") === FloatType)
    assert(Tables.referenceType("double") === DoubleType)
    assert(Tables.referenceType("date") === DateType)
    assert(Tables.referenceType("string") === StringType)
    intercept[IllegalArgumentException](Tables.referenceType("decimal"))
  }

  test("partitioned parquet writes prune partitions at read time") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-part-").toString
    Tables.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val pruned = spark.read.parquet(dir)
      .filter(col("day") === lit("2024-01-05").cast("date"))
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    // the day predicate must land in PartitionFilters (directory pruning),
    // NOT in PushedFilters/post-scan Filter — at 100 TB this is the
    // difference between listing one directory and scanning everything.
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
      .contains("day"), plan)
    val expected = Tables.events(spark, sf)
      .filter(to_date(col("ts")) === lit("2024-01-05").cast("date")).count()
    assert(pruned.count() === expected)
  }

  test("fixture dtype contract: events/documents/embeddings pin their types") {
    import org.apache.spark.sql.types._
    // The loader surface GUARANTEES these downstream types. The driver
    // has regenerated fixtures with changed physical types before (events
    // ts: TIMESTAMP(NANOS) → TIMESTAMP(MICROS) across rounds, round 7
    // broke 64 queries before the schema-adaptive loader) — this test
    // exists so any future dtype drift in ANY of the three beyond-TPC-H
    // fixtures fails HERE, loudly, instead of as 64 mysterious query
    // regressions.
    def assertSchema(
        name: String, df: org.apache.spark.sql.DataFrame,
        expected: Seq[(String, DataType)]): Unit = {
      val got = df.schema.map(f => f.name -> f.dataType)
      assert(got === expected,
        s"$name fixture drifted: got $got, contract is $expected")
    }
    assertSchema("events", Tables.events(spark, sf), Seq(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType))
    assertSchema("documents", Tables.documents(spark, sf), Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assertSchema("embeddings", Tables.embeddings(spark, sf), Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))
    // Negative leg: a synthetic drifted fixture MUST trip the same check
    // (proves the contract detects drift rather than vacuously passing).
    val dir = Files.createTempDirectory("graft-drift-").toString
    Tables.documents(spark, sf)
      .withColumn("n_chars", col("n_chars").cast("int"))   // long → int
      .withColumn("doc_id", col("doc_id").cast("string")) // long → string
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    intercept[org.scalatest.exceptions.TestFailedException] {
      assertSchema("documents", Tables.documents(spark, dir), Seq(
        "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
        "source" -> StringType, "n_chars" -> LongType))
    }
  }

  test("date columns parse as epoch-day-equivalent DateType") {
    val dir = Files.createTempDirectory("graft-csv3-").toString
    Files.writeString(java.nio.file.Paths.get(dir, "s.data"),
      "1|hello|2020-03-15\n2|world|1999-12-31\n")
    val schema = Tables.referenceSchema(
      "c" -> "int", "b" -> "string", "a" -> "date")
    val df = Tables.createCsvTable(spark, "s_csv", dir, schema)
    val dates = df.orderBy("C").select("A").collect()
      .map(_.getDate(0).toString)
    assert(dates === Array("2020-03-15", "1999-12-31"))
  }
}
