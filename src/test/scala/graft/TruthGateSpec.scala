package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regression gate on the truth-parquet oracle paths.
  *
  * SignatureTruth/MediaTruth sit in Verify's critical path: the
  * dd2/dd3/dd4/mm2–mm7 oracles compare engine output against truth values
  * the builders write to parquet and the DuckDB dual reads back. That
  * makes the truth builders part of the oracle — if one silently drifted
  * to match a broken engine change (same bug on both sides, or a builder
  * edit that copies engine output), the round would re-certify wrong
  * results as green.
  *
  * This spec proves the compare is NON-VACUOUS, by construction: it
  * replicates the oracle's value comparison in-Spark (equijoin on the
  * key, equality on exactly the columns the DuckDB dual selects), asserts
  * it is green against a freshly built truth, then PLANTS a one-row
  * corruption in a copy of the truth and asserts the same compare goes
  * red. A truth builder that stopped constraining engine values would
  * fail the second assert; an engine drift away from the independent
  * scalar recomputation would fail the first.
  */
class TruthGateSpec extends GraftSuite {

  /** Rows where engine and truth disagree on `valueCols` (inner-join on
    * `key`), plus key-set asymmetry — the in-Spark replica of the DuckDB
    * dual's hash compare over the same columns. */
  private def mismatches(
      engine: DataFrame, truth: DataFrame, key: String,
      valueCols: Seq[String]): Long = {
    val t = valueCols.foldLeft(truth) { case (df, c) =>
      df.withColumnRenamed(c, s"t_$c")
    }
    val joined = engine.join(t, Seq(key), "full_outer")
    val anyDiff = valueCols
      .map(c => not(col(c) <=> col(s"t_$c")))
      .reduce(_ || _)
    joined.where(anyDiff).count()
  }

  private def corruptOne(
      truth: DataFrame, key: String, valueCol: String): DataFrame = {
    val firstKey = truth.orderBy(col(key)).select(key).head().get(0)
    truth.withColumn(valueCol,
      when(col(key) === lit(firstKey), col(valueCol) + lit(1L))
        .otherwise(col(valueCol)))
  }

  test("dd2 signature oracle goes red under a planted truth corruption") {
    val dir = java.nio.file.Files.createTempDirectory("sig-truth-gate-")
      .toString
    graft.ops.SignatureTruth.write(spark, sf, dir)
    val engine = SparkEntry.queries("dd2_minhash_signature")(spark, sf)
    val truth = spark.read.parquet(s"$dir/docs.parquet")
      .select("doc_id", "mh_0", "mh_1")
    // green against the honest truth…
    assert(mismatches(engine, truth, "doc_id", Seq("mh_0", "mh_1")) === 0L,
      "engine minhash disagrees with the independent scalar truth")
    // …red against a one-row corruption (the non-vacuity proof)
    val bad = corruptOne(truth, "doc_id", "mh_0")
    assert(mismatches(engine, bad, "doc_id", Seq("mh_0", "mh_1")) === 1L,
      "a corrupted truth row was NOT detected — the oracle compare is vacuous")
  }

  test("mm4 media oracle goes red under a planted truth corruption") {
    val dir = java.nio.file.Files.createTempDirectory("media-truth-gate-")
      .toString
    graft.ops.MediaTruth.write(spark, sf, dir)
    val engine = SparkEntry.queries("mm4_perceptual_hash")(spark, sf)
      .select("media_id", "ahash", "dhash")
    val truth = spark.read.parquet(s"$dir/mm4.parquet")
      .select("media_id", "ahash", "dhash")
    assert(mismatches(engine, truth, "media_id", Seq("ahash", "dhash")) === 0L,
      "engine pHash disagrees with the independent scalar decode truth")
    val bad = corruptOne(truth, "media_id", "ahash")
    assert(mismatches(engine, bad, "media_id", Seq("ahash", "dhash")) === 1L,
      "a corrupted truth row was NOT detected — the oracle compare is vacuous")
  }

  test("a truth row DELETION is detected, not silently dropped") {
    // The DuckDB dual would show a row-count mismatch; the in-Spark
    // replica must catch it through the full-outer join (an inner join
    // would vacuously pass on any truth subset — the exact failure mode
    // this spec exists to rule out).
    val dir = java.nio.file.Files.createTempDirectory("sig-truth-gate2-")
      .toString
    graft.ops.SignatureTruth.write(spark, sf, dir)
    val engine = SparkEntry.queries("dd2_minhash_signature")(spark, sf)
    val truth = spark.read.parquet(s"$dir/docs.parquet")
      .select("doc_id", "mh_0", "mh_1")
    val firstKey = truth.orderBy("doc_id").select("doc_id").head().getLong(0)
    val truncated = truth.where(col("doc_id") =!= firstKey)
    assert(
      mismatches(engine, truncated, "doc_id", Seq("mh_0", "mh_1")) === 1L,
      "a deleted truth row was NOT detected")
  }
}
