package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Unit coverage for the repetition-signal expressions (ta7/ta9 use
  * them); the catalog queries themselves are oracle-checked, this spec
  * pins the per-document edge cases on planted inputs. */
class TextAnalysisSpec extends GraftSuite {

  private def one(text: String, c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(text).toDF("text").select(c).collect().head.get(0)
  }

  private def toks = split(col("text"), " ")

  test("wordNgrams emits len-n+1 grams and empty below n tokens") {
    assert(one("a b c d", TextAnalysis.wordNgrams(toks, 2)) ===
      Seq("a b", "b c", "c d"))
    assert(one("a b c d", TextAnalysis.wordNgrams(toks, 3)) ===
      Seq("a b c", "b c d"))
    // exactly n tokens -> one gram; fewer -> empty
    assert(one("a b", TextAnalysis.wordNgrams(toks, 2)) === Seq("a b"))
    assert(one("a", TextAnalysis.wordNgrams(toks, 2)) === Seq())
  }

  test("dupNgramFrac is 0 with no repeats, rises with repetition") {
    // all bigrams distinct
    assert(one("a b c d", TextAnalysis.dupNgramFrac(toks, 2)) === 0.0)
    // "a a a a a": 4 bigrams, 1 distinct -> 3/4
    assert(one("a a a a a", TextAnalysis.dupNgramFrac(toks, 2)) === 0.75)
    // shorter than n -> 0, not NaN/null (guarded denominator)
    assert(one("a", TextAnalysis.dupNgramFrac(toks, 2)) === 0.0)
  }

  test("topTokenFrac is the max token share") {
    assert(one("a a b c", TextAnalysis.topTokenFrac(toks)) === 0.5)
    assert(one("x", TextAnalysis.topTokenFrac(toks)) === 1.0)
    assert(one("a b c d", TextAnalysis.topTokenFrac(toks)) === 0.25)
  }

  test("inverted-index postings length equals doc_freq") {
    val idx = SparkEntry.queries("ta8_inverted_index")(spark, sf)
    val bad = idx.filter(
      size(split(col("postings"), ",")) =!= col("doc_freq")).count()
    assert(bad === 0)
  }

  test("bigram LM probabilities sum to 1 per prev token") {
    val lm = SparkEntry.queries("ta9_bigram_lm")(spark, sf)
    val sums = lm.groupBy("prev").agg(sum(col("p_next")).as("s"))
      .collect().map(_.getDouble(1))
    assert(sums.nonEmpty)
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-9, s"sum=$s"))
  }
}
