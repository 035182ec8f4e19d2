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

  test("cooccurrence lift matches hand counts; collocated pair tops chance") {
    import spark.implicits._
    // "x y" always adjacent (collocation); "z" floats independently
    val docs = Seq(
      (1L, "x y z x y"),
      (2L, "z x y x y"),
      (3L, "x y x y z")
    ).toDF("doc_id", "text")
    val got = TextAnalysis
      .cooccurrenceLift(docs, "doc_id", "text", window = 2, minCount = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // per doc of 5 tokens, window 2: pairs at offsets (i,i+1),(i,i+2) →
    // 4 + 3 = 7 pairs; N_pair = 21, N_tok = 15; c_x = c_y = 6, c_z = 3.
    // Hand counts (canonical, incl. self-pairs from repetition):
    //   (x,y): 3+3+3 = 9, (x,z): 2+1+1 = 4, (y,z): 2+1+1 = 4,
    //   (x,x): 0+1+1 = 2, (y,y): 0+1+1 = 2
    val nt = 15.0; val np = 21.0
    def lift(cxy: Long, cx: Long, cy: Long): Double =
      (cxy.toDouble * nt * nt) / (np * cx.toDouble * cy.toDouble)
    assert(got.keySet === Set(("x", "y"), ("x", "z"), ("y", "z"),
      ("x", "x"), ("y", "y")))
    assert(got(("x", "y"))._1 === 9L)
    assert(got(("x", "y"))._2 === lift(9, 6, 6))
    assert(got(("x", "z"))._1 === 4L)
    assert(got(("y", "z"))._1 === 4L)
    assert(got(("x", "x"))._1 === 2L) // self-pair: intra-doc repetition
    // the collocated pair beats chance; lift math is exact
    assert(got(("x", "y"))._2 > 1.0)
    assert(got(("x", "z"))._2 === lift(4, 6, 3))
  }

  test("bm25 matches a local reference; rare terms dominate stopwords") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a rare"),       // one rare hit, medium length
      (2L, "a a a a a a"),      // stopword-only
      (3L, "a rare rare")       // two rare hits, shortest
    ).toDF("doc_id", "text")
    val got = TextAnalysis
      .bm25Search(docs, "doc_id", "text", Seq("a", "rare"), topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // local reference with EXACTLY the operator's expression shapes
    val n = 3.0
    val avgdl = 13.0 / 3.0
    def idf(df: Double) = ((n - df) + 0.5) / (df + 0.5)
    def sc(tf: Double, dl: Double, df: Double) =
      idf(df) * (tf * (1.2 + 1.0)) /
        (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / avgdl))
    // token-sorted fold: "a" before "rare"
    val exp = Map(
      1L -> (sc(3, 4, 3.0) + sc(1, 4, 2.0)),
      2L -> sc(6, 6, 3.0),
      3L -> (sc(1, 3, 3.0) + sc(2, 3, 2.0)))
    got.foreach { case (id, score, _) =>
      assert(math.abs(score - exp(id)) < 1e-15, s"doc $id")
    }
    // rare-term docs outrank the stopword-only doc; doc 3 (2 rare hits,
    // shortest) wins
    assert(got.map(_._1).toSeq === Seq(3L, 1L, 2L))
    assert(got.find(_._1 == 1L).get._3 === 2L) // matched both terms
  }

  test("tfidfKeywords ranks doc-specific terms above common ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x y"),  // x only in d1 (df=1) — should dominate
      (2L, "y z"),
      (3L, "z z z")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfKeywords(docs, "doc_id", "text", topK = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getString(2), r.getDouble(3)))
      .toMap
    // local reference with the operator's exact expression shape
    def score(tf: Double, df: Double) = tf * (((3.0 - df) + 0.5) / (df + 0.5))
    assert(got((1L, 1))._1 === "x")
    assert(got((1L, 1))._2 === score(2, 1)) // 2 * 2.5/1.5
    assert(got((1L, 2)) === ("y" -> score(1, 2)))
    assert(got((3L, 1)) === ("z" -> score(3, 2)))
    assert(!got.contains((3L, 2))) // single-term doc emits one keyword
  }

  test("lmDocScore: rare-bigram fraction and mean probability are exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"), // bigrams: "a b"(pc 2), "b a"(pc 1), "a b"
      (2L, "a c"),     // "a c"(pc 1)
      (3L, "q")        // no bigrams -> dropped by contract
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lmDocScore(docs, "doc_id", "text", rareMax = 1)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // LM: P(b|a)=2/3, P(a|b)=1, P(c|a)=1/3
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L)._1 === 3L)
    assert(got(1L)._2 === 1.0 / 3.0) // one rare bigram ("b a") of three
    assert(math.abs(got(1L)._3 - (2.0 / 3 + 1.0 + 2.0 / 3) / 3) < 1e-9)
    assert(got(2L) === ((1L, 1.0, 0.3333333333330))) // 1/3 @ DECIMAL(18,12)
  }

  test("gopherRules: each rule trips on its planted offender") {
    import spark.implicits._
    val goodWords = Seq("the", "cat", "sat", "of", "and", "that", "mat")
    val good = (goodWords ++ Seq.fill(13)("word")).mkString(" ") // 20 words
    val docs = Seq(
      (1L, good),                                   // passes all rules
      (2L, "too short of the and"),                 // < 20 words
      (3L, (1 to 20).map(_ => "the #### $$$$ %%%%").mkString(" ")), // symbols
      (4L, Seq.fill(20)("zz").mkString(" ")))       // no stopwords, short words
      .toDF("doc_id", "text")
    val got = docs.select(
        col("doc_id") +: TextAnalysis.gopherRules(col("text"), minWords = 20): _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    def flag(id: Long, name: String): Boolean =
      got(id).getBoolean(got(id).fieldIndex(name))
    assert(flag(1L, "pass"), got(1L).toString)
    assert(!flag(2L, "words_ok") && !flag(2L, "pass"))
    assert(!flag(3L, "symbol_ok") && !flag(3L, "alpha_ok") && !flag(3L, "pass"))
    assert(!flag(4L, "stop_ok") && !flag(4L, "len_ok") && !flag(4L, "pass"))
    // metric spot-check: doc 4 mean word length = 2.0 exactly
    assert(got(4L).getDouble(got(4L).fieldIndex("mean_word_len")) === 2.0)
  }

  test("gopherRules round-17 fast forms == retired forms on edge shapes") {
    // The constant-factor pass swapped stop-hits to one array_intersect
    // pass (was 8 array_contains lambda scans) and the symbol count to
    // regexp_count of the negated class (was length(regexp_replace)).
    // Bit-equivalence pinned here against the RETIRED expressions on
    // the shapes where the two families could diverge: empty text,
    // consecutive spaces (empty tokens), duplicate stopwords (distinct
    // semantics), non-[a-z0-9 ] whitespace (tab/newline count as
    // symbols in both), uppercase (neither class matches A-Z).
    import spark.implicits._
    val docs = Seq(
      (1L, ""),
      (2L, "the  the   of"),           // dup stopwords + empty tokens
      (3L, "a\tb\nc the of"),          // tab/newline are symbols
      (4L, "The OF and #### 12x"),     // case-sensitive classes
      (5L, "the be to of and that have with")) // all 8 stopwords
      .toDF("doc_id", "text")
    val toks = split(col("text"), " ")
    val nWords = size(toks)
    val oldStop = size(filter(
      typedLit(TextAnalysis.gopherStopwords), w => array_contains(toks, w)))
    val oldRatio =
      length(regexp_replace(col("text"), "[a-z0-9 ]", "")).cast("double") /
        nWords.cast("double")
    val newCols = TextAnalysis.gopherRules(col("text"), minWords = 2)
    val newStop = newCols.find(_.toString.contains("stopword_hits")).get
    val newRatio = newCols.find(_.toString.contains("symbol_ratio")).get
    val got = docs.select(col("doc_id"), oldStop.as("old_stop"),
        oldRatio.as("old_ratio"), newStop, newRatio)
      .orderBy("doc_id").collect()
    got.foreach { r =>
      assert(r.getInt(1) === r.getInt(3),
        s"stop hits diverged on doc ${r.getLong(0)}: $r")
      // identical int operands -> identical IEEE division, bit-exact
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(4)),
        s"symbol ratio diverged on doc ${r.getLong(0)}: $r")
    }
    // and the planted expectations hold
    val byId = got.map(r => r.getLong(0) -> r).toMap
    assert(byId(2L).getInt(3) === 2) // the, of — distinct
    assert(byId(5L).getInt(3) === 8)
    // "a\tb\nc" is ONE space-split token: 2 symbol chars / 3 tokens
    assert(byId(3L).getDouble(4) === 2.0 / 3.0)

    // NULL-text contract (round-18, r17 advice): the intersect form
    // yields NULL stopword_hits / stop_ok / pass on NULL text — a
    // DELIBERATE divergence from the retired filter form (which
    // returned 0 / false): every OTHER gopher metric (n_words,
    // mean_word_len, symbol_ratio, …) is already NULL on NULL text in
    // both forms, so NULL-in → NULL-out is the uniform contract; the
    // fixture documents carry no NULL text (count(text) = count(*)
    // checked at generation scale) so no oracle row exercises it.
    // A consumer gating on `pass` must coalesce(pass, false) — NULL
    // text neither passes nor silently counts as measured.
    val nullRow = Seq((9L, Option.empty[String])).toDF("doc_id", "text")
      .select(col("doc_id"), struct(
        TextAnalysis.gopherRules(col("text"), minWords = 2): _*).as("g"))
      .select("doc_id", "g.stopword_hits", "g.stop_ok", "g.pass",
        "g.n_words")
      .collect().head
    assert(nullRow.isNullAt(1) && nullRow.isNullAt(2) && nullRow.isNullAt(3)
      && nullRow.isNullAt(4), s"NULL-text contract broken: $nullRow")
  }

  test("script mix: per-script counts, dominance priority on ties") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello 123"),                       // latin 5, digit 3
      (2L, "一丁丂 a"),            // cjk 3, latin 1
      (3L, "АБ"),                    // cyrillic 2
      (4L, "123"),                             // digit only
      (5L, "ab一丁"))                  // 2-2 tie → latin priority
      .toDF("doc_id", "text")
    val got = docs
      .select(col("doc_id") +: TextAnalysis.scriptCounts(col("text")): _*)
      .withColumn("dom", TextAnalysis.dominantScript(
        col("n_latin"), col("n_digit"), col("n_cjk"), col("n_cyrillic")))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(got.toSeq === Seq(
      (1L, 5L, 3L, 0L, 0L, "latin"),
      (2L, 1L, 0L, 3L, 0L, "cjk"),
      (3L, 0L, 0L, 0L, 2L, "cyrillic"),
      (4L, 0L, 3L, 0L, 0L, "digit"),
      (5L, 2L, 0L, 2L, 0L, "latin")))
  }

  test("sentence dedup keeps first occurrence, preserves order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Buy now. Great deal! Buy now. Only today. Great deal!"),
      (2L, "All unique here. Nothing repeats."))
      .toDF("doc_id", "text")
    val got = TextAnalysis
      .dedupSentences(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq === Seq(
      (1L, 5L, 3L, "Buy now. Great deal. Only today"),
      (2L, 2L, 2L, "All unique here. Nothing repeats")))
  }

  test("sentence dedup and boilerplate df ignore null doc ids") {
    import spark.implicits._
    val docs = Seq(
      (Option(1L), "Keep me. Keep me."),
      (Option.empty[Long], "Keep me. Phantom row."))
      .toDF("doc_id", "text")
    // null-doc rows must not surface as a phantom output row…
    val ded = TextAnalysis.dedupSentences(docs, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(ded.toSeq === Seq((1L, 1L)))
    // …and a null doc id must not count toward a chunk's document
    // frequency (count_distinct semantics): "Keep me" appears in doc 1
    // and the null doc — chunk_df must stay 1, under maxDocFreq=1
    val strip = TextAnalysis.stripBoilerplateChunks(
      docs, col("doc_id"), col("text"), chunkSize = 2, maxDocFreq = 1)
      .filter(col("doc_id") === 1L).collect()
    assert(strip.head.getAs[Long]("n_kept") >= 1L,
      s"null doc id inflated chunk_df: ${strip.mkString}")
  }

  test("ta14 lag-window candidate == catalog form on divergence shapes") {
    // The round-18 single-clustering candidate replaces the
    // (chunk_md5, doc_id) row_number marker with a lag-based doc-run
    // boundary under (doc_id nulls-first, chunk_idx) ordering on the
    // (chunk_md5) partition. Bit-equivalence pinned on the shapes where
    // a marker rewrite could diverge: a chunk repeated WITHIN one doc
    // (must count that doc once), a chunk shared ACROSS docs (df = 2 →
    // stripped at maxDocFreq=1), a null doc id adjacent to real docs in
    // the sort order (must not count, must not break the boundary
    // detector), and a pure-boilerplate doc (comes back empty).
    import spark.implicits._
    val docs = Seq(
      (Option(1L), "aa bb aa bb cc dd"), // "aa bb" twice within doc 1
      (Option(2L), "aa bb zz yy"),       // shares "aa bb" with doc 1
      (Option(3L), "aa bb"),             // PURE boilerplate → empty
      (Option.empty[Long], "aa bb qq rr"), // null doc: df must ignore
      (Option(4L), "uu vv ww xx"))       // untouched
      .toDF("doc_id", "text")
    def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.Column,
        org.apache.spark.sql.Column, Int, Long) => org.apache.spark.sql.DataFrame) =
      f(docs, col("doc_id"), col("text"), 2, 1L)
        .collect()
        .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
          r.getString(1), r.getLong(2), r.getLong(3))).toSeq.sortBy(_._1)
    val retired = run(TextAnalysis.stripBoilerplateChunksTwoWindow)
    val adopted = run(TextAnalysis.stripBoilerplateChunks)
    assert(adopted === retired)
    // and the planted expectations hold on the catalog form
    val byId = adopted.flatMap(r => r._1.map(_ -> r)).toMap
    assert(byId(1L)._2 === "cc dd" && byId(1L)._3 === 3L && byId(1L)._4 === 1L)
    assert(byId(3L)._2 === "" && byId(3L)._4 === 0L)
    assert(byId(4L)._2 === "uu vv ww xx")
  }

  test("readability: exact counts and Flesch formula, sentence floor") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The cat sat. The dog ran!"), // 6 words, 2 sentences, 6 syl
      (2L, "no terminal punctuation here")) // sentence count floors at 1
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).as("w"),
        TextAnalysis.sentenceCount(col("text")).as("s"),
        TextAnalysis.syllableCount(col("text")).as("sy"),
        TextAnalysis.fleschScore(col("text")).as("f"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4)))).toMap
    assert(got(1L)._1 === 6 && got(1L)._2 === 2 && got(1L)._3 === 6)
    assert(got(1L)._4 === 206.835 - 1.015 * 3.0 - 84.6 * 1.0) // 119.19
    // "no"(o) "terminal"(e,i,a) "punctuation"(u,ua,io) "here"(e,e) = 9
    assert(got(2L)._2 === 1 && got(2L)._3 === 9)
  }

  test("charDiversity: exact simpson/hill2, shannon fold, runs vs spread") {
    import spark.implicits._
    val docs = Seq((1L, "aaab"), (2L, "abcd"), (3L, "aaaa"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.charDiversity(docs, col("doc_id"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val ln2 = math.log(2.0)
    // aaab: N=4, Σn²=10 → simpson 6/16, hill2 16/10; H = the same
    // char-ordered left fold the column computes
    val h1 = -((0.0 + 0.75 * (math.log(0.75) / ln2)) +
      0.25 * (math.log(0.25) / ln2))
    assert(got(1L) === ((4L, 2L, 1.0 - 10.0 / 16.0, 16.0 / 10.0, h1)))
    // uniform 4-char doc: hill2 = alphabet size, H = 2 bits exactly
    assert(got(2L)._4 === 4.0)
    assert(got(2L)._5 === 2.0)
    // single-char run: no diversity at all
    assert(got(3L) === ((4L, 1L, 0.0, 1.0, -0.0)))
  }

  test("ngramNovelty: shared grams counted once, short docs absent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),   // grams {a b c, b c d}; "b c d" also in doc 2
      (2L, "b c d e"),   // grams {b c d, c d e}
      (3L, "x y z w"),   // fully unique → novelty 1
      (4L, "too short")) // < n words → no grams → absent
      .toDF("doc_id", "text")
    val got = TextAnalysis
      .ngramNovelty(docs, col("doc_id"), col("text"), n = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      1L -> ((2L, 1L, 0.5)),
      2L -> ((2L, 1L, 0.5)),
      3L -> ((2L, 0L, 1.0))))
  }

  test("hashedClassifierScore: fold matches per-feature recomputation") {
    import spark.implicits._
    // tokens (lowered, punctuation split away): alpha beta gamma beta;
    // bigrams in order: "alpha beta" "beta gamma" "gamma beta"
    val feats = Seq("alpha", "beta", "gamma", "beta",
      "alpha beta", "beta gamma", "gamma beta")
    // independent path: each feature through the same hash→weight scalar
    // ONE PER ROW (no array fold), reassembled in Scala in array order
    val dim = (1 << 20).toLong
    val weights = feats.toDF("f")
      .select((pmod(pmod(xxhash64(col("f")), lit(dim)) * lit(2654435761L),
          lit(1000003L)).cast("double") / lit(1000003.0) - lit(0.5)).as("w"))
      .collect().map(_.getDouble(0))
    val expected =
      1.0 / (1.0 + math.exp(-(weights.sum / math.sqrt(7.0)) * 4.0))
    val got = one("Alpha beta, GAMMA beta!",
      TextAnalysis.hashedClassifierScore(col("text")))
      .asInstanceOf[Double]
    assert(math.abs(got - expected) < 1e-12)
    // score is a proper probability and varies across inputs
    assert(got > 0.0 && got < 1.0)
  }

  test("hashedClassifierScore: featureless text sits at the 0.5 midpoint") {
    assert(one("", TextAnalysis.hashedClassifierScore(col("text"))) === 0.5)
    assert(one("  ... !!! ",
      TextAnalysis.hashedClassifierScore(col("text"))) === 0.5)
  }

  test("unigramRarity: exact hand-computed inverse-probability stats") {
    import spark.implicits._
    // corpus: N = 5 tokens, c(a) = 2, c(b) = 2, c(c) = 1
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramRarity(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: three tokens, each inv_p = 5/2 = 2.5 (exact binary) ->
    // micro sum 3 * 2_500_000, mean exactly 2.5, max 2.5
    assert(got(0).getLong(1) === 3L)
    assert(got(0).getLong(2) === 7500000L)
    assert(got(0).getDouble(3) === 2.5)
    assert(got(0).getDouble(4) === 2.5)
    // doc 2: inv_p = 2.5 and 5.0 -> mean 3.75, max 5.0 (the hapax)
    assert(got(1).getLong(1) === 2L)
    assert(got(1).getLong(2) === 7500000L)
    assert(got(1).getDouble(3) === 5.0)
    assert(got(1).getDouble(4) === 3.75)
  }

  test("rarityBuckets: ordered terciles, all buckets populated") {
    val got = TextAnalysis.rarityBuckets(
        graft.sources.Tables.documents(spark, sf), "doc_id", "text")
      .collect()
      .map(r => r.getString(2) -> r.getDouble(1))
    val by = got.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(by.keySet === Set("head", "middle", "tail"))
    // buckets are score-ordered: every head score <= every middle score
    // <= every tail score (boundaries are <= cuts on the same score)
    assert(by("head").max <= by("middle").min)
    assert(by("middle").max <= by("tail").min)
    // terciles: no bucket is degenerate or dominant
    val n = got.length
    by.values.foreach(v =>
      assert(v.size > n / 6 && v.size < n / 2, by.view.mapValues(_.size)))
  }

  test("lang confusion: disagreement rows carry agree=false, counts sum") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val got = graft.SparkEntry
      .queries("ta27_lang_confusion")(spark, sf).collect()
    assert(got.map(_.getLong(2)).sum === docs.count())
    got.foreach { r =>
      assert(r.getBoolean(3) === (r.getString(0) == r.getString(1)))
    }
    // the synthetic fixture is English word salad → the detector must
    // contradict every non-en declared label (off-diagonal mass exists)
    assert(got.exists(r => !r.getBoolean(3)),
      "expected declared-vs-detected disagreement in the fixture")
  }

  test("lexicalDiversity: hand counts, templated source collapses hapax") {
    import spark.implicits._
    // source A (natural-ish): "the cat sat" + "the dog ran far" →
    // 7 tokens, types {the:2, cat, sat, dog, ran, far} = 6, hapax 5
    // source B (templated): "click here now" × 2 →
    // 6 tokens, 3 types each seen twice, hapax 0
    val docs = Seq(
      (1L, "the cat sat", "A"), (2L, "the dog ran far", "A"),
      (3L, "click here now", "B"), (4L, "click here now", "B"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis
      .lexicalDiversity(docs, col("text"), col("source"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got("A") === ((7L, 6L, 6.0 / 7.0, 5.0 / 6.0)))
    assert(got("B") === ((6L, 3L, 0.5, 0.0)))
  }

  test("zipfSlope recovers -1 on an exact power law, and n_ranked") {
    import spark.implicits._
    // freq = 12 / rank for ranks 1..4: a 12, b 6, c 4, d 3 →
    // ln(freq) = ln 12 − 1·ln(rank), so the OLS slope is exactly −1 (up
    // to the DECIMAL(18,9) term quantization, ≤ 4e-9 total).
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextAnalysis.zipfSlope(df, col("text"), topN = 4).head()
    assert(r.getLong(0) === 4L)
    assert(math.abs(r.getDouble(1) - (-1.0)) < 1e-6,
      s"slope = ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - math.log(12.0)) < 1e-6,
      s"intercept = ${r.getDouble(2)}")
    // flat (templated) corpus → slope 0: every token equally frequent
    val flat = Seq((1L, "a b c d a b c d")).toDF("doc_id", "text")
    val f = TextAnalysis.zipfSlope(flat, col("text"), topN = 4).head()
    assert(math.abs(f.getDouble(1)) < 1e-6, s"flat slope = ${f.getDouble(1)}")
  }
}
