package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.RollingMinHash
import graft.ops.TextAnalysis
import graft.sources.Tables

/** Text-analysis operators over the documents table: language ID, quality
  * scoring, token counting, fingerprinting. All scan-local column
  * expressions — at 100 TB these run at parquet-scan speed with no
  * shuffle; only the dedup-style follow-ups (see DedupQueries) shuffle.
  */
object TextQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    // Language ID: marker-word argmax with deterministic ties.
    "ta1_langid" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang").as("lang_label"),
          TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    // Declared-vs-detected language confusion matrix: how far can the
    // corpus's own lang metadata be trusted? Off-diagonal mass = docs
    // whose declared language the detector contradicts — the audit run
    // before lang metadata gates a mixture or routes a tokenizer. One
    // keyed count over ta1's scan-local detector.
    "ta27_lang_confusion" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(col("lang").as("lang_label"),
          TextAnalysis.langId(col("text")).as("lang_pred"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("agree", col("lang_label") === col("lang_pred"))
        .orderBy("lang_label", "lang_pred")),

    // Quality scoring: length/punctuation/stopword components + composite.
    "ta2_quality_score" -> ((s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          TextAnalysis.wsTokenCount(col("text")).as("n_tokens"),
          TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
          TextAnalysis.stopwordRatio(col("text")).as("stopword_ratio"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    // Flesch reading ease: exact-integer word/sentence/syllable counts +
    // one fixed double formula — the readability band filter.
    "ta17_readability" -> ((s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          TextAnalysis.wsTokenCount(col("text")).as("n_words"),
          TextAnalysis.sentenceCount(col("text")).as("n_sentences"),
          TextAnalysis.syllableCount(col("text")).as("n_syllables"),
          TextAnalysis.fleschScore(col("text")).as("flesch"))
        .orderBy("doc_id")),

    // Unicode script profile + dominant script — the tokenizer-routing
    // signal ahead of language id; exact per-script char counts.
    "ta19_script_mix" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id") +: TextAnalysis.scriptCounts(col("text")): _*)
        .withColumn("dominant_script", TextAnalysis.dominantScript(
          col("n_latin"), col("n_digit"), col("n_cjk"), col("n_cyrillic")))
        .orderBy("doc_id")),

    // Character-repertoire diversity (Simpson + Hill-2 effective
    // alphabet) — the gibberish/encoded-blob detector. The oracle checks
    // the rational columns; Shannon (one JVM-vs-C 1-ulp transcendental
    // per char, structurally un-hashable cross-engine) stays a
    // spec-pinned library column.
    "ta21_char_diversity" -> ((s, d) =>
      TextAnalysis.charDiversity(
        Tables.documents(s, d), col("doc_id"), col("text"))
        .select("doc_id", "n_chars", "n_distinct", "simpson",
          "effective_chars")
        .orderBy("doc_id")),

    // Tokenizer fertility report: chars-per-token by (lang, source) —
    // the input to "which tokenizer does this corpus deserve": high
    // fertility (CJK under a byte-level regex) means more tokens per
    // character of signal, directly pricing context budget and training
    // FLOPs per char. Exact integer sums, two closing divisions.
    // Perplexity-proxy quality filter (CCNet family): per-doc mean/max
    // INVERSE unigram probability — the log-free, engine-exact form of
    // LM-rarity scoring; see TextAnalysis.unigramRarity.
    "ta24_unigram_rarity" -> ((s, d) =>
      TextAnalysis.unigramRarity(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Per-source lexical diversity: vocabulary size, type-token ratio,
    // hapax fraction — the templated-boilerplate-vs-real-language audit.
    "ta26_lexical_diversity" -> ((s, d) =>
      TextAnalysis.lexicalDiversity(
        Tables.documents(s, d), col("text"), col("source"))
        .withColumnRenamed("grp", "source")
        .orderBy("source")),

    // Zipf power-law fit over the top-100 token frequencies — the
    // one-number corpus-health alarm (natural text ≈ −1; templated
    // corpora flatten, tokenizer damage steepens). OLS sums go through
    // DECIMAL(18,9) so the distributed reduction hash-matches the
    // sequential oracle.
    "ta28_zipf_slope" -> ((s, d) =>
      TextAnalysis.zipfSlope(Tables.documents(s, d), col("text"), 100)),

    // CCNet head/middle/tail terciles over the rarity score — boundary
    // via the exact percentile AGGREGATE (broadcast one row), never a
    // global ntile window.
    "ta25_ccnet_buckets" -> ((s, d) =>
      TextAnalysis.rarityBuckets(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    "ta23_tokenizer_fertility" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          sum(TextAnalysis.bpeishTokenCount(col("text")).cast("long"))
            .as("total_tokens"))
        .withColumn("chars_per_token",
          col("total_chars").cast("double") /
            col("total_tokens").cast("double"))
        .withColumn("tokens_per_doc",
          col("total_tokens").cast("double") / col("n_docs").cast("double"))
        .orderBy("lang", "source")),

    // fastText-style hashed-feature classifier inference: unigram+bigram
    // hashing trick → deterministic pseudo-weights → sigmoid, one
    // scan-local codegen'd expression. Value-checked against
    // SignatureTruth's independent scalar recomputation (and
    // TextAnalysisSpec pins scores through a literal-frame path).
    "ta22_hashed_classifier" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.hashedClassifierScore(col("text")).as("score"))
        .withColumn("accepted", col("score") >= lit(0.5))
        .orderBy("doc_id")),

    // Per-doc n-gram novelty: fraction of a doc's distinct word-3-grams
    // seen in no other doc — the "how much of this is boilerplate"
    // pre-filter; gram-DF inverted index, keyed joins only.
    "ta20_ngram_novelty" -> ((s, d) =>
      TextAnalysis.ngramNovelty(
        Tables.documents(s, d), col("doc_id"), col("text"), n = 3)
        .orderBy("doc_id")),

    // Intra-doc sentence dedup (C4-style repeated-line removal, within
    // the page): first occurrence kept, original order reassembled.
    "ta18_sentence_dedup" -> ((s, d) =>
      TextAnalysis.dedupSentences(
        Tables.documents(s, d), col("doc_id"), col("text"))
        .orderBy("doc_id")),

    // Token counting: whitespace + BPE-ish subword proxy + distinct.
    "ta3_token_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          TextAnalysis.wsTokenCount(col("text")).as("ws_tokens"),
          TextAnalysis.bpeishTokenCount(col("text")).cast("int").as("bpe_tokens"),
          size(array_distinct(TextAnalysis.tokens(col("text"))))
            .as("distinct_tokens"))
        .orderBy("doc_id")),

    // Content-hash fingerprint + per-fingerprint group stats (md5 form —
    // oracle-exact across engines).
    "ta4_fingerprint" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val fp = TextAnalysis.md5Fingerprint(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), fp.as("fingerprint"))
        .withColumn("group_size",
          count(lit(1)).over(Window.partitionBy(col("fingerprint"))))
        .orderBy("doc_id")
    }),

    // Winnowing-style rolling-hash fingerprint — native Catalyst Expression
    // with codegen (graft.functions.RollingMinHash). Value-checked against
    // SignatureTruth's independent scalar recomputation (plus the
    // spec-pinned reference fold).
    "ta5_rolling_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          RollingMinHash.rolling_min_hash(col("text"), 16).as("fingerprint"))
        .orderBy("doc_id")),

    // Heavy hitters over the token stream via the Misra–Gries mergeable
    // summary (O(k) memory vs O(distinct) for exact groupBy). Sketch
    // CONTENTS depend on merge order, so the audited form grades the
    // sketch against its published guarantee instead of dumping it: every
    // token whose exact count exceeds n/(k+1) — the set DuckDB recomputes
    // — must be IN the k=64 summary (retention) with an estimate that
    // undercounts by at most n/(k+1) and never overcounts. Both hold
    // under ANY merge order (Agarwal et al., Mergeable Summaries), so the
    // verdicts are deterministic where the raw counts are not. k=64
    // because the fixtures' flattish token distribution has no
    // > n/17 token at any SF (k=16 would grade an empty set); ~30 tokens
    // clear n/65.
    "ta6_heavy_hitters" -> ((s, d) => {
      val k = 64
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
      val sk = toks
        .agg(graft.ops.Aggregates.heavyHitters(col("tok"), k).as("_sk"))
      val tot = toks.agg(count(lit(1)).cast("double").as("_n"))
      val est = coalesce(element_at(col("_sk"), col("tok")), lit(0L))
      toks.groupBy("tok").agg(count(lit(1)).as("exact_count"))
        .crossJoin(broadcast(sk)).crossJoin(broadcast(tot))
        .filter(col("exact_count").cast("double") > col("_n") / lit(k + 1))
        .select(col("tok").as("token"), col("exact_count"),
          element_at(col("_sk"), col("tok")).isNotNull.as("in_sketch"),
          (est <= col("exact_count") &&
            (col("exact_count") - est).cast("double") <=
              col("_n") / lit(k + 1)).as("within_bounds"))
        .orderBy("token")
    }),

    // Intra-document repetition signals (Gopher-style quality filters):
    // duplicate bigram/trigram fractions + top-token share. All
    // scan-local expressions — zero shuffle at 100 TB; the fractions are
    // exact integer ratios, hence oracle hash-exact.
    "ta7_repetition" -> ((s, d) => {
      val toks = split(col("text"), " ")
      Tables.documents(s, d)
        .select(col("doc_id"),
          size(toks).cast("bigint").as("n_tokens"),
          size(TextAnalysis.wordNgrams(toks, 2)).cast("bigint")
            .as("n_bigrams"),
          size(array_distinct(TextAnalysis.wordNgrams(toks, 2))).cast("bigint")
            .as("n_distinct_bigrams"),
          TextAnalysis.dupNgramFrac(toks, 2).as("dup_bigram_frac"),
          TextAnalysis.dupNgramFrac(toks, 3).as("dup_trigram_frac"),
          TextAnalysis.topTokenFrac(toks).as("top_token_frac"))
        .orderBy("doc_id")
    }),

    // Inverted index (token → sorted posting list + document frequency) —
    // the retrieval-side build. One shuffle keyed on token; postings are
    // emitted as a comma-joined STRING (array output columns break
    // rows-only recorders, and string postings hash-compare cleanly). At
    // 100 TB hot stopword tokens would be df-counted only / sharded; the
    // fixture vocabulary is bounded so full lists are exact here.
    "ta8_inverted_index" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy("token")
        .agg(countDistinct(col("doc_id")).as("doc_freq"),
          array_join(
            transform(sort_array(collect_set(col("doc_id"))),
              _.cast("string")), ",").as("postings"))
        .orderBy("token")),

    // Bigram language-model estimation: MLE P(next | prev) from corpus
    // bigram counts — count per pair, window-sum per prev token, exact
    // integer ratio as the probability. The classic first statistic of a
    // data-quality/contamination audit; one shuffle on bigram + one on
    // prev.
    "ta9_bigram_lm" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val toks = split(col("text"), " ")
      val prevW = Window.partitionBy("prev")
      Tables.documents(s, d)
        .select(explode(TextAnalysis.wordNgrams(toks, 2)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("pair_count"))
        .select(
          split(col("bigram"), " ").getItem(0).as("prev"),
          split(col("bigram"), " ").getItem(1).as("next"),
          col("pair_count"))
        .withColumn("prev_count", sum(col("pair_count")).over(prevW))
        .withColumn("p_next",
          col("pair_count").cast("double") / col("prev_count").cast("double"))
        .orderBy("prev", "next")
    }),

    // BM25 ranked retrieval for a fixed 4-term query (two stopword-ish
    // terms, one mid, one rare — 'dup' appears in <3% of docs so its
    // idf dominates). Rational idf + ordered-fold sums keep the score
    // bit-reproducible across engines; see TextAnalysis.bm25Search.
    "ta10_bm25_search" -> ((s, d) =>
      TextAnalysis.bm25Search(
        Tables.documents(s, d), "doc_id", "text",
        terms = Seq("hash", "join", "spark", "dup"), topK = 20)),

    // Windowed co-occurrence lift (log-free PMI): which token pairs
    // co-occur above chance within ±2 positions. Scan-local pair
    // generation (no positional self-join); exact integer ratios in
    // IEEE doubles keep it hash-exact.
    "ta11_cooccurrence" -> ((s, d) =>
      TextAnalysis.cooccurrenceLift(
        Tables.documents(s, d), "doc_id", "text",
        window = 2, minCount = 5)),

    // TF-IDF keyword extraction: top-3 tokens per document by rational
    // (log-free) idf weight — bit-reproducible ranking, see
    // TextAnalysis.tfidfKeywords.
    "ta12_tfidf_keywords" -> ((s, d) =>
      TextAnalysis.tfidfKeywords(
        Tables.documents(s, d), "doc_id", "text", topK = 3)
        .orderBy("doc_id", "rank")),

    // CCNet-style LM quality filter: score every doc under the corpus's
    // own bigram model (rare-bigram fraction + exact-decimal mean
    // conditional probability). See TextAnalysis.lmDocScore.
    "ta13_lm_doc_score" -> ((s, d) =>
      TextAnalysis.lmDocScore(
        Tables.documents(s, d), "doc_id", "text", rareMax = 2)
        .orderBy("doc_id")),

    // Boilerplate passage stripping (the removal half of CCNet/RefinedWeb
    // line-dedup; dd12 is the detection half): 8-token chunks appearing
    // in ≥2 distinct docs are excised and each doc's text is rebuilt.
    "ta14_boilerplate_strip" -> ((s, d) =>
      TextAnalysis.stripBoilerplateChunks(
        Tables.documents(s, d), col("doc_id"), col("text"),
        chunkSize = 8, maxDocFreq = 1)
        .orderBy("doc_id")),

    // PII redaction before training: emails and phone numbers replaced by
    // placeholder tokens. The fixture text carries no PII, so the query
    // plants a deterministic contact footer (doc_id/source-derived) and
    // redacts it — the redaction column expressions are the operator.
    // Gopher hard-filter rule table (Rae et al. 2021): per-doc metrics,
    // per-rule verdicts, conjunction. minWords=20 (fixture docs are
    // short); all metrics exact integer counts or single divisions.
    "ta16_gopher_rules" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id") +:
          TextAnalysis.gopherRules(col("text"), minWords = 20): _*)
        .orderBy("doc_id")),

    "ta15_pii_redaction" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("dirty_text",
          concat(col("text"), lit(" reach user"), col("doc_id").cast("string"),
            lit("@"), col("source"), lit(".example or 555-867-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .select(col("doc_id"),
          TextAnalysis.redactPii(col("dirty_text")).as("clean_text"),
          (length(col("dirty_text")) - length(TextAnalysis.redactPii(col("dirty_text"))))
            .as("chars_removed"))
        .orderBy("doc_id"))
  )

  /** The ta10 BM25 scoring chain as a reusable CTE body (`s` yields
    * per-(doc, term) scores) — shared verbatim with the ss21 hybrid-RRF
    * dual in SimilarityQueries, so the lexical channel of the fusion is
    * audited by the SAME arithmetic ta10 pins hash-exact. */
  private[queries] val bm25Cte: String =
    """tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
         dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl
             FROM documents),
         corpus AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
           FROM dl),
         tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
           FROM tk WHERE token IN ('hash', 'join', 'spark', 'dup')
           GROUP BY doc_id, token),
         dfreq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df
           FROM tf GROUP BY token),
         s AS (SELECT t.doc_id, t.token,
             (((c.n - f.df) + 0.5) / (f.df + 0.5)) *
             (CAST(t.tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + CAST(1 AS DOUBLE))) /
             (CAST(t.tf AS DOUBLE) + CAST(1.2 AS DOUBLE) *
               ((CAST(1 AS DOUBLE) - CAST(0.75 AS DOUBLE)) +
                (CAST(0.75 AS DOUBLE) * CAST(d.dl AS DOUBLE)) / c.avgdl))
             AS sc
           FROM tf t
           JOIN dl d ON d.doc_id = t.doc_id
           JOIN dfreq f ON f.token = t.token
           CROSS JOIN corpus c)"""

  private val enList = "('the','a','of','and','is','to','in')"
  private val deList = "('der','die','und','das','ist','ein')"
  private val frList = "('le','la','et','les','des','un')"
  private val esList = "('el','los','de','que','y','una')"

  val oracle: Map[String, String] = Map(
    // ta5/ta22: engine-local hash families recomputed independently by
    // SignatureTruth (written by graft.Verify) — read back as the truth.
    "ta5_rolling_fingerprint" ->
      s"""SELECT doc_id, fingerprint
          FROM read_parquet('${graft.ops.SignatureTruth.defaultDir}/docs.parquet/*.parquet')
          ORDER BY doc_id""",
    "ta22_hashed_classifier" ->
      s"""SELECT t.doc_id, d.lang, t.cls_score AS score,
            t.cls_score >= 0.5 AS accepted
          FROM read_parquet('${graft.ops.SignatureTruth.defaultDir}/docs.parquet/*.parquet') t
          JOIN documents d USING (doc_id)
          ORDER BY t.doc_id""",
    // exact integer Σn² per doc, then single divisions — Simpson and
    // Hill-2 are hash-exact by construction (no transcendentals).
    "ta21_char_diversity" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
            FROM documents),
          f AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS n
            FROM ch WHERE length(ch) > 0 GROUP BY doc_id, ch)
          SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_chars,
            CAST(count(*) AS BIGINT) AS n_distinct,
            1.0 - CAST(sum(n * n) AS DOUBLE) /
              CAST(sum(n) * sum(n) AS DOUBLE) AS simpson,
            CAST(sum(n) * sum(n) AS DOUBLE) /
              CAST(sum(n * n) AS DOUBLE) AS effective_chars
          FROM f GROUP BY doc_id ORDER BY doc_id""",
    // same word-3-gram construction as dd11's oracle; df > 1 marks a
    // gram shared with any other doc (distinct per doc first).
    "ta20_ngram_novelty" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
            FROM documents),
          g AS (SELECT doc_id, unnest(list_distinct(
              [array_to_string(w[i:i+2], ' ')
               for i in range(1, len(w) - 1)])) AS gram
            FROM toks),
          dfq AS (SELECT gram, count(*) AS df FROM g GROUP BY gram),
          j AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
              CAST(sum(CASE WHEN dfq.df > 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS shared_grams
            FROM g JOIN dfq USING (gram) GROUP BY g.doc_id)
          SELECT doc_id, n_grams, shared_grams,
            CAST(n_grams - shared_grams AS DOUBLE) / n_grams AS novelty
          FROM j ORDER BY doc_id""",
    // same detector CASE as ta1, one grouped count on top
    "ta27_lang_confusion" ->
      s"""WITH t AS (SELECT doc_id, lang,
            regexp_split_to_array(lower(text), '\\s+') AS toks FROM documents),
          sc AS (SELECT doc_id, lang,
            len(list_filter(toks, x -> x IN $enList)) AS s_en,
            len(list_filter(toks, x -> x IN $deList)) AS s_de,
            len(list_filter(toks, x -> x IN $frList)) AS s_fr,
            len(list_filter(toks, x -> x IN $esList)) AS s_es
          FROM t),
          p AS (SELECT lang AS lang_label,
            CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                 WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                 WHEN s_fr >= s_es THEN 'fr'
                 ELSE 'es' END AS lang_pred
          FROM sc)
          SELECT lang_label, lang_pred, CAST(count(*) AS BIGINT) AS n_docs,
            lang_label = lang_pred AS agree
          FROM p GROUP BY lang_label, lang_pred
          ORDER BY lang_label, lang_pred""",
    "ta1_langid" ->
      s"""WITH t AS (SELECT doc_id, lang,
            regexp_split_to_array(lower(text), '\\s+') AS toks FROM documents),
          sc AS (SELECT doc_id, lang,
            len(list_filter(toks, x -> x IN $enList)) AS s_en,
            len(list_filter(toks, x -> x IN $deList)) AS s_de,
            len(list_filter(toks, x -> x IN $frList)) AS s_fr,
            len(list_filter(toks, x -> x IN $esList)) AS s_es
          FROM t)
          SELECT doc_id, lang AS lang_label,
            CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                 WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                 WHEN s_fr >= s_es THEN 'fr'
                 ELSE 'es' END AS lang_pred
          FROM sc ORDER BY doc_id""",
    // RE2 spells the unicode ranges \x{...} where Java uses \\uXXXX —
    // different pattern text, identical character sets
    "ta19_script_mix" ->
      s"""WITH c AS (SELECT doc_id,
            CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT)
              AS n_latin,
            CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT)
              AS n_digit,
            CAST(len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]'))
              AS BIGINT) AS n_cjk,
            CAST(len(regexp_extract_all(text, '[\\x{0400}-\\x{04ff}]'))
              AS BIGINT) AS n_cyrillic
          FROM documents)
          SELECT doc_id, n_latin, n_digit, n_cjk, n_cyrillic,
            CASE WHEN n_latin >= n_cjk AND n_latin >= n_cyrillic
                   AND n_latin >= n_digit THEN 'latin'
                 WHEN n_cjk >= n_cyrillic AND n_cjk >= n_digit THEN 'cjk'
                 WHEN n_cyrillic >= n_digit THEN 'cyrillic'
                 ELSE 'digit' END AS dominant_script
          FROM c ORDER BY doc_id""",
    // zipped unnests give (idx, sentence); same trim/filter/window/
    // string_agg-by-idx pipeline as the Spark side
    "ta18_sentence_dedup" ->
      s"""WITH t AS (SELECT doc_id,
            regexp_split_to_array(text, '[.!?]+\\s*') AS arr
          FROM documents),
          s0 AS (SELECT doc_id,
            unnest(range(1, len(arr) + 1)) AS idx,
            unnest(arr) AS sent FROM t),
          s AS (SELECT doc_id, idx, trim(sent) AS sent FROM s0
                WHERE length(trim(sent)) > 0),
          k AS (SELECT doc_id, idx, sent,
              row_number() OVER (PARTITION BY doc_id, sent
                ORDER BY idx) AS rn FROM s),
          stats AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sentences
                    FROM s GROUP BY doc_id),
          ded AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
              string_agg(sent, '. ' ORDER BY idx) AS clean_text
            FROM k WHERE rn = 1 GROUP BY doc_id)
          SELECT stats.doc_id, n_sentences, n_kept, clean_text
          FROM stats JOIN ded USING (doc_id)
          ORDER BY stats.doc_id""",
    // n_words mirrors ta2's token split; flesch coefficients carry e0 so
    // DuckDB types them DOUBLE (a bare decimal literal would be DECIMAL)
    "ta17_readability" ->
      s"""WITH t AS (SELECT doc_id,
            len(regexp_split_to_array(lower(text), '\\s+')) AS w0,
            greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
            len(regexp_extract_all(lower(text), '[aeiouy]+')) AS sy
          FROM documents)
          SELECT doc_id,
            CAST(w0 AS INT) AS n_words,
            CAST(s AS INT) AS n_sentences,
            CAST(sy AS INT) AS n_syllables,
            206.835e0
              - 1.015e0 * (CAST(greatest(w0, 1) AS DOUBLE)
                           / CAST(s AS DOUBLE))
              - 84.6e0 * (CAST(sy AS DOUBLE)
                          / CAST(greatest(w0, 1) AS DOUBLE)) AS flesch
          FROM t ORDER BY doc_id""",
    "ta2_quality_score" ->
      s"""WITH t AS (SELECT doc_id, text,
            regexp_split_to_array(lower(text), '\\s+') AS toks FROM documents),
          c AS (SELECT doc_id,
            CAST(len(toks) AS INT) AS n_tokens,
            CAST(length(regexp_replace(lower(text), '[a-z0-9\\s]', '', 'g')) AS DOUBLE)
              / greatest(length(text), 1) AS punct_ratio,
            CAST(len(list_filter(toks, x -> x IN $enList)) AS DOUBLE)
              / greatest(len(toks), 1) AS stopword_ratio
          FROM t)
          SELECT doc_id, n_tokens, punct_ratio, stopword_ratio,
            least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
              + (1.0 - punct_ratio) * 0.3
              + least(stopword_ratio * 5.0, 1.0) * 0.3 AS quality
          FROM c ORDER BY doc_id""",
    // same byte-level token regex as ta3; exact long sums then two
    // double divisions — hash-exact
    // mirrors unigramRarity term by term: one correctly-rounded division
    // per token, micro-unit quantization, exact BIGINT sum, identical
    // division association for the mean ((sum/1e6)/n).
    // identical ln inputs (integer rank/freq), per-row double products,
    // DECIMAL(18,9)-quantized order-independent OLS sums, slope formula
    // written identically on both sides — hash-exact. BIGINT casts on
    // the count guard the decimal trap (SCALE.md round-10 rule).
    "ta28_zipf_slope" ->
      """WITH tk AS (SELECT
             unnest(regexp_split_to_array(lower(text), '\s+')) AS token
           FROM documents),
         f AS (SELECT token, count(*) AS freq FROM tk
           WHERE len(token) > 0 GROUP BY token),
         top AS (SELECT token, freq FROM f
           ORDER BY freq DESC, token ASC LIMIT 100),
         r AS (SELECT freq, CAST(row_number() OVER
             (ORDER BY freq DESC, token ASC) AS BIGINT) AS rank FROM top),
         t AS (SELECT ln(CAST(rank AS DOUBLE)) AS x,
                      ln(CAST(freq AS DOUBLE)) AS y FROM r),
         s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(CAST(x AS DECIMAL(18,9))) AS DOUBLE) AS sx,
           CAST(sum(CAST(y AS DECIMAL(18,9))) AS DOUBLE) AS sy,
           CAST(sum(CAST(x * y AS DECIMAL(18,9))) AS DOUBLE) AS sxy,
           CAST(sum(CAST(x * x AS DECIMAL(18,9))) AS DOUBLE) AS sxx
           FROM t)
         SELECT CAST(n AS BIGINT) AS n_ranked,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS zipf_slope,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
             AS intercept
         FROM s""",
    // exact long counts, single closing divisions — hash-exact
    "ta26_lexical_diversity" ->
      """WITH tk AS (SELECT source,
             unnest(regexp_split_to_array(lower(text), '\s+')) AS token
           FROM documents),
         c AS (SELECT source, token, CAST(count(*) AS BIGINT) AS c
           FROM tk GROUP BY source, token)
         SELECT source,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE)
             AS type_token_ratio,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
             CAST(count(*) AS DOUBLE) AS hapax_fraction
         FROM c GROUP BY source ORDER BY source""",
    "ta24_unigram_rarity" ->
      """WITH tk AS (SELECT doc_id,
             unnest(regexp_split_to_array(lower(text), '\s+')) AS token
           FROM documents),
         c AS (SELECT token, count(*) AS c FROM tk GROUP BY token),
         t AS (SELECT sum(c) AS n_total FROM c)
         SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CAST(floor(
               CAST(n_total AS DOUBLE) / CAST(c AS DOUBLE) * 1000000.0)
             AS BIGINT)) AS BIGINT) AS sum_inv_p_micro,
           max(CAST(n_total AS DOUBLE) / CAST(c AS DOUBLE)) AS max_inv_p,
           CAST(sum(CAST(floor(
               CAST(n_total AS DOUBLE) / CAST(c AS DOUBLE) * 1000000.0)
             AS BIGINT)) AS DOUBLE) / 1000000.0 / CAST(count(*) AS DOUBLE)
             AS mean_inv_p
         FROM tk JOIN c USING (token) CROSS JOIN t
         GROUP BY doc_id ORDER BY doc_id""",

    // same rarity pipeline, then quantile_cont terciles (≡ Spark exact
    // percentile, the pl12/pl20-proven pair) + scan-local CASE.
    "ta25_ccnet_buckets" ->
      """WITH tk AS (SELECT doc_id,
             unnest(regexp_split_to_array(lower(text), '\s+')) AS token
           FROM documents),
         c AS (SELECT token, count(*) AS c FROM tk GROUP BY token),
         t AS (SELECT sum(c) AS n_total FROM c),
         r AS (SELECT doc_id,
             CAST(sum(CAST(floor(
                 CAST(n_total AS DOUBLE) / CAST(c AS DOUBLE) * 1000000.0)
               AS BIGINT)) AS DOUBLE) / 1000000.0 / CAST(count(*) AS DOUBLE)
               AS mean_inv_p
           FROM tk JOIN c USING (token) CROSS JOIN t
           GROUP BY doc_id),
         b AS (SELECT
             quantile_cont(mean_inv_p, 0.3333333333333333) AS q33,
             quantile_cont(mean_inv_p, 0.6666666666666666) AS q66
           FROM r)
         SELECT doc_id, mean_inv_p,
           CASE WHEN mean_inv_p <= q33 THEN 'head'
                WHEN mean_inv_p <= q66 THEN 'middle'
                ELSE 'tail' END AS ccnet_bucket
         FROM r CROSS JOIN b ORDER BY doc_id""",

    "ta23_tokenizer_fertility" ->
      """WITH t AS (SELECT lang, source, n_chars,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS toks
         FROM documents)
         SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(toks) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars) AS DOUBLE) / CAST(sum(toks) AS DOUBLE)
             AS chars_per_token,
           CAST(sum(toks) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS tokens_per_doc
         FROM t GROUP BY lang, source ORDER BY lang, source""",
    "ta3_token_stats" ->
      """SELECT doc_id,
           CAST(len(regexp_split_to_array(lower(text), '\s+')) AS INT) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INT) AS bpe_tokens,
           CAST(len(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS INT) AS distinct_tokens
         FROM documents ORDER BY doc_id""",
    "ta4_fingerprint" ->
      """SELECT doc_id,
           substring(md5(lower(trim(text))), 1, 16) AS fingerprint,
           count(*) OVER (PARTITION BY substring(md5(lower(trim(text))), 1, 16))
             AS group_size
         FROM documents ORDER BY doc_id""",
    // ta5/ta22 oracles are at the head of this map (SignatureTruth).
    // ta6: the oracle recomputes the TRUE heavy-hitter set (exact token
    // counts above n/(k+1), k=64) and asserts the sketch verdicts —
    // retention and the undercount bound — are TRUE for every one.
    "ta6_heavy_hitters" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok
           FROM documents),
         tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks)
         SELECT tok AS token, CAST(count(*) AS BIGINT) AS exact_count,
           TRUE AS in_sketch, TRUE AS within_bounds
         FROM toks, tot GROUP BY tok, tot.n
         HAVING count(*) > tot.n / 65
         ORDER BY token""",
    "ta7_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         g AS (SELECT doc_id, w,
                 [w[i] || ' ' || w[i+1] for i in range(1, len(w))] AS bg,
                 [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                  for i in range(1, len(w) - 1)] AS tg
               FROM t),
         tc AS (SELECT doc_id, max(c) AS max_c FROM (
                  SELECT doc_id, tok, count(*) AS c
                  FROM (SELECT doc_id, unnest(w) AS tok FROM t)
                  GROUP BY doc_id, tok)
                GROUP BY doc_id)
         SELECT g.doc_id,
           CAST(len(w) AS BIGINT) AS n_tokens,
           CAST(len(bg) AS BIGINT) AS n_bigrams,
           CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct_bigrams,
           CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE)
             / greatest(len(bg), 1) AS dup_bigram_frac,
           CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE)
             / greatest(len(tg), 1) AS dup_trigram_frac,
           CAST(max_c AS DOUBLE) / len(w) AS top_token_frac
         FROM g JOIN tc ON g.doc_id = tc.doc_id
         ORDER BY g.doc_id""",
    "ta8_inverted_index" ->
      """SELECT tok AS token,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq,
           array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS postings
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
               FROM documents)
         GROUP BY tok ORDER BY token""",
    "ta9_bigram_lm" ->
      """WITH bg AS (SELECT unnest(
             [w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bigram
           FROM (SELECT string_split(text, ' ') AS w FROM documents)),
         pc AS (SELECT bigram, count(*) AS pair_count FROM bg GROUP BY bigram)
         SELECT string_split(bigram, ' ')[1] AS prev,
           string_split(bigram, ' ')[2] AS next,
           CAST(pair_count AS BIGINT) AS pair_count,
           CAST(sum(pair_count) OVER (PARTITION BY string_split(bigram, ' ')[1])
             AS BIGINT) AS prev_count,
           CAST(pair_count AS DOUBLE) /
             CAST(sum(pair_count) OVER (PARTITION BY string_split(bigram, ' ')[1])
               AS DOUBLE) AS p_next
         FROM pc ORDER BY prev, next""",
    // expression shapes mirror TextAnalysis.bm25Search term by term
    // (left-associative, rational idf, ordered list_sum fold)
    "ta10_bm25_search" ->
      s"""WITH $bm25Cte
         SELECT doc_id, list_sum(list(sc ORDER BY token)) AS bm25,
           CAST(count(*) AS BIGINT) AS n_terms
         FROM s GROUP BY doc_id
         ORDER BY bm25 DESC, doc_id LIMIT 20""",
    // scan-local nested-comprehension pair generation mirrors the Spark
    // transform/flatten; lift arithmetic is term-by-term identical
    "ta11_cooccurrence" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
             FROM documents),
         pr AS (SELECT unnest(flatten(list_transform(range(0, len(w) - 1),
                  i -> list_transform(
                    range(i + 1, least(i + 2, len(w) - 1) + 1),
                    j -> {'a': least(w[i+1], w[j+1]),
                          'b': greatest(w[i+1], w[j+1])})))) AS p
            FROM t WHERE len(w) >= 2),
         pcf AS (SELECT p.a AS a, p.b AS b, count(*) AS pair_count
            FROM pr GROUP BY 1, 2 HAVING count(*) >= 5),
         uni AS (SELECT tok, count(*) AS c FROM
               (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
             GROUP BY tok),
         tot AS (SELECT CAST((SELECT sum(c) FROM uni) AS DOUBLE) AS nt,
                    CAST((SELECT count(*) FROM pr) AS DOUBLE) AS np)
         SELECT f.a, f.b, CAST(f.pair_count AS BIGINT) AS pair_count,
           (CAST(f.pair_count AS DOUBLE) * t.nt * t.nt) /
             (t.np * CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE)) AS lift
         FROM pcf f
         JOIN uni ua ON ua.tok = f.a
         JOIN uni ub ON ub.tok = f.b
         CROSS JOIN tot t
         ORDER BY lift DESC, a, b""",
    // rational idf + single multiply/divide chain, term-by-term identical
    // to TextAnalysis.tfidfKeywords
    "ta12_tfidf_keywords" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
             FROM documents),
         nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
         tf AS (SELECT doc_id, token, count(*) AS tf
           FROM tk GROUP BY doc_id, token),
         dfq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df
           FROM tf GROUP BY token),
         sc AS (SELECT t.doc_id, t.token,
             CAST(t.tf AS DOUBLE) * (((c.n - f.df) + 0.5) / (f.df + 0.5))
               AS tfidf
           FROM tf t JOIN dfq f ON f.token = t.token CROSS JOIN nd c),
         r AS (SELECT doc_id, token, tfidf,
             CAST(row_number() OVER (PARTITION BY doc_id
               ORDER BY tfidf DESC, token ASC) AS INT) AS rank
           FROM sc)
         SELECT doc_id, rank, token, tfidf FROM r WHERE rank <= 3
         ORDER BY doc_id, rank""",
    // LM statistics identical to ta9; avg_p under the exact-decimal sum
    // policy (DECIMAL(18,12) per-term cast) so the mean is
    // order-independent on both engines
    "ta13_lm_doc_score" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
             FROM documents),
         bg AS (SELECT doc_id, unnest(
             [w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS bigram
           FROM w),
         pc AS (SELECT bigram, count(*) AS pair_count FROM bg
           GROUP BY bigram),
         lm AS (SELECT bigram, pair_count,
             CAST(pair_count AS DOUBLE) /
               CAST(sum(pair_count) OVER (PARTITION BY
                 string_split(bigram, ' ')[1]) AS DOUBLE) AS p
           FROM pc)
         SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(CASE WHEN lm.pair_count <= 2 THEN 1 ELSE 0 END)
             AS DOUBLE) / CAST(count(*) AS DOUBLE) AS rare_frac,
           CAST(sum(CAST(lm.p AS DECIMAL(18,12))) AS DOUBLE) / count(*)
             AS avg_p
         FROM bg JOIN lm USING (bigram)
         GROUP BY bg.doc_id ORDER BY doc_id""",
    "ta14_boilerplate_strip" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         chunks AS (
           SELECT doc_id, i AS chunk_idx,
             array_to_string(t[(i*8+1):(i*8+8)], ' ') AS chunk_text
           FROM toks,
             UNNEST(generate_series(0, CAST(floor((len(t)-1)/8.0) AS INT))) AS u(i)),
         freq AS (SELECT md5(chunk_text) AS h, count(DISTINCT doc_id) AS df
           FROM chunks GROUP BY 1),
         joined AS (SELECT c.doc_id, c.chunk_idx, c.chunk_text, f.df
           FROM chunks c JOIN freq f ON md5(c.chunk_text) = f.h),
         rebuilt AS (
           SELECT doc_id,
             string_agg(CASE WHEN df <= 1 THEN chunk_text END, ' '
               ORDER BY chunk_idx) AS clean_text,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(count(*) FILTER (WHERE df <= 1) AS BIGINT) AS n_kept
           FROM joined GROUP BY doc_id)
         SELECT d.doc_id, coalesce(r.clean_text, '') AS clean_text,
           coalesce(r.n_chunks, 0) AS n_chunks, coalesce(r.n_kept, 0) AS n_kept
         FROM documents d LEFT JOIN rebuilt r USING (doc_id)
         ORDER BY d.doc_id""",
    "ta15_pii_redaction" ->
      """WITH dirty AS (
           SELECT doc_id,
             text || ' reach user' || CAST(doc_id AS VARCHAR) || '@' || source
               || '.example or 555-867-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS dirty_text
           FROM documents),
         clean AS (
           SELECT doc_id,
             regexp_replace(
               regexp_replace(dirty_text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS clean_text,
             length(dirty_text) AS dirty_len
           FROM dirty)
         SELECT doc_id, clean_text,
           CAST(dirty_len - length(clean_text) AS INT) AS chars_removed
         FROM clean ORDER BY doc_id""",
    "ta16_gopher_rules" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
           FROM documents),
         m AS (SELECT doc_id,
             CAST(len(toks) AS INT) AS n_words,
             CAST(length(text) - (len(toks) - 1) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) AS mean_word_len,
             CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE) AS symbol_ratio,
             CAST(len(list_filter(toks, x -> regexp_full_match(x, '[a-z]+')))
               AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS alpha_frac,
             CAST(len(list_filter(
               ['the','be','to','of','and','that','have','with'],
               w -> list_contains(toks, w))) AS INT) AS stopword_hits
           FROM t)
         SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
           stopword_hits,
           (n_words >= 20 AND n_words <= 100000) AS words_ok,
           (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS len_ok,
           (symbol_ratio <= 0.1) AS symbol_ok,
           (alpha_frac >= 0.8) AS alpha_ok,
           (stopword_hits >= 2) AS stop_ok,
           ((n_words >= 20 AND n_words <= 100000)
             AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
             AND (symbol_ratio <= 0.1) AND (alpha_frac >= 0.8)
             AND (stopword_hits >= 2)) AS pass
         FROM m ORDER BY doc_id"""
  )
}
