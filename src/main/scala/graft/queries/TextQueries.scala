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
    // with codegen (graft.functions.RollingMinHash). No oracle: the hash
    // family is ours; correctness is spec-tested against a reference fold.
    "ta5_rolling_fingerprint" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          RollingMinHash.rolling_min_hash(col("text"), 16).as("fingerprint"))
        .orderBy("doc_id")),

    // Heavy hitters over the token stream via the Misra–Gries mergeable
    // summary (O(k) memory vs O(distinct) for exact groupBy). No oracle:
    // sketch contents depend on merge order; AggregatesSpec asserts the
    // N/(k+1) undercount bound and heavy-hitter retention, which hold
    // under any order.
    "ta6_heavy_hitters" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .agg(graft.ops.Aggregates.heavyHitters(col("tok"), 16).as("sketch"))
        .select(explode(col("sketch")).as(Seq("token", "est_count")))
        .orderBy("token"))
  )

  private val enList = "('the','a','of','and','is','to','in')"
  private val deList = "('der','die','und','das','ist','ein')"
  private val frList = "('le','la','et','les','des','un')"
  private val esList = "('el','los','de','que','y','una')"

  val oracle: Map[String, String] = Map(
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
         FROM documents ORDER BY doc_id"""
    // ta5_rolling_fingerprint: no oracle (custom hash family) — spec-tested.
  )
}
