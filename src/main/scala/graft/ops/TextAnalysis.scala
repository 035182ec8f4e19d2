package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID (marker-word heuristic), quality scoring, token counting,
  * and document fingerprinting. All pure column expressions (codegen'd,
  * no UDFs), so they run at full scan speed and every one is expressible
  * as oracle SQL.
  */
object TextAnalysis {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Marker-word lists per language. Deterministic heuristic: the language
    * with the most marker-token hits wins, ties broken in declaration
    * order (en, de, fr, es). The fixture docs are synthetic English word
    * salads, so 'en' dominates — what matters is that the heuristic is
    * deterministic, scan-local, and shuffle-free at 100 TB. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"),
    "es" -> Seq("el", "los", "de", "que", "y", "una"))

  /** Count of tokens that appear in `words`. */
  def markerHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(_.asInstanceOf[Any]): _*)))

  /** Predicted language code from marker hits (argmax, first-wins ties). */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langMarkers.map { case (lang, words) =>
      lang -> markerHits(toks, words)
    }
    // argmax with declaration-order tie-break: lang_i wins if its score is
    // >= all later scores and > handled by earlier branches.
    scores.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((lang, score), i), elseCol) =>
        val laterScores = scores.drop(i + 1).map(_._2)
        if (laterScores.isEmpty) elseCol
        else when(laterScores.map(score >= _).reduce(_ && _), lang)
          .otherwise(elseCol)
    }
  }

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: runs of letters, digits, or single other
    * non-space chars — the standard pre-tokenizer regex shape. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"))

  /** Ratio of non-alphanumeric-non-space chars to all chars. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(lower(text), "[a-z0-9\\s]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Ratio of English stopword tokens to all tokens. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    markerHits(toks, langMarkers.head._2).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1]: length credit + clean-charset
    * credit + natural-language credit. Exact per-row double arithmetic —
    * deterministic on any cluster and hash-identical in the oracle. */
  def qualityScore(text: Column): Column = {
    val lengthCredit = least(wsTokenCount(text).cast("double") / 100.0, lit(1.0))
    val cleanCredit = lit(1.0) - punctRatio(text)
    val naturalCredit = least(stopwordRatio(text) * 5.0, lit(1.0))
    lengthCredit * 0.4 + cleanCredit * 0.3 + naturalCredit * 0.3
  }

  /** Content-hash fingerprint over normalized text (md5 prefix) — the
    * oracle-friendly fingerprint; `rolling_min_hash` is the native
    * Expression variant. */
  def md5Fingerprint(text: Column, hexLen: Int = 16): Column =
    substring(md5(lower(trim(text))), 1, hexLen)

  /** Word n-grams as space-joined strings over a token array (empty array
    * when the doc has fewer than n tokens). Scan-local expression — no
    * explode, no shuffle. */
  def wordNgrams(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(k => get(toks, i + lit(k))): _*)))

  /** Fraction of n-grams that are repeats of an earlier n-gram in the
    * same document — the Gopher-class intra-document repetition signal
    * (Rae et al. 2021 filter docs on exactly this family). 0 for docs
    * shorter than n tokens. Exact integer ratio → bit-identical double
    * on any engine. */
  def dupNgramFrac(toks: Column, n: Int): Column = {
    val gs = wordNgrams(toks, n)
    (size(gs) - size(array_distinct(gs))).cast("double") /
      greatest(size(gs), lit(1)).cast("double")
  }

  /** Share of tokens taken by the single most frequent token (the other
    * standard repetition signal). Implemented as a scan-local expression:
    * per distinct token, count its occurrences with a nested array
    * filter — O(distinct × len) per document, bounded by document length,
    * and shuffle-free, which beats an explode + two-level aggregation at
    * scan time for bounded docs. */
  def topTokenFrac(toks: Column): Column = {
    val counts = transform(array_distinct(toks),
      t => size(filter(toks, x => x === t)))
    when(size(toks) === 0, lit(0.0))
      .otherwise(array_max(counts).cast("double") / size(toks).cast("double"))
  }
}
