package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram/shingle expressions.
  *
  * The declarative forms (`transform(sequence(...), i => ...)`) hide a
  * quadratic trap: Spark evaluates a higher-order-function lambda BODY per
  * element, interpreted, including any outer subtree it references — so
  * `transform(seq, i => lower(text).substr(i, n))` re-lowers the WHOLE
  * string at every position (O(len²) char work per document), and the
  * shingle form re-evaluates its token-array child the same way. Measured
  * at sf0.1 this made gram construction 5.8 s of dd16's 6.2 s total.
  *
  * These expressions evaluate the child ONCE and emit all grams in one
  * tight JVM loop behind a codegen'd static call (the same pattern as
  * [[Signatures]]/[[Vectors]]). Output is bit-identical to the
  * declarative forms: same 1-based SQL substring clamping, same
  * slice-then-concat_ws(" ") word joining, same ≥1-element floor
  * (char/shingle forms) or empty-when-short contract (word-n-gram form).
  */
object Ngrams {

  /** Character n-grams: positions 1..max(len−n+1, 1); SQL substring
    * semantics clamp the tail (and a shorter-than-n string yields itself
    * as its single "gram"). */
  def charNgrams(s: UTF8String, n: Int): ArrayData = {
    val count = math.max(s.numChars() - (n - 1), 1)
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      out(i) = s.substringSQL(i + 1, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  private val space = UTF8String.fromString(" ")

  private def joinSlice(arr: ArrayData, from: Int, until: Int): UTF8String = {
    val parts = new Array[UTF8String](until - from)
    var k = from
    while (k < until) {
      parts(k - from) = if (arr.isNullAt(k)) null else arr.getUTF8String(k)
      k += 1
    }
    // concatWs skips nulls — the concat_ws(" ", ...) contract
    UTF8String.concatWs(space, parts: _*)
  }

  /** Word shingles: windows at 0..max(len−n, 0) joined with " "; the tail
    * window truncates (slice semantics) and an under-n token array yields
    * one shingle of everything — matching
    * `transform(sequence(1, greatest(size−n+1, 1)), i =>
    *   concat_ws(" ", slice(toks, i, n)))`. */
  def wordShingles(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val count = math.max(len - (n - 1), 1)
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      out(i) = joinSlice(arr, i, math.min(i + n, len))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Word n-grams: full windows only — EMPTY array when the input has
    * fewer than n tokens (matching TextAnalysis.wordNgrams' contract). */
  def wordNgrams(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    if (len < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](len - n + 1)
      var i = 0
      while (i <= len - n) {
        out(i) = joinSlice(arr, i, i + n)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Shared tail of the two sorted-distinct variants: in-place binary
    * sort + adjacent dedup — equivalent to `array_sort(array_distinct(
    * ...))` (string sort is total, so sort-then-dedup equals
    * distinct-then-sort) without two further interpreted collection
    * passes and their allocations. UTF8String's compareTo is the same
    * binary ordering array_sort uses. One definition, so a comparator
    * fix can never reach one variant and miss the other (round-15
    * review deduplication). MUTATES its argument. */
  private def sortedDistinct(items: Array[UTF8String]): ArrayData = {
    java.util.Arrays.sort(items, null) // natural (binary) UTF8String order
    val out = new Array[Any](items.length)
    var m = 0
    var i = 0
    while (i < items.length) {
      if (m == 0 || items(i).compareTo(out(m - 1).asInstanceOf[UTF8String]) != 0) {
        out(m) = items(i)
        m += 1
      }
      i += 1
    }
    new GenericArrayData(if (m == out.length) out else out.take(m))
  }

  /** Sorted-distinct character n-grams in one loop — see
    * [[sortedDistinct]] for the fused sort+dedup rationale. */
  def charNgramsSorted(s: UTF8String, n: Int): ArrayData = {
    val count = math.max(s.numChars() - (n - 1), 1)
    val grams = new Array[UTF8String](count)
    var i = 0
    while (i < count) {
      grams(i) = s.substringSQL(i + 1, n)
      i += 1
    }
    sortedDistinct(grams)
  }

  def char_ngrams(c: Column, n: Int): Column =
    GraftBridge.column(CharNgrams(GraftBridge.expression(c), n))
  def char_ngrams_sorted(c: Column, n: Int): Column =
    GraftBridge.column(CharNgramsSorted(GraftBridge.expression(c), n))

  /** Sorted-distinct xxhash64 values (seed 42) of the character n-grams
    * — the 100 TB payload-slimmed form of [[charNgramsSorted]]: 8 fixed
    * bytes per gram instead of a padded UTF8String (~16 B at n=3), long
    * comparisons instead of byte-wise string compares in both the
    * per-doc sort and every downstream merge. Hash-Jaccard equals
    * string-Jaccard unless two DISTINCT grams of the same pair's union
    * collide in 64 bits (≈|union|²/2⁶⁵ per pair — ~1e-14 at 500 grams;
    * stated, not hidden: the string form stays the oracle-exact
    * catalog path). Dedup happens on the HASHES, so a collision can
    * only shrink a set by 1, never corrupt the order. */
  def charNgramHashesSorted(s: UTF8String, n: Int): ArrayData = {
    val count = math.max(s.numChars() - (n - 1), 1)
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) {
      hs(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(s.substringSQL(i + 1, n), 42L)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var m = 0
    var j = 0
    while (j < count) {
      if (m == 0 || hs(j) != hs(m - 1)) { hs(m) = hs(j); m += 1 }
      j += 1
    }
    new GenericArrayData(if (m == count) hs else hs.take(m))
  }

  def char_ngram_hashes_sorted(c: Column, n: Int): Column =
    GraftBridge.column(CharNgramHashesSorted(GraftBridge.expression(c), n))
  /** Sorted-distinct word shingles — `array_sort(array_distinct(
    * wordShingles(...)))` fused into one loop (see [[sortedDistinct]]). */
  def wordShinglesSorted(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val count = math.max(len - (n - 1), 1)
    val sh = new Array[UTF8String](count)
    var i = 0
    while (i < count) {
      sh(i) = joinSlice(arr, i, math.min(i + n, len))
      i += 1
    }
    sortedDistinct(sh)
  }

  def word_shingles(c: Column, n: Int): Column =
    GraftBridge.column(WordShinglesExpr(GraftBridge.expression(c), n))
  def word_shingles_sorted(c: Column, n: Int): Column =
    GraftBridge.column(WordShinglesSorted(GraftBridge.expression(c), n))
  def word_ngrams(c: Column, n: Int): Column =
    GraftBridge.column(WordNgramsExpr(GraftBridge.expression(c), n))
}

/** Character n-grams over a string → array<string>. */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string child, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Ngrams.charNgrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Ngrams.charNgrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "char_ngrams"
}

/** Sorted-distinct character n-grams over a string → array<string>. */
case class CharNgramsSorted(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string child, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Ngrams.charNgramsSorted(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Ngrams.charNgramsSorted($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "char_ngrams_sorted"
}

/** Sorted-distinct xxhash64 char-n-gram values over a string →
  * array<bigint> — see [[Ngrams.charNgramHashesSorted]]. */
case class CharNgramHashesSorted(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string child, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    Ngrams.charNgramHashesSorted(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Ngrams.charNgramHashesSorted($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "char_ngram_hashes_sorted"
}

/** Word shingles over array<string> → array<string> (≥ 1 element). */
case class WordShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    Signatures.checkStringArray(prettyName, child.dataType)
  override def nullSafeEval(input: Any): Any =
    Ngrams.wordShingles(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Ngrams.wordShingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

/** Sorted-distinct word shingles over array<string> → array<string>. */
case class WordShinglesSorted(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    Signatures.checkStringArray(prettyName, child.dataType)
  override def nullSafeEval(input: Any): Any =
    Ngrams.wordShinglesSorted(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Ngrams.wordShinglesSorted($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_shingles_sorted"
}

/** Word n-grams over array<string> → array<string> (empty when short). */
case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    Signatures.checkStringArray(prettyName, child.dataType)
  override def nullSafeEval(input: Any): Any =
    Ngrams.wordNgrams(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Ngrams.wordNgrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_ngrams"
}
