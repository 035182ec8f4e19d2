package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native intersection count over two SORTED distinct string arrays —
  * a single O(n+m) merge loop with no per-evaluation hash set, vs the
  * builtin `array_intersect` which builds a hash map per call. The count
  * is the same integer either way, so Jaccard values (and their oracles)
  * are unchanged; only the cost moves. Callers must pre-sort with
  * `array_sort` (binary UTF8 order — the same order this merge uses).
  */
object SortedArrays {

  def intersectCount(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val x = a.getUTF8String(i); val y = b.getUTF8String(j)
      val cmp = x.compareTo(y)
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectCount(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Smallest intersection count c whose DOUBLE Jaccard c/(total−c)
    * clears `t` under the same `fl(c/(total−c)) >= t` comparison the
    * verification filter applies — computed by integer start + float
    * fix-up so the early-exit bound in [[jaccardGe]] can never disagree
    * with the final double filter at a rounding boundary. */
  def requiredOverlap(total: Int, t: Double): Int = {
    var c = math.max(0, math.ceil(t * total / (1.0 + t)).toInt - 1)
    // NaN guard: for total=0 (both-empty pair) 0/0 compares false both
    // ways, so the first loop steps once to c=1 and the second cannot
    // undo it — required 1 > total is returned. That stays correct:
    // [[jaccardGe]]'s merge loop never runs for empty inputs (the
    // early-exit test is unreachable), and its final NaN jaccard is
    // dropped by the >= t consumer, matching the full merge.
    while (c <= total && !(c.toDouble / (total - c).toDouble >= t)) c += 1
    while (c > 0 && (c - 1).toDouble / (total - (c - 1)).toDouble >= t) c -= 1
    c
  }

  /** Threshold-gated sorted-merge Jaccard: the EXACT double
    * c/(|A|+|B|−c) whenever the pair can still reach `t`, and −1.0 the
    * moment it provably cannot (matched + min(remaining) drops below
    * [[requiredOverlap]]). Lossless under a `jaccard >= t` consumer:
    * the early exit fires only when every completion of the merge lands
    * below t (division is monotone in (numerator↑, denominator↓) and
    * fl() preserves real-value order, so the rounded bound dominates
    * the rounded final value); survivors complete the full merge and
    * return the bit-identical value [[intersectCount]] would imply. On
    * dissimilar pairs (the bulk of any sliding-window candidate set)
    * this skips the back ~1/3..2/3 of the merge. */
  def jaccardGe(a: ArrayData, b: ArrayData, t: Double): Double = {
    val n = a.numElements(); val m = b.numElements()
    val required = requiredOverlap(n + m, t)
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      if (c + math.min(n - i, m - j) < required) return -1.0
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c.toDouble / (n + m - c).toDouble
  }

  /** OR-mask over a gram set: `words`×64 bits, bit xxhash64(gram) mod
    * bits. Basis of the lossless pair pre-gate: a bit set in A's mask
    * but not B's can only have been set by a gram in A\B, so
    * popcount(mA & ~mB) lower-bounds |A\B| regardless of collisions
    * (collisions only WEAKEN the bound, never break it). */
  def gramMask(arr: ArrayData, words: Int): ArrayData = {
    val mask = new Array[Long](words)
    val bits = words * 64
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        val idx = java.lang.Long.remainderUnsigned(h, bits.toLong).toInt
        mask(idx >>> 6) |= (1L << (idx & 63))
      }
      i += 1
    }
    new GenericArrayData(mask)
  }

  /** popcount(a & ~b) over two equal-width long-array masks. */
  def maskDiffBits(a: ArrayData, b: ArrayData): Int = {
    val w = math.min(a.numElements(), b.numElements())
    var i = 0; var c = 0
    while (i < w) {
      c += java.lang.Long.bitCount(a.getLong(i) & ~b.getLong(i))
      i += 1
    }
    c
  }

  /** [[jaccardGe]] over two SORTED distinct LONG arrays (the hashed-gram
    * payload-slimmed path) — identical early-exit/threshold semantics,
    * long comparisons instead of UTF8String compares. */
  def jaccardGeLong(a: ArrayData, b: ArrayData, t: Double): Double = {
    val n = a.numElements(); val m = b.numElements()
    val required = requiredOverlap(n + m, t)
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      if (c + math.min(n - i, m - j) < required) return -1.0
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c.toDouble / (n + m - c).toDouble
  }

  def sorted_jaccard_ge(a: Column, b: Column, t: Double): Column =
    GraftBridge.column(SortedJaccardGe(
      GraftBridge.expression(a), GraftBridge.expression(b), t))

  def sorted_jaccard_ge_long(a: Column, b: Column, t: Double): Column =
    GraftBridge.column(SortedJaccardGeLong(
      GraftBridge.expression(a), GraftBridge.expression(b), t))

  def gram_mask(c: Column, words: Int): Column =
    GraftBridge.column(GramMask(GraftBridge.expression(c), words))

  def mask_diff_bits(a: Column, b: Column): Column =
    GraftBridge.column(MaskDiffBits(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count needs two array<string>, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedArrays.intersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedArrays.intersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

/** Threshold-gated Jaccard over two SORTED distinct string arrays —
  * see [[SortedArrays.jaccardGe]]. `threshold` is a literal plan
  * parameter (the MinHashSignature numHashes convention). */
case class SortedJaccardGe(left: Expression, right: Expression,
    threshold: Double) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_jaccard_ge needs two array<string>, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedArrays.jaccardGe(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedArrays.jaccardGe($a, $b, $threshold)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_jaccard_ge"
}

/** Threshold-gated Jaccard over two SORTED distinct long arrays —
  * see [[SortedArrays.jaccardGeLong]]. */
case class SortedJaccardGeLong(left: Expression, right: Expression,
    threshold: Double) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_jaccard_ge_long needs two array<bigint>, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedArrays.jaccardGeLong(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedArrays.jaccardGeLong($a, $b, $threshold)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_jaccard_ge_long"
}

/** Per-doc gram OR-mask (array<string> → array<long> of `words`) —
  * see [[SortedArrays.gramMask]]. */
case class GramMask(child: Expression, words: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    Signatures.checkStringArray(prettyName, child.dataType)

  override def nullSafeEval(input: Any): Any =
    SortedArrays.gramMask(input.asInstanceOf[ArrayData], words)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SortedArrays.gramMask($c, $words)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "gram_mask"
}

/** popcount(a & ~b) over two long-array masks → int. */
case class MaskDiffBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"mask_diff_bits needs two array<bigint>, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedArrays.maskDiffBits(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedArrays.maskDiffBits($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "mask_diff_bits"
}
