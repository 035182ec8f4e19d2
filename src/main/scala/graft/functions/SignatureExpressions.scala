package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native dedup-signature expressions.
  *
  * The declarative MinHash/SimHash in `graft.ops.Dedup` compose built-in
  * higher-order functions, which evaluate interpreted per element and
  * re-hash each shingle once per hash family (32×). These expressions
  * compute the same shapes in one tight JVM loop — each element is
  * xxhash64'd exactly once, then mixed per family with splitmix64 — and
  * emit a single static call from `doGenCode`, so they stay inside
  * whole-stage codegen. Deterministic across executors: safe shuffle keys.
  */
object Signatures {

  /** splitmix64 finalizer — cheap per-family mix of a precomputed hash. */
  @inline final def mix(h: Long, i: Int): Long = {
    var z = h + 0x9e3779b97f4a7c15L * (i + 1)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) & Long.MaxValue
  }

  /** MinHash: one xxhash64 per element, `numHashes` mixes, running mins. */
  def minhash(arr: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
        var i = 0
        while (i < numHashes) {
          val m = mix(h, i)
          if (m < mins(i)) mins(i) = m
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** SimHash: 64 ±1 votes per element from one xxhash64 each. */
  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(j), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def min_hash(c: Column, numHashes: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(c), numHashes))

  def sim_hash(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "min_hash",
      exprs => MinHashSignature(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue()),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sim_hash", exprs => SimHash64(exprs.head), "built-in")
  }

  private[functions] def checkStringArray(
      name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name needs array<string>, got $other")
  }
}

/** MinHash signature over an array<string> → array<long> of `numHashes`. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    Signatures.checkStringArray(prettyName, child.dataType)

  override def nullSafeEval(input: Any): Any =
    Signatures.minhash(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Signatures.minhash($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "min_hash"
}

/** SimHash over an array<string> → 64-bit long. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    Signatures.checkStringArray(prettyName, child.dataType)

  override def nullSafeEval(input: Any): Any =
    Signatures.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Signatures.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "sim_hash"
}
