package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprint: minimum of a 64-bit Karp–Rabin rolling hash over
  * all byte windows of size `window` (winnowing-style min-sampling).
  *
  * A native Catalyst `Expression` with real `doGenCode` (not a Scala UDF,
  * not CodegenFallback): the generated code is a single static call, so the
  * operator stays inside whole-stage codegen with no Row boxing — the
  * pattern to follow whenever the builtin registry lacks a function
  * (SURVEY.md §2f E4 is the reference's one custom Expression,
  * Microbase.scala:804-810, whose codegen path is never exercised; here it
  * is the hot path).
  *
  * The hash is computed in O(n) per document: wrap-around 64-bit polynomial
  * with base 257, window slide via precomputed base^window. Deterministic
  * across JVMs/executors — safe as a shuffle/dedup key at any scale.
  */
case class RollingMinHash(child: Expression, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // window is validated at ANALYSIS time, not left to blow up (or
    // silently fingerprint everything to 0) inside codegen: the SQL
    // registration makes `rolling_min_hash(text, -2)` user-reachable,
    // where a negative window read bytes(-2) and window=0 hashed every
    // document to 0L — collapsing a dedup keyed on the fingerprint into
    // one giant duplicate group (round-15 review).
    if (window <= 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_min_hash needs window > 0, got $window")
    else if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_min_hash needs a string child, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    RollingMinHash.compute(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingMinHash.compute($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "rolling_min_hash"
}

object RollingMinHash {
  private final val Base = 257L

  /** Static helper invoked from both interpreted eval and generated code. */
  def compute(s: UTF8String, window: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    // base^w (wrap-around)
    var pw = 1L
    var i = 0
    while (i < w) { pw *= Base; i += 1 }
    // first window
    var h = 0L
    i = 0
    while (i < w) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    var min = h
    // slide
    i = w
    while (i < n) {
      h = h * Base + (bytes(i) & 0xff) - pw * (bytes(i - w) & 0xff)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Column-DSL exposure. */
  def rolling_min_hash(c: Column, window: Int): Column =
    GraftBridge.column(
      RollingMinHash(GraftBridge.expression(c), window))

  /** SQL registration: `SELECT rolling_min_hash(text, 16)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_min_hash",
      exprs => RollingMinHash(exprs.head,
        exprs(1).eval(null).asInstanceOf[Number].intValue()),
      "built-in")
}
