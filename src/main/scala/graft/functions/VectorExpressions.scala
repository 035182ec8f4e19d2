package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector dot product over array<float>/array<double>.
  *
  * Bit-compatible with the declarative form
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` over double-cast floats —
  * the same ascending-index sequential double fold — so swapping it under
  * existing cosine oracles changes nothing numerically, while replacing
  * three interpreted higher-order-function evaluations per pair with one
  * tight JVM loop inside whole-stage codegen (~60× on the pairwise
  * near-dup scan at sf0.1).
  *
  * The bit-compat claim is scoped to EQUAL-LENGTH arrays of non-null
  * elements — the embedding-column contract every caller feeds it.
  * Outside it the declarative form yields NULL (zip_with pads the short
  * side with nulls; null·x poisons the sum); a silent NULL or a silent
  * truncated partial product would both corrupt downstream ranks, so a
  * LENGTH MISMATCH THROWS instead (loud data-corruption signal, one
  * comparison on the hot path — round-15 review). Null ELEMENTS are not
  * per-element checked (a bitmap load+branch per element on the hottest
  * loop in the library): they read as 0.0, the documented divergence.
  */
object Vectors {

  def dot(arrA: ArrayData, arrB: ArrayData, isFloat: Boolean): Double = {
    val n = arrA.numElements()
    if (arrB.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_dot: length mismatch ($n vs ${arrB.numElements()}) — ragged " +
          "vectors are data corruption, not a dot-product input")
    var acc = 0.0
    var i = 0
    if (isFloat) {
      while (i < n) {
        acc += arrA.getFloat(i).toDouble * arrB.getFloat(i).toDouble
        i += 1
      }
    } else {
      while (i < n) {
        acc += arrA.getDouble(i) * arrB.getDouble(i)
        i += 1
      }
    }
    acc
  }

  def vec_dot(a: Column, b: Column): Column =
    GraftBridge.column(
      VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Squared L2 — same contract and conventions as [[dot]]: one
    * ascending sequential double fold `acc += (x−y)·(x−y)`, bit-identical
    * to the declarative
    * `aggregate(zip_with(a, b, (x, y) => (x−y)·(x−y)), 0.0, _+_)` on
    * equal-length non-null-element arrays (the embedding contract);
    * ragged inputs THROW (loud corruption signal, the vec_dot rule).
    * Round-20: replaces the interpreted HOF chain on the IVF-PQ
    * encode/serve and k-means assignment hot paths — the PQ encoder
    * alone evaluates m·codebookSize folds per corpus row. */
  def sqdist(arrA: ArrayData, arrB: ArrayData, isFloat: Boolean): Double = {
    val n = arrA.numElements()
    if (arrB.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_sqdist: length mismatch ($n vs ${arrB.numElements()}) — " +
          "ragged vectors are data corruption, not a distance input")
    var acc = 0.0
    var i = 0
    if (isFloat) {
      while (i < n) {
        val d = arrA.getFloat(i).toDouble - arrB.getFloat(i).toDouble
        acc += d * d
        i += 1
      }
    } else {
      while (i < n) {
        val d = arrA.getDouble(i) - arrB.getDouble(i)
        acc += d * d
        i += 1
      }
    }
    acc
  }

  def vec_sqdist(a: Column, b: Column): Column =
    GraftBridge.column(
      VecSqDist(GraftBridge.expression(a), GraftBridge.expression(b)))
}

case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs two array<float> or two array<double>, got " +
          s"${left.dataType} and ${right.dataType}")
    }

  private lazy val isFloat: Boolean =
    elemType(left.dataType).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any =
    Vectors.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Vectors.dot($a, $b, $isFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** Squared L2 distance — see [[Vectors.sqdist]]. */
case class VecSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_sqdist needs two array<float> or two array<double>, got " +
          s"${left.dataType} and ${right.dataType}")
    }

  private lazy val isFloat: Boolean =
    elemType(left.dataType).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any =
    Vectors.sqdist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Vectors.sqdist($a, $b, $isFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_sqdist"
}
