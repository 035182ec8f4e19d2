package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native signed-random-projection (SRP) LSH bucket keys.
  *
  * The declarative form in `graft.ops.Similarity` built one literal
  * hyperplane array per (table, bit) — tables × bits × dim literals
  * (8,192 at the dd9 defaults) inlined into the expression tree, which
  * bloats the plan and pressures codegen as dimensions grow. This
  * expression derives the same hyperplanes on the fly from the same
  * deterministic splitmix64 stream and emits every table's signature in
  * one tight JVM loop — constant plan size in (tables, bits, dim), one
  * codegen'd static call, bit-identical outputs (same ascending-index
  * sequential double fold as `vec_dot`, same `(double)` widening of
  * float inputs).
  *
  * Output: `array<struct<t:int, sig:int>>` of length `tables` — exactly
  * the shape `Similarity.srpBuckets` exploded into (table, bucket) shuffle
  * keys, so it drops in without touching downstream joins.
  */
object Srp {

  /** Same stream as the declarative implementation (no mask — sign
    * carries into the [-1, 1) plane component). */
  @inline private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1).
    *
    * Seed = t·262147 + b·4099 + j is injective ONLY inside the envelope
    * `dim ≤ 4099 && (bits−1)·4099 + dim ≤ 262147` — beyond it (t,b,j)
    * triples collide and signature bits silently correlate, degrading
    * bucket quality with no error. [[SrpBuckets.checkInputDataTypes]]
    * refuses parameters outside the envelope (round-15 review); the
    * formula itself stays untouched because the declarative
    * `Similarity` stream and the SignatureTruth scalar replication pin
    * these exact values. */
  @inline def plane(table: Int, bit: Int, j: Int): Double =
    splitmix64(table.toLong * 262147 + bit.toLong * 4099 + j).toDouble /
      Long.MaxValue.toDouble

  /** The plane matrix for a (tables, bits, dim) config. Pure function of
    * the indices, but recomputing it per ROW cost tables·bits·dim
    * splitmix64 evaluations on every corpus row — ~4–5× the FLOPs of the
    * projections themselves at the dd9 defaults (round-15 review). It is
    * resolved ONCE per [[SrpBuckets]] instance (a `@transient lazy val`
    * shipped into codegen as a reference object), not through a per-row
    * keyed-cache lookup: the round-15 ConcurrentHashMap boxed a fresh
    * Tuple3 key on every row of the hot LSH path and grew unboundedly per
    * distinct config for the executor-JVM lifetime (round-16 advice). */
  def planesOf(tables: Int, bits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(tables * bits) { tb =>
      val t = tb / bits
      val b = tb % bits
      Array.tabulate(dim)(j => plane(t, b, j))
    }

  /** All signatures of `arr` as (t, sig) rows, one per hash table
    * (`pl.length / bits` of them). Fold order and float→double widening
    * match `Vectors.dot` over the cast array, so results are bit-identical
    * to the literal-plane form — which also fixes the ragged-input policy:
    * the reference form feeds `vec_dot` a dim-length literal plane, so a
    * vector whose length differs from `dim` THROWS there; silently
    * truncating here instead would break the documented bit-identity
    * cross-check at non-fixture dims (round-16 advice). Both forms now
    * refuse ragged input loudly. */
  def buckets(
      arr: ArrayData, pl: Array[Array[Double]], bits: Int, dim: Int,
      isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    if (n != dim)
      throw new IllegalArgumentException(
        s"srp_buckets: vector length $n != dim $dim — ragged embeddings " +
          "are data corruption, not an LSH input (the literal-plane " +
          "reference form throws here too)")
    val tables = pl.length / bits
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var sig = 0
      var b = 0
      while (b < bits) {
        val p = pl(t * bits + b)
        var acc = 0.0
        var j = 0
        while (j < n) {
          val v = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
          acc += v * p(j)
          j += 1
        }
        if (acc > 0) sig |= (1 << b)
        b += 1
      }
      out(t) = new GenericInternalRow(Array[Any](t, sig)): InternalRow
      t += 1
    }
    new GenericArrayData(out)
  }

  def srp_buckets(vec: Column, tables: Int, bits: Int, dim: Int): Column =
    GraftBridge.column(
      SrpBuckets(GraftBridge.expression(vec), tables, bits, dim))
}

/** SRP-LSH bucket keys over array<float>/array<double> →
  * array<struct<t:int, sig:int>> of length `tables`. */
case class SrpBuckets(child: Expression, tables: Int, bits: Int, dim: Int)
    extends UnaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("t", IntegerType, nullable = false),
      StructField("sig", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (tables <= 0 || bits <= 0 || bits > 31 || dim <= 0)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs tables > 0, 0 < bits <= 31, dim > 0" +
          s" (got tables=$tables, bits=$bits, dim=$dim)")
    else if (dim > 4099 || (bits - 1).toLong * 4099 + dim > 262147)
      // outside this envelope the seed formula t*262147 + b*4099 + j
      // collides across (bit, j) — see [[Srp.plane]]; refuse loudly
      // instead of silently correlating signature bits
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName seed envelope exceeded: need dim <= 4099 and" +
          s" (bits-1)*4099 + dim <= 262147 (got bits=$bits, dim=$dim)" +
          " — beyond it hyperplane components collide and LSH bits correlate")
    else elemType(child.dataType) match {
      case Some(_) => TypeCheckResult.TypeCheckSuccess
      case None => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<float> or array<double>, got ${child.dataType}")
    }

  private lazy val isFloat: Boolean =
    elemType(child.dataType).contains(FloatType)

  /** Plane matrix resolved once per expression instance (per executor,
    * after deserialization) — a few KB, microseconds — instead of a
    * per-row keyed-cache lookup. */
  @transient private lazy val planes: Array[Array[Double]] =
    Srp.planesOf(tables, bits, dim)

  override def nullSafeEval(input: Any): Any =
    Srp.buckets(input.asInstanceOf[ArrayData], planes, bits, dim, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("srpPlanes", planes, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Srp.buckets($c, $planesRef, $bits, $dim, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "srp_buckets"
}
