package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Sort-merge as-of join.
  *
  * Scale shape: one hash shuffle per side on the equi keys (inserted by
  * EnsureRequirements from `requiredChildDistribution`), a per-partition
  * sort on (keys, time[, tiebreak]) (from `requiredChildOrdering`), then
  * ONE forward merge pass per partition — O(|left| + |right|) with a
  * single buffered right row, no per-key pair blowup and no state beyond
  * one row. This is the plan a 100 TB as-of join needs; the compositional
  * form (equi join + rank filter) writes every (left, earlier-right)
  * pair to the rank shuffle first.
  *
  * Null semantics match SQL joins: null keys never match (right rows with
  * null keys or null time are skipped; left rows with null keys get null
  * right columns).
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTieBreak)).map(SortOrder(_, Ascending)))

  // Rows come out in left order; the merge never reorders them.
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullRight = new GenericInternalRow(right.output.length)
      val joined = new JoinedRow
      // Downstream consumers (getByteArrayRdd, exchanges) require UnsafeRow
      // output from a leaf-consumed operator, so re-project the JoinedRow.
      val resultProj = UnsafeProjection.create(output, output)

      new Iterator[InternalRow] {
        // one-row lookahead into the right side (skips null key/time rows)
        private var rRow: InternalRow = advanceRight()
        // the best (latest ≤ t) right row for the current left key
        private var held: InternalRow = _
        private var heldKey: InternalRow = _

        private def advanceRight(): InternalRow = {
          while (rIter.hasNext) {
            val r = rIter.next()
            if (!rKeyProj(r).anyNull && !rTimeProj(r).isNullAt(0)) return r
          }
          null
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          if (lk.anyNull) return resultProj(joined(l, nullRight))
          if (heldKey != null && keyOrd.compare(heldKey, lk) != 0) {
            held = null; heldKey = null
          }
          val lt = lTimeProj(l)
          if (lt.isNullAt(0)) return resultProj(joined(l, nullRight)) // unknown time: no match
          // advance the right cursor past everything ≤ (lk, lt); the last
          // equal-key row consumed is the match (sorted by time, tiebreak).
          var done = rRow == null
          while (!done) {
            val c = keyOrd.compare(rKeyProj(rRow), lk)
            if (c < 0) rRow = advanceRight()
            else if (c == 0 && timeOrd.compare(rTimeProj(rRow), lt) <= 0) {
              held = rRow.copy(); heldKey = lk.copy()
              rRow = advanceRight()
            } else done = true
            if (rRow == null) done = true
          }
          resultProj(joined(l, if (held == null) nullRight else held))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
