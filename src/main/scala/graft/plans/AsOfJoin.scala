package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** As-of join as a first-class operator: logical node + planner strategy
  * + physical merge-scan — preference (c) in the custom-operator ladder,
  * for the one time-series operator Spark has no native plan for.
  *
  * [[graft.operators.AsOfOps.asofJoin]] already expresses as-of as a
  * union + ignore-nulls window (preference (a)); that shape pays for
  * materializing every left row into the window frame and carries the
  * whole union through one sort. This operator gives the join its own
  * physical algorithm — the kdb/QuestDB/DuckDB `ASOF JOIN` plan: hash-
  * cluster both sides on the key, sort each side once within partitions
  * (left by (key, time), right by (key, time, ord)), then a single
  * forward merge pass per partition emits every left row joined to the
  * most recent right row at-or-before it. At 100 TB that is exactly a
  * sort-merge join's cost — one shuffle per side, no N×M range
  * expansion, no window frame state — and the merge needs O(1) memory
  * per partition (one retained candidate row), so skewed keys spill
  * nothing.
  *
  * Semantics (drop-in for [[graft.operators.AsOfOps.asofJoin]] and the
  * union-window oracle SQL): per left row, the right row with the
  * greatest (time, ord) such that right.time <= left.time on the same
  * key; unmatched left rows keep nulls on the right. NULL handling
  * mirrors the window form exactly: a NULL key groups with NULL keys
  * (PARTITION BY semantics, not equi-join NULL-rejection), and a NULL
  * time sorts first and behaves as −∞ — a null-time left row can match
  * only null-time right rows. A `tolerance` requires
  * left.time - right.time <= tolerance with BOTH times non-null (the
  * window form's null age). Callers wanting SQL join semantics
  * pre-filter null keys/times.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute, rightOrd: Attribute,
    tolerance: Option[Long]) extends BinaryNode {
  require(leftKeys.size == rightKeys.size && leftKeys.nonEmpty,
    "as-of join needs matching non-empty key lists")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val resolved: Boolean = childrenResolved &&
    leftTime.dataType == LongType && rightTime.dataType == LongType &&
    leftKeys.forall(k => left.outputSet.contains(k)) &&
    rightKeys.forall(k => right.outputSet.contains(k)) &&
    left.outputSet.contains(leftTime) &&
    right.outputSet.contains(rightTime) &&
    right.outputSet.contains(rightOrd) &&
    leftKeys.zip(rightKeys).forall { case (l, r) => l.dataType == r.dataType }

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] onto [[AsOfJoinExec]]. Registered both by
  * [[graft.GraftExtensions]] and at first use via
  * `GraftPlanBridge.ensureStrategy` (sessions built without extensions).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(left, right, lk, rk, lt, rt, ro, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, ro, tol, planLater(left), planLater(right)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: co-partitioned (EnsureRequirements inserts the
  * two hash exchanges + per-partition sorts from the declared
  * requirements) single forward merge scan. Row-at-a-time (no codegen) —
  * but the per-row work is a key compare and at most one row copy, and
  * unlike the union-window form there is no window buffer: memory is
  * O(1) per partition regardless of key skew.
  */
case class AsOfJoinExec(leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute, rightOrd: Attribute,
    tolerance: Option[Long], left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ Seq(rightTime, rightOrd)).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val tol = tolerance
    // capture schemas, not `this`, in the closure
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output // right side nullability already widened
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(lKeyExprs, lOut)
      val rKey = UnsafeProjection.create(rKeyExprs, rOut)
      val lTime = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTime = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val nullRight = InternalRow.fromSeq(Seq.fill(rOut.size)(null))
      val joined = new JoinedRow
      // final projection to UnsafeRow, mirroring SortMergeJoinExec's
      // resultProj: a parent that requires UnsafeRow (e.g. an Exchange
      // directly above this node, with no intervening Project) would
      // ClassCastException on a raw JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      // the retained candidate: the LAST consumed right row and its key.
      // Consumption order (key asc, time asc NULLS FIRST, ord asc) makes
      // it the greatest (time, ord) at-or-before the current left row
      // whenever the keys match. Null times are −∞ (sort first, matching
      // the union-window form's NULLS FIRST frame order).
      var cand: InternalRow = null
      var candKey: InternalRow = null
      var candTime = 0L
      var candTimeNull = false
      lIter.map { lRow =>
        val lk = lKey(lRow)
        val lt = lTime(lRow)
        val lNull = lt.isNullAt(0)
        val lts = if (lNull) Long.MinValue else lt.getLong(0)
        var advancing = true
        while (advancing && rHead != null) {
          val rk = rKey(rHead)
          val c = keyOrd.compare(rk, lk)
          val rt = rTime(rHead)
          val rNull = rt.isNullAt(0)
          val rts = if (rNull) Long.MinValue else rt.getLong(0)
          if (c < 0 || (c == 0 && rts <= lts)) {
            cand = rHead.copy()
            candKey = rk.copy()
            candTime = rts
            candTimeNull = rNull
            rHead = if (rIter.hasNext) rIter.next() else null
          } else {
            advancing = false
          }
        }
        val matched = cand != null && keyOrd.compare(candKey, lk) == 0 &&
          tol.forall(t => !lNull && !candTimeNull && lts - candTime <= t)
        resultProj(joined(lRow, if (matched) cand else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
