package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, TimestampType}

/** Native as-of join — the full custom-operator stack (build-brief option
  * (c)): a marker predicate the user plants in an ordinary `join(...)`
  * condition, an analyzer [[Rule]] that rewrites the marked [[Join]] into
  * a dedicated [[AsOfJoinNode]], and a planner [[SparkStrategy]] that
  * lowers it to [[AsOfJoinExec]] — a co-partitioned, sort-merged physical
  * operator. All three are registered through `SparkSessionExtensions`
  * ([[graft.functions.GraftExtensions]]).
  *
  * Semantics (pinned by the DuckDB `ASOF LEFT JOIN` oracle shared with the
  * composed variant [[graft.ops.Events.asofJoin]]): each left row matches
  * the single right row with equal keys and the greatest `rightTime <=
  * leftTime` (optionally within `toleranceMicros`). Null keys and null
  * times never match, mirroring SQL equi-join null semantics.
  *
  * Scale posture: both sides hash-cluster on the join keys (one exchange
  * each, planned by EnsureRequirements exactly like a shuffled join) and
  * sort by (keys, time); the probe is then a single streamed merge pass
  * per partition holding ONE buffered right row — O(|L|+|R|) time, O(1)
  * state, no range-explosion and no per-row lookup structure. This is the
  * operator shape a 100 TB event⋈quote backfill needs; the union+window
  * composition it replaces carries the full width of both sides through
  * its window sort instead.
  */
case class AsOfMark(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    toleranceMicros: Option[Long]) extends Expression with Unevaluable {
  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of join needs at least one equi-key on each side")
  override def children: Seq[Expression] = leftKeys ++ rightKeys :+ leftTime :+ rightTime
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AsOfMark = {
    val n = leftKeys.length
    copy(leftKeys = newChildren.slice(0, n), rightKeys = newChildren.slice(n, 2 * n),
      leftTime = newChildren(2 * n), rightTime = newChildren(2 * n + 1))
  }
}

/** Logical as-of join. Appears only between analysis (planted by
  * [[AsOfJoinResolution]]) and physical planning ([[AsOfJoinStrategy]]).
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    toleranceMicros: Option[Long], leftOuter: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output
  override lazy val resolved: Boolean = childrenResolved &&
    leftKeys.forall(_.resolved) && rightKeys.forall(_.resolved) &&
    leftTime.resolved && rightTime.resolved &&
    left.outputSet.intersect(right.outputSet).isEmpty
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Analyzer rule (injected via `injectResolutionRule`): once the marked
  * join's condition is fully resolved, swap the [[Join]] for the dedicated
  * node. Runs inside the analyzer's fixed-point resolution batch, so
  * CheckAnalysis never sees the Unevaluable marker.
  */
class AsOfJoinResolution extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case Join(l, r, jt, Some(m: AsOfMark), _)
        if l.resolved && r.resolved && m.childrenResolved =>
      require(jt == LeftOuter || jt == Inner,
        s"as-of join supports inner / left_outer, got $jt")
      AsOfJoinNode(l, r, m.leftKeys, m.rightKeys, m.leftTime, m.rightTime,
        m.toleranceMicros, leftOuter = jt == LeftOuter)
  }
}

/** Planner strategy (injected via `injectPlannerStrategy`). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tol, leftOuter) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol, leftOuter) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join. EnsureRequirements satisfies the clustered
  * distributions + sort orders below (inserting hash exchanges and sorts
  * exactly as for SortMergeJoin), after which each co-located partition
  * pair is merged in one streamed pass.
  */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    toleranceMicros: Option[Long], leftOuter: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (leftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // The merge streams the left side in order, so key-clustering and the
  // (keys, time) sort both survive this operator.
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val (lk, rk, lt, rt) = (leftKeys, rightKeys, leftTime, rightTime)
    val (lOut, rOut) = (left.output, right.output)
    val outAttrs = output
    val tol = toleranceMicros
    val isOuter = leftOuter
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      // Bind against nullable right attrs: the outer-side null-fill row
      // must read as null even when the child schema says non-nullable.
      val resultProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      val rBuf = rIter.buffered
      // The single piece of merge state: the most recent right row whose
      // (key, time) is <= the current left (key, time), plus copies of its
      // key and time for the staleness / tolerance checks at emit.
      var heldRow: InternalRow = null
      var heldKey: InternalRow = null
      var heldTime: InternalRow = null
      lIter.flatMap { l =>
        val lKey = lKeyProj(l)
        val lTimeRow = lTimeProj(l)
        if (lKey.anyNull || lTimeRow.isNullAt(0)) {
          if (isOuter) Iterator.single(resultProj(joined(l, nullRight))) else Iterator.empty
        } else {
          var scan = true
          while (scan && rBuf.hasNext) {
            val head = rBuf.head
            val rKey = rKeyProj(head)
            if (rKey.anyNull) { rBuf.next(); () }
            else {
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) { rBuf.next(); () } // behind every remaining left key: drop
              else if (c > 0) scan = false   // ahead of this left key: stop
              else {
                val rTimeRow = rTimeProj(head)
                if (rTimeRow.isNullAt(0)) { rBuf.next(); () } // nulls sort first; never match
                else if (timeOrd.compare(rTimeRow, lTimeRow) <= 0) {
                  heldRow = rBuf.next().copy()
                  heldKey = lKey.copy()
                  heldTime = rTimeRow.copy()
                } else scan = false           // future row for this key: stop
              }
            }
          }
          val matched = heldRow != null && keyOrd.compare(heldKey, lKey) == 0 &&
            tol.forall(t => lTimeRow.getLong(0) - heldTime.getLong(0) <= t)
          if (matched) Iterator.single(resultProj(joined(l, heldRow)))
          else if (isOuter) Iterator.single(resultProj(joined(l, nullRight)))
          else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing API: plants the marker in a plain `DataFrame.join`, so the
  * whole extension pipeline (rule → node → strategy → exec) does the rest.
  */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
           leftOn: Seq[Column], rightOn: Seq[Column],
           leftTime: Column, rightTime: Column,
           joinType: String = "left",
           toleranceMicros: Option[Long] = None): DataFrame = {
    val mark = AsOfMark(
      leftOn.map(GraftSqlBridge.expression), rightOn.map(GraftSqlBridge.expression),
      GraftSqlBridge.expression(leftTime), GraftSqlBridge.expression(rightTime),
      toleranceMicros)
    left.join(right, GraftSqlBridge.column(mark), joinType)
  }
}
