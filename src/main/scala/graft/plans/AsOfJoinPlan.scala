package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.TimestampType

/** Whole-operator extension tier (SURVEY §2.10 preference (c)): the as-of
  * join as a first-class plan node — logical node, planner strategy, and a
  * physical operator that DECLARES its distribution and ordering needs so
  * Catalyst inserts exactly one hash exchange + per-partition sort per side,
  * then streams a linear merge (no union trick, no window state).
  *
  * Semantics match operators.AsOf.asofJoin: for every left row, the single
  * most recent right row with right.ts <= left.ts on the same key (right
  * columns null when none). Left rows stream; memory is O(1) per partition
  * beyond the sort the planner already provides.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTs: Attribute, rightTs: Attribute)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
                                                 newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(lk, rk, lts, rts, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKey: Attribute, rightKey: Attribute,
                        leftTs: Attribute, rightTs: Attribute,
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  /** Tie contract (the repo's spell-the-tie-break rule): the merge keeps the
    * LAST right row consumed at each (key, ts), so the right child's required
    * ordering extends past (key, ts) to every remaining orderable column —
    * ties then resolve to the lexicographic MAX of the right row, matching
    * operators.AsOf.asofJoin's struct-max reduction, instead of whichever
    * row the shuffle happened to order last. Extra sort keys only cost work
    * within tie groups, which are empty in the common case.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    SortOrder(rightKey, Ascending) +: SortOrder(rightTs, Ascending) +:
      right.output
        .filterNot(a => a.exprId == rightKey.exprId || a.exprId == rightTs.exprId)
        .filter(a => RowOrdering.isOrderable(a.dataType))
        .map(a => SortOrder(a, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
                                                 newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val lTsIdx = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rTsIdx = right.output.indexWhere(_.exprId == rightTs.exprId)
    val keyType = leftKey.dataType
    val keyOrdering = TypeUtils.getInterpretedOrdering(keyType)
    val nRight = right.output.length
    val outputAttrs = output
    require(leftTs.dataType == TimestampType && rightTs.dataType == TimestampType,
      "as-of columns must be TimestampType")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(nRight)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outputAttrs.map(_.dataType).toArray)
      var rNext: InternalRow = null           // next unconsumed right row
      var lastKey: Any = null                 // key of the buffered match
      var lastMatch: InternalRow = null       // latest right row <= current left ts
      def advanceRight(): Unit = { rNext = if (rIter.hasNext) rIter.next() else null }
      advanceRight()

      lIter.map { lRow =>
        val k = lRow.get(lKeyIdx, keyType)
        val ts = lRow.getLong(lTsIdx)
        // consume right rows whose (key, ts) are at-or-before (k, ts)
        var continue = rNext != null
        while (continue) {
          val rk = rNext.get(rKeyIdx, keyType)
          val cmp = keyOrdering.compare(rk, k)
          if (cmp < 0 || (cmp == 0 && rNext.getLong(rTsIdx) <= ts)) {
            lastKey = rk
            lastMatch = rNext.copy()
            advanceRight()
            continue = rNext != null
          } else continue = false
        }
        val matched = lastMatch != null && keyOrdering.compare(lastKey, k) == 0
        val out = joined(lRow, if (matched) lastMatch else nullRight)
        proj(out)
      }
    }
  }
}

object AsOfJoinPlan {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** DataFrame-facing entry: resolves the key/ts attributes on the analyzed
    * children and executes through the injected strategy (register
    * [[AsOfJoinStrategy]] via GraftExtensions or
    * spark.experimental.extraStrategies).
    *
    * Known limitation: a parent that consumes ZERO columns (a bare
    * `count()`) lets ColumnPruning strip the child outputs below the node's
    * own key/ts requirements; project at least one column first (any real
    * consumer does).
    */
  def asofJoinExec(left: DataFrame, right: DataFrame, key: String,
                   tsCol: String, rightSuffix: String = "_r"): DataFrame = {
    import org.apache.spark.sql.functions.col
    // re-alias the right side: fresh exprIds (left and right often share a
    // lineage, and analysis would otherwise deduplicate the right child and
    // orphan our captured attributes) + collision-free output names
    val rightRenamed = right.select(
      right.columns.map(c => col(c).as(c + rightSuffix)).toIndexedSeq: _*)
    val lp = left.queryExecution.analyzed
    val rp = rightRenamed.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    ColumnBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lp, rp, attr(lp, key), attr(rp, key + rightSuffix),
        attr(lp, tsCol), attr(rp, tsCol + rightSuffix)))
  }
}
