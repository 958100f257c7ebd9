package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** AS-OF JOIN as a first-class operator — Spark has no native one.
  *
  * Semantics: for every left row, attach the single right row with the
  * greatest `rightTime <= leftTime` (backward as-of; unmatched left rows
  * get nulls). The reference's only join-shaped computation (O12) is an
  * equi-join at window grain; the as-of join is its event-time
  * generalization and the standard way to align a fact stream with a
  * slowly-changing dimension (price marks, difficulty epochs, …).
  *
  * Physical strategy: the right side is REQUIRED to be dimension-sized
  * (the query contract everywhere in this engine — e.g. the distinct
  * date domain). It is collected once, sorted by time, broadcast, and
  * every left partition probes it by binary search — O(log m) per row,
  * zero shuffle of the fact side, embarrassingly parallel at any
  * executor count. (The shuffle-free probe replaces both the non-equi
  * BroadcastNestedLoop plan Spark would pick — O(n·m) — and the
  * linear array-probe composition used before this operator existed.)
  *
  * Pieces (SURVEY §4.2 custom-operator ladder, rung c):
  *   [[AsOfJoinNode]] logical node → [[AsOfJoinStrategy]] planner
  *   strategy (injected via GraftExtensions) → [[AsOfJoinExec]] physical
  *   operator → [[AsOfJoin.asof]] user API.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: Catalyst's PushDownPredicates cannot see through an
  * unknown node, so a Filter sitting on an [[AsOfJoinNode]] would block
  * pushdown all the way to the scan. This rule moves every conjunct that
  * references only left-side attributes below the join (the left side is
  * row-preserved by as-of semantics, so this is always sound); from
  * there the stock rules push it into the parquet scan. Registered via
  * GraftExtensions.injectOptimizerRule.
  */
object PushFilterThroughAsOfJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsOfJoinNode) =>
      val (pushable, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(a.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val newJoin = a.copy(left = Filter(pushable.reduce(And), a.left))
        keep.reduceOption(And).map(Filter(_, newJoin)).getOrElse(newJoin)
      }
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def doExecute(): RDD[InternalRow] = {
    val rtBound = BindReferences.bindReference(rightTime, right.output)
    // dimension-sized by contract: collect, key, sort, broadcast
    val sortedRight = right.executeCollect()
      .map(r => (rtBound.eval(r).asInstanceOf[Long], r))
      .sortBy(_._1)
    val keys: Array[Long] = sortedRight.map(_._1)
    val bcKeys = sparkContext.broadcast(keys)
    val bcRows = sparkContext.broadcast(sortedRight.map(_._2))
    val leftOut = left.output
    val rightArity = right.output.size
    val allOut = output

    left.execute().mapPartitions { iter =>
      val lt = BindReferences.bindReference(leftTime, leftOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightArity)
      val toUnsafe = UnsafeProjection.create(allOut, allOut)
      val ks = bcKeys.value
      val rs = bcRows.value
      iter.map { lrow =>
        val t = lt.eval(lrow)
        val idx =
          if (t == null) -1
          else {
            // greatest index with ks(idx) <= t
            var lo = 0; var hi = ks.length - 1; var ans = -1
            val tv = t.asInstanceOf[Long]
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (ks(mid) <= tv) { ans = mid; lo = mid + 1 }
              else hi = mid - 1
            }
            ans
          }
        toUnsafe(joined(lrow, if (idx >= 0) rs(idx) else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Backward as-of join; time columns must be TimestampType (or any
    * long-backed type). Right side must be dimension-sized. */
  def asof(leftDf: DataFrame, rightDf: DataFrame,
      leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val l = leftDf.queryExecution.analyzed
    val r = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String) = p.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"no column $n in ${p.output.map(_.name).mkString(", ")}"))
    ColumnBridge.ofRows(leftDf.sparkSession,
      AsOfJoinNode(l, r, attr(l, leftTimeCol), attr(r, rightTimeCol)))
  }
}
