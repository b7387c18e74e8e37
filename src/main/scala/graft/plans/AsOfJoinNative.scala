package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator extension path (SURVEY §7.3 preference (c)): a custom
  * logical plan node + planner Strategy + physical operator for the
  * backward as-of join — an operator Spark's built-in join set lacks
  * (the reference engine lacks it too; q103 implements the same
  * semantics compositionally via a union + cumulative window).
  *
  * Semantics: LEFT OUTER as-of — for every left row, the single right
  * row with the same key and the greatest time <= the left row's time
  * (ties on time broken by the greatest tie-break value); unmatched left
  * rows pad the right side with nulls.
  *
  * Physical shape: the right (reference/quote) side flows through
  * Spark's own BroadcastExchange (declared via requiredChildDistribution
  * = BroadcastDistribution), each task builds a per-key time-sorted
  * index of it once per partition, and the streamed left side probes by
  * binary search — O(left + right·log right) with NO shuffle of the big
  * side and no sort of the probe side. At 100 TB this is the
  * fact-to-reference-series join shape (prices, dimensions-as-of,
  * config history); a shuffled merge variant would cover
  * right-side-too-big-to-broadcast, which q103's single-window-pass
  * formulation already provides.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Broadcast backward as-of join: probe side streamed, build side
  * broadcast and indexed (per key: times ascending, ties by tie-break
  * ascending; the probe takes the LAST qualifying slot, so ties resolve
  * to the max tie-break — matching q103's window formulation and
  * DuckDB's ASOF JOIN). Key and time/tie-break expressions must
  * evaluate to null-safe hashable keys and Long-valued times. */
case class BroadcastAsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val broadcastRight = right.executeBroadcast[Array[InternalRow]]()
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val (lk, lt) = (leftKey, leftTime)
    val (rk, rt, rb) = (rightKey, rightTime, rightTieBreak)

    left.execute().mapPartitions { leftIter =>
      // Build the per-key sorted index once per task from the broadcast.
      val keyEval = BindReferences.bindReference(rk, rightOut)
      val timeEval = BindReferences.bindReference(rt, rightOut)
      val tieEval = BindReferences.bindReference(rb, rightOut)
      val grouped = new java.util.HashMap[Any,
        scala.collection.mutable.ArrayBuffer[(Long, Long, InternalRow)]]
      broadcastRight.value.foreach { row =>
        val k = keyEval.eval(row)
        val t = timeEval.eval(row)
        if (k != null && t != null) {
          val tie = tieEval.eval(row) match {
            case null => Long.MinValue
            case v: Long => v
            case v: Int => v.toLong
          }
          var buf = grouped.get(k)
          if (buf == null) {
            buf = scala.collection.mutable.ArrayBuffer.empty
            grouped.put(k, buf)
          }
          buf += ((t.asInstanceOf[Long], tie, row))
        }
      }
      val index = new java.util.HashMap[Any, (Array[Long], Array[InternalRow])]
      grouped.forEach { (k, buf) =>
        val sorted = buf.sortBy(e => (e._1, e._2)).toArray
        index.put(k, (sorted.map(_._1), sorted.map(_._3)))
      }

      val lKeyEval = BindReferences.bindReference(lk, leftOut)
      val lTimeEval = BindReferences.bindReference(lt, leftOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.length)
      val project = UnsafeProjection.create(outAttrs, leftOut ++ rightOut)

      leftIter.map { lrow =>
        val k = lKeyEval.eval(lrow)
        val t = lTimeEval.eval(lrow)
        var matched: InternalRow = nullRight
        if (k != null && t != null) {
          val entry = index.get(k)
          if (entry != null) {
            val (times, rows) = entry
            // rightmost slot with times(i) <= t
            var lo = 0; var hi = times.length - 1; var ans = -1
            val tv = t.asInstanceOf[Long]
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (times(mid) <= tv) { ans = mid; lo = mid + 1 }
              else hi = mid - 1
            }
            if (ans >= 0) matched = rows(ans)
          }
        }
        project(joined(lrow, matched))
      }
    }
  }
}

/** Planner strategy mapping the logical as-of node onto its physical
  * operator (injected via SparkSessionExtensions / extraStrategies). */
object GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb) =>
      BroadcastAsOfJoinExec(
        planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

/** User-facing constructor: resolve the named columns against each
  * side's analyzed plan and materialize the custom node. */
object AsOfJoinOps {
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightTieBreak: String): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(", ")}"))
    GraftPlanBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lp, rp, attr(lp, leftKey), attr(rp, rightKey),
        attr(lp, leftTime), attr(rp, rightTime), attr(rp, rightTieBreak)))
  }
}
