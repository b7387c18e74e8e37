package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.plans.PartitionSweepPlan

/** Distributed prefix aggregates over a GLOBAL ordering — the
  * scale-safe replacement for `Window.orderBy(...)` with no partition
  * keys, which Spark executes as a single-partition window (one
  * straggler task owns the whole fact table at 100 TB).
  *
  * The standard two-phase prefix sum, executed by the native
  * [[graft.plans.PartitionSweepExec]] operator: range-partition on the
  * sort keys (equal keys co-locate, partitions are globally ordered),
  * sort within partitions, then the operator finishes the prefix
  * in-place — a bounded census job (one tuple per partition, the grain
  * of Spark's own range-sampling job) seeds each partition's running
  * sum with the exclusive prefix of earlier partitions' totals. The
  * result is bit-identical to the single-partition plan for any
  * deterministic ordering.
  *
  * Exactly ONE full-data exchange: the operator reports its child's
  * partitioning and ordering, so EnsureRequirements inserts nothing
  * above the range shuffle (the earlier window-based formulation paid
  * a second full `hashpartitioning` exchange over a lineage-cutting
  * `localCheckpoint()` — both are gone; lineage stays intact, so an
  * executor loss recomputes instead of failing the job).
  *
  * Reference behaviour: the reference engine executes unpartitioned
  * windows the same single-stream way (NativeWindowBase has no
  * partition-parallel global window either); this helper is the
  * Spark-native scale path layered on the same semantics.
  */
object DistributedPrefix {

  /** numParts <= 0 (the default) resolves to the session's
    * `spark.sql.shuffle.partitions`, so the range shuffle scales with
    * the cluster instead of pinning 100 TB onto 32 tasks. */
  private def resolveParts(df: DataFrame, numParts: Int): Int =
    if (numParts > 0) numParts
    else df.sparkSession.sessionState.conf.numShufflePartitions

  /** `sum(...)` result type for the value column — integrals widen to
    * long, fractionals to double, matching the window-sum the helper
    * replaces. Decimals are refused loudly (the running sum is
    * accumulated natively in the operator; pre-cast to DOUBLE or
    * BIGINT to opt in to that arithmetic explicitly). */
  private def sumType(dt: DataType): DataType = dt match {
    case ByteType | ShortType | IntegerType | LongType => LongType
    case FloatType | DoubleType                        => DoubleType
    case other => throw new IllegalArgumentException(
      s"DistributedPrefix: unsupported value type ${other.simpleString} — " +
        "cast the value to BIGINT or DOUBLE first")
  }

  /** Running `sum(value)` over rows globally ordered by `sortKeys`
    * (ROWS UNBOUNDED PRECEDING..CURRENT ROW), without a
    * single-partition window. `sortKeys` should form a deterministic
    * order for the rows whose prefix values are consumed downstream
    * (ties receive arbitrary relative order, exactly like the
    * single-window plan). Appends `out`; drops nothing else. */
  def prefixSum(df: DataFrame, sortKeys: Seq[Column], value: Column,
                out: String, numParts: Int = 0): DataFrame = {
    graft.GraftExtensions.register(df.sparkSession)
    val vT = sumType(df.select(value).schema.head.dataType)
    val sorted = df
      .withColumn("_pp_v", value.cast(vT))
      .repartitionByRange(resolveParts(df, numParts), sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
    val lp = sorted.queryExecution.analyzed
    val vAttr = lp.output.find(_.name == "_pp_v").get
      .asInstanceOf[AttributeReference]
    val liveAttr = AttributeReference(out, vT, nullable = true)()
    GraftPlanBridge.ofRows(df.sparkSession,
        PartitionSweepPlan(vAttr, None, liveAttr, None, lp))
      .drop("_pp_v")
  }

  /** Global `row_number()` under `sortKeys` — a prefix count of 1s.
    * Requires `sortKeys` to be a TOTAL order (unique tiebreak), else
    * tied rows get arbitrary ranks, same as row_number itself. */
  def globalRank(df: DataFrame, sortKeys: Seq[Column],
                 out: String, numParts: Int = 0): DataFrame =
    prefixSum(df, sortKeys, lit(1L), out, numParts)

  /** Sweep line over boundary events `(t, delta)`: appends `live`
    * (the running sum of delta in (t, delta) order — ends sort before
    * starts at the same instant for delta -1/+1) and `t_next` (the
    * next boundary's t, crossing partition edges; null on the global
    * last row). One range shuffle of the boundary rows; the operator's
    * census carries each partition's first instant, so the
    * cross-partition lead patches through the same bounded metadata.
    * `t` must be long-backed (BIGINT/INT — cast timestamps first). */
  def sweepLine(bounds: DataFrame, t: Column, delta: Column,
                numParts: Int = 0): DataFrame = {
    graft.GraftExtensions.register(bounds.sparkSession)
    val dT = sumType(bounds.select(delta).schema.head.dataType)
    require(dT == LongType,
      "DistributedPrefix.sweepLine: delta must be integral")
    val tT = bounds.select(t).schema.head.dataType
    require(tT == LongType || tT == IntegerType,
      s"DistributedPrefix.sweepLine: t must be BIGINT or INT, got " +
        tT.simpleString)
    val sorted = bounds
      .withColumn("_pp_v", delta.cast(LongType))
      .withColumn("_pp_t", t)
      .repartitionByRange(resolveParts(bounds, numParts), t, delta)
      .sortWithinPartitions(t, delta)
    val lp = sorted.queryExecution.analyzed
    def attr(n: String) = lp.output.find(_.name == n).get
      .asInstanceOf[AttributeReference]
    val liveAttr = AttributeReference("live", LongType, nullable = true)()
    val tNextAttr = AttributeReference("t_next", tT, nullable = true)()
    GraftPlanBridge.ofRows(bounds.sparkSession,
        PartitionSweepPlan(attr("_pp_v"), Some(attr("_pp_t")),
          liveAttr, Some(tNextAttr), lp))
      .drop("_pp_v", "_pp_t")
  }
}
