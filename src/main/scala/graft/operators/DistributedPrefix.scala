package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix aggregates over a GLOBAL ordering — the
  * scale-safe replacement for `Window.orderBy(...)` with no partition
  * keys, which Spark executes as a single-partition window (one
  * straggler task owns the whole fact table at 100 TB).
  *
  * The standard two-phase prefix sum: range-partition on the sort
  * keys (equal keys co-locate, partitions are globally ordered), run
  * the window WITHIN each partition, then add each partition's
  * broadcast prefix offset — the sum of all earlier partitions'
  * totals. The offset table is one row per partition (tiny), so its
  * own ordered window is bounded, and the result is bit-identical to
  * the single-partition plan for any deterministic ordering.
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

  /** Running `sum(value)` over rows globally ordered by `sortKeys`
    * (ROWS UNBOUNDED PRECEDING..CURRENT ROW), without a
    * single-partition window. `sortKeys` should form a deterministic
    * order for the rows whose prefix values are consumed downstream
    * (ties receive arbitrary relative order, exactly like the
    * single-window plan). Appends `out`; drops nothing else.
    *
    * Durability note: `localCheckpoint()` materializes the
    * range-partitioned input in executor storage and CUTS LINEAGE —
    * one pass feeds both the offset census and the main window, but
    * an executor loss after the checkpoint fails the job instead of
    * recomputing (Spark's documented localCheckpoint trade-off). On a
    * long multi-stage 100 TB job, prefer a reliable
    * `df.checkpoint()` (HDFS-backed) upstream of this helper if
    * executor churn is expected; the helper itself stays agnostic.
    */
  def prefixSum(df: DataFrame, sortKeys: Seq[Column], value: Column,
                out: String, numParts: Int = 0): DataFrame = {
    val parted = df
      .repartitionByRange(resolveParts(df, numParts), sortKeys: _*)
      .withColumn("_pp_id", spark_partition_id())
      .localCheckpoint() // one pass feeds both the offset census and the main window
    val wPid = Window.orderBy(col("_pp_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = parted.groupBy(col("_pp_id"))
      .agg(sum(value).as("_pp_sum"))
      .withColumn("_pp_off",
        coalesce(sum(col("_pp_sum")).over(wPid), lit(0L)))
      .select(col("_pp_id").as("_pp_oid"), col("_pp_off"))
    val wLocal = Window.partitionBy(col("_pp_id"))
      .orderBy(sortKeys: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    parted.withColumn("_pp_local", sum(value).over(wLocal))
      .join(broadcast(offs), col("_pp_id") === col("_pp_oid"))
      .withColumn(out, col("_pp_local") + col("_pp_off"))
      .drop("_pp_id", "_pp_oid", "_pp_local", "_pp_off")
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
    * last row). One range shuffle of the boundary rows; the
    * cross-partition lead patches through the same per-partition
    * offset table (each partition's first t, shifted by one).
    */
  def sweepLine(bounds: DataFrame, t: Column, delta: Column,
                numParts: Int = 0): DataFrame = {
    val parted = bounds
      .repartitionByRange(resolveParts(bounds, numParts), t, delta)
      .withColumn("_pp_id", spark_partition_id())
      .localCheckpoint()
    val wPid = Window.orderBy(col("_pp_id"))
    val offs = parted.groupBy(col("_pp_id"))
      .agg(sum(delta).as("_pp_sum"), min(t).as("_pp_first"))
      .withColumn("_pp_off", coalesce(sum(col("_pp_sum")).over(
        wPid.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // next NON-EMPTY partition's first t (empty pids never appear
      // in the census, so lead skips them for free)
      .withColumn("_pp_nxt", lead(col("_pp_first"), 1).over(wPid))
      .select(col("_pp_id").as("_pp_oid"), col("_pp_off"),
        col("_pp_nxt"))
    val wLocal = Window.partitionBy(col("_pp_id")).orderBy(t, delta)
    parted
      .withColumn("_pp_live", sum(delta).over(
        wLocal.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_pp_lead", lead(t, 1).over(wLocal))
      .join(broadcast(offs), col("_pp_id") === col("_pp_oid"))
      .withColumn("live", col("_pp_live") + col("_pp_off"))
      .withColumn("t_next", coalesce(col("_pp_lead"), col("_pp_nxt")))
      .drop("_pp_id", "_pp_oid", "_pp_live", "_pp_off", "_pp_lead",
        "_pp_nxt")
  }
}
