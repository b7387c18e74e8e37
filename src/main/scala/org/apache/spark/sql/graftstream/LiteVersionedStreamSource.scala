package org.apache.spark.sql.graftstream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}

/** Shared machinery for the three lakehouse streaming sources
  * ([[DeltaStreamSource]], [[IcebergStreamSource]],
  * [[PaimonStreamSource]]): a monotonically-advancing Long offset
  * (log version / snapshot position / snapshot id) with an optional
  * per-trigger cap, offset deserialization after a checkpoint restart
  * (the engine hands back [[SerializedOffset]]), and the v1-source
  * convention of rebasing each batch's plan onto a STREAMING
  * LogicalRDD (the engine asserts isStreaming on the returned frame).
  */
abstract class LiteVersionedStreamSource(
    spark: SparkSession, maxPerTrigger: Option[Long]) extends Source {

  /** Highest consumable offset right now (one bounded metadata probe —
    * a directory listing or hint read, never a data scan). */
  protected def latestOffset(): Long

  private var lastPolled: Long = -1L

  protected final def ver(o: Offset): Long = o match {
    case l: LongOffset       => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => throw new IllegalStateException(
      s"$this: unexpected offset $other")
  }

  /** Rate-limited poll: advance at most `maxPerTrigger` steps past the
    * last polled offset; the FIRST poll is never capped — the initial
    * snapshot is one indivisible batch regardless of how many commits
    * it spans. Monotonic even if the table's latest regresses. */
  override def getOffset: Option[Offset] = {
    val latest = latestOffset()
    val capped = maxPerTrigger match {
      case Some(k) if lastPolled >= 0 => math.min(latest, lastPolled + k)
      case _ => latest
    }
    val next = math.max(capped, lastPolled)
    lastPolled = math.max(lastPolled, next)
    if (next < 0) None else Some(LongOffset(next))
  }

  /** Record an engine-chosen end offset (replayed getBatch after a
    * restart can be ahead of anything this instance polled). */
  protected final def observe(endOffset: Long): Unit =
    lastPolled = math.max(lastPolled, endOffset)

  /** Rebase a batch DataFrame onto a streaming LogicalRDD. */
  protected final def asStreamingBatch(batch: DataFrame): DataFrame = {
    val ds = batch.asInstanceOf[classic.Dataset[Row]]
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession],
      LogicalRDD.fromDataset(ds.queryExecution.toRdd, ds,
        isStreaming = true))
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
