package org.apache.spark.sql.graftstream

import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.IcebergLite

/** Structured-Streaming SOURCE over an Iceberg table — the streaming
  * face of [[graft.sources.IcebergLite]], same v1 `Source` contract as
  * [[DeltaStreamLite]]. Offsets are SNAPSHOT IDS, located in the
  * metadata's `snapshots` list BY VALUE: a position-based offset
  * would silently shift when snapshot expiration trims the history's
  * front (skipping committed data); an id that has left the history
  * is a loud failure instead — including after a checkpoint restart.
  *
  * Batch shape:
  *  - the FIRST batch is the full file set of the latest snapshot at
  *    stream start;
  *  - each later batch is the SET DIFFERENCE
  *    `files(end snapshot) \ files(start snapshot)` — the start set
  *    comes from an in-instance cache in steady state, so each batch
  *    replays ONE snapshot's manifests, then runs one native parquet
  *    scan of exactly the new files;
  *  - `maxSnapshotsPerTrigger` caps snapshots per micro-batch.
  *
  * Scope, loud failures (never silent wrong answers): APPEND-ONLY
  * streams. A snapshot that DROPS a file visible in its predecessor
  * (overwrite/rewrite/delete), carries positional-delete files, or an
  * offset id expired out of the history fails the query.
  *
  * `skipOverwriteSnapshots=true` (the library's
  * streaming-skip-overwrite-snapshots) walks the range snapshot by
  * snapshot and SKIPS those whose `summary.operation` is `replace` —
  * a compaction's packed files re-list rows the stream already
  * served, so emitting them would duplicate and refusing would wedge;
  * appends before and after the replace still emit exactly once. A
  * snapshot that drops files WITHOUT declaring itself a replace still
  * refuses.
  */
class IcebergStreamLite extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "iceberg-stream-lite"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "iceberg-stream-lite: 'path' option is required"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
  : (String, StructType) =
    (shortName(),
      IcebergLite.snapshot(sqlContext.sparkSession, path(parameters)).schema)

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source =
    new IcebergStreamSource(sqlContext.sparkSession, path(parameters),
      parameters.get("maxSnapshotsPerTrigger").map(_.toLong),
      parameters.get("skipOverwriteSnapshots").exists(_.toBoolean))
}

class IcebergStreamSource(spark: SparkSession, tableDir: String,
                          maxSnapshotsPerTrigger: Option[Long],
                          skipOverwriteSnapshots: Boolean = false)
    extends LiteVersionedStreamSource(spark, maxSnapshotsPerTrigger) {

  private val initialSchema: StructType =
    IcebergLite.snapshot(spark, tableDir).schema

  override def schema: StructType = initialSchema

  /** Ordered snapshot-id history from the CURRENT metadata file. */
  private def history(): Seq[Long] =
    IcebergLite.snapshotIds(spark, tableDir)

  override protected def latestOffset(): Long =
    history().lastOption.getOrElse(-1L)

  /** OFFSETS ARE SNAPSHOT IDS, located in the history BY VALUE — a
    * position-based offset silently shifts when snapshot expiration
    * trims the history's front (committed data would be skipped); an
    * id that has left the history is a LOUD failure instead. */
  private var lastId: Long = -1L

  override def getOffset: Option[Offset] = {
    val hist = history()
    if (hist.isEmpty) return None
    val next: Long =
      if (lastId < 0) hist.last // initial snapshot: one indivisible batch
      else {
        val pos = hist.indexOf(lastId)
        if (pos < 0) throw new IllegalStateException(
          s"$tableDir: the stream's snapshot $lastId left the table " +
            "history (expired/rewritten) — cannot locate the next batch")
        maxSnapshotsPerTrigger match {
          case Some(k) =>
            hist(math.min(hist.length - 1, pos + k.toInt))
          case None => hist.last
        }
      }
    lastId = next
    Some(org.apache.spark.sql.execution.streaming.runtime.LongOffset(next))
  }

  /** Cache of the last computed snapshot file set — steady state does
    * ONE snapshot replay per batch instead of replaying both ends. */
  private var cachedFiles: Option[(Long, Set[String])] = None

  /** Snapshot `id`'s file set, with the append-only gates. */
  private def filesOf(id: Long): Set[String] = {
    cachedFiles.filter(_._1 == id).map(_._2).getOrElse {
      val snap = IcebergLite.snapshot(spark, tableDir, Some(id))
      if (snap.deleteFiles.nonEmpty || snap.eqDeletes.nonEmpty ||
        snap.dvs.nonEmpty) throw new IllegalStateException(
        s"$tableDir: snapshot $id carries delete files — " +
          "streaming reads are append-only scope")
      if (snap.schema.json != initialSchema.json)
        throw new IllegalStateException(
          s"$tableDir: schema changed mid-stream — evolution is outside " +
            "IcebergStreamLite scope")
      snap.files.toSet
    }
  }

  /** Per-snapshot walk of (startId, endId]: replace-operation
    * snapshots contribute NOTHING (their packed files re-list
    * already-served rows); every other snapshot must be a pure append
    * over its immediate predecessor and contributes its additions.
    * O(snapshots-in-range) bounded manifest replays. */
  private def walkSkippingReplaces(startId: Long,
                                   endId: Long): Set[String] = {
    val hist = history()
    val from = hist.indexOf(startId)
    val to = hist.indexOf(endId)
    if (from < 0 || to < 0) throw new IllegalStateException(
      s"$tableDir: snapshot $startId or $endId left the table " +
        "history (expired/rewritten) — cannot walk the range")
    val ops = IcebergLite.snapshotOperations(spark, tableDir)
    var prevFiles = filesOf(startId)
    var emit = Set.empty[String]
    for (sid <- hist.slice(from + 1, to + 1)) {
      val cur = filesOf(sid)
      if (ops.get(sid).flatten.contains("replace")) {
        // a compaction: nothing to emit, the packed state becomes
        // the new baseline
      } else {
        val dropped = prevFiles -- cur
        if (dropped.nonEmpty) throw new IllegalStateException(
          s"$tableDir: snapshot $sid DROPS files " +
            s"(${dropped.take(3).mkString(", ")}…) without declaring " +
            "operation=replace — overwrite/delete mid-stream is " +
            "outside append-only streaming scope")
        emit ++= cur -- prevFiles
      }
      prevFiles = cur
    }
    emit
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endId = ver(end)
    lastId = endId
    val endFiles = filesOf(endId)
    val newFiles = start match {
      case None => endFiles // initial batch: full snapshot
      case Some(s) if skipOverwriteSnapshots =>
        walkSkippingReplaces(ver(s), endId)
      case Some(s) =>
        val startFiles = filesOf(ver(s))
        val dropped = startFiles -- endFiles
        if (dropped.nonEmpty) throw new IllegalStateException(
          s"$tableDir: snapshot range (${ver(s)}, $endId] DROPS files " +
            s"(${dropped.take(3).mkString(", ")}…) — overwrite/delete " +
            "mid-stream is outside append-only streaming scope")
        endFiles -- startFiles
    }
    cachedFiles = Some(endId -> endFiles)
    val batch =
      if (newFiles.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], initialSchema)
      else {
        // schema carries parquet.field.id metadata: match by field id
        IcebergLite.enableFieldIdRead(spark)
        spark.read.schema(initialSchema)
          .parquet(newFiles.toSeq.sorted: _*)
      }
    asStreamingBatch(batch)
  }

  override def toString: String = s"IcebergStreamLite[$tableDir]"
}
