package org.apache.spark.sql.graftstream

import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.IcebergLite

/** Structured-Streaming SOURCE over an Iceberg table — the streaming
  * face of [[graft.sources.IcebergLite]], same v1 `Source` contract as
  * [[DeltaStreamLite]]. Offsets are POSITIONS in the table metadata's
  * `snapshots` list (append-only history: new snapshots append at the
  * end, so the position is monotonic where snapshot IDs are not).
  *
  * Batch shape:
  *  - the FIRST batch is the full file set of the latest snapshot at
  *    stream start;
  *  - each later batch is the SET DIFFERENCE
  *    `files(snapshot[i]) \ files(snapshot[i-1])` — bounded
  *    manifest-replay metadata work, then one native parquet scan of
  *    exactly the new files;
  *  - `maxSnapshotsPerTrigger` caps snapshots per micro-batch.
  *
  * Scope, loud failures (never silent wrong answers): APPEND-ONLY
  * streams. A snapshot that DROPS a file visible in its predecessor
  * (overwrite/rewrite/delete), carries positional-delete files, or
  * rewrites the already-streamed history (a consumed position's
  * snapshot id changed — expired/compacted history) fails the query.
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
      parameters.get("maxSnapshotsPerTrigger").map(_.toLong))
}

class IcebergStreamSource(spark: SparkSession, tableDir: String,
                          maxSnapshotsPerTrigger: Option[Long])
    extends LiteVersionedStreamSource(spark, maxSnapshotsPerTrigger) {

  private val initialSchema: StructType =
    IcebergLite.snapshot(spark, tableDir).schema

  override def schema: StructType = initialSchema

  /** Ordered snapshot-id history from the CURRENT metadata file. */
  private def history(): Seq[Long] =
    IcebergLite.snapshotIds(spark, tableDir)

  override protected def latestOffset(): Long = history().length - 1L

  /** Snapshot at history POSITION `pos`, with append-only gates. */
  private def filesAt(hist: Seq[Long], pos: Long): Set[String] = {
    if (pos < 0 || pos >= hist.length) throw new IllegalStateException(
      s"$tableDir: streamed snapshot position $pos is outside the " +
        s"current history (${hist.length} snapshots) — expired or " +
        "rewritten table history breaks the stream")
    val snap = IcebergLite.snapshot(spark, tableDir, Some(hist(pos.toInt)))
    if (snap.deleteFiles.nonEmpty) throw new IllegalStateException(
      s"$tableDir: snapshot ${hist(pos.toInt)} carries positional " +
        "delete files — streaming reads are append-only scope")
    if (snap.schema.json != initialSchema.json)
      throw new IllegalStateException(
        s"$tableDir: schema changed mid-stream — evolution is outside " +
          "IcebergStreamLite scope")
    snap.files.toSet
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endPos = ver(end)
    observe(endPos)
    val hist = history()
    val endFiles = filesAt(hist, endPos)
    val newFiles = start match {
      case None => endFiles // initial batch: full snapshot
      case Some(s) =>
        val startFiles = filesAt(hist, ver(s))
        val dropped = startFiles -- endFiles
        if (dropped.nonEmpty) throw new IllegalStateException(
          s"$tableDir: snapshot range (${ver(s)}, $endPos] DROPS files " +
            s"(${dropped.take(3).mkString(", ")}…) — overwrite/delete " +
            "mid-stream is outside append-only streaming scope")
        endFiles -- startFiles
    }
    val batch =
      if (newFiles.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], initialSchema)
      else spark.read.schema(initialSchema)
        .parquet(newFiles.toSeq.sorted: _*)
    asStreamingBatch(batch)
  }

  override def toString: String = s"IcebergStreamLite[$tableDir]"
}
