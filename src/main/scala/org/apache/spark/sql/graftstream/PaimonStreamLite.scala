package org.apache.spark.sql.graftstream

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.PaimonLite

/** Structured-Streaming SOURCE over an append-only Paimon table — the
  * third streaming lakehouse leg next to [[DeltaStreamLite]] and
  * [[IcebergStreamLite]]. Paimon is the EASIEST of the three to
  * stream: snapshot ids are contiguous longs (natural offsets) and
  * every snapshot carries its own DELTA manifest list — the exact
  * per-commit change set — so an incremental batch needs no snapshot
  * diffing at all, just the delta replay of each consumed id.
  *
  * Batch shape: first batch = full snapshot at the latest id at
  * stream start; each later batch = the union of `deltaAdds` over its
  * id range; `maxSnapshotsPerTrigger` caps ids per micro-batch.
  *
  * `readChangelog=true` switches the source to the CHANGELOG stream —
  * Paimon's own `scan.mode=latest-full` semantics re-expressed: the
  * schema gains `_row_kind` ('+I'/'-U'/'+U'/'-D') + `_snapshot_id`,
  * the first batch is the observed snapshot's MERGED read rendered as
  * '+I' rows, and every later batch unions
  * [[PaimonLite.readChangelog]] over its id range — the upsert path
  * the append-only mode refuses, served through the format's own
  * materialized change surface (or the full-compaction merge diff).
  *
  * Scope, loud failures: APPEND-ONLY — a DELETE entry in a consumed
  * delta (compaction/overwrite), a mid-stream schema change, or an
  * expired range snapshot fails the query instead of streaming wrong
  * rows.
  */
class PaimonStreamLite extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "paimon-stream-lite"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "paimon-stream-lite: 'path' option is required"))

  private def changelog(parameters: Map[String, String]): Boolean =
    parameters.get("readChangelog").exists(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
  : (String, StructType) = {
    val s =
      PaimonLite.snapshot(sqlContext.sparkSession, path(parameters)).schema
    (shortName(),
      if (changelog(parameters)) PaimonStreamSource.changelogSchema(s)
      else s)
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source =
    new PaimonStreamSource(sqlContext.sparkSession, path(parameters),
      parameters.get("maxSnapshotsPerTrigger").map(_.toLong),
      readChangelog = changelog(parameters))
}

object PaimonStreamSource {
  /** The changelog stream schema: value columns + the row kind and
    * the producing snapshot id. */
  def changelogSchema(dataSchema: StructType): StructType =
    StructType(dataSchema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_row_kind",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("_snapshot_id",
        org.apache.spark.sql.types.LongType, nullable = false)))
}

class PaimonStreamSource(spark: SparkSession, tableDir: String,
                         maxSnapshotsPerTrigger: Option[Long],
                         readChangelog: Boolean = false)
    extends LiteVersionedStreamSource(spark, maxSnapshotsPerTrigger) {

  private val initial = PaimonLite.snapshot(spark, tableDir)
  // batch reads merge PK tables (PaimonLite.read); an APPEND-MODE
  // stream over one would replay delta adds as appends — updates
  // double-counted, deletes resurrected — so refuse loudly here; the
  // CHANGELOG mode serves exactly that shape through the format's own
  // change surface instead
  if (initial.primaryKeys.nonEmpty && !readChangelog)
    throw new IllegalStateException(
      s"$tableDir: primary-key table (keys ${initial.primaryKeys
        .mkString(", ")}) — PaimonStreamLite streams APPEND-ONLY " +
        "tables only (stream the upserts with readChangelog=true)")
  override def schema: StructType =
    if (readChangelog) PaimonStreamSource.changelogSchema(initial.schema)
    else initial.schema

  override protected def latestOffset(): Long =
    PaimonLite.latestSnapshotId(spark, tableDir)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endId = ver(end)
    observe(endId)
    if (readChangelog) return asStreamingBatch(changelogBatch(start, endId))
    // PARTITIONED tables stream like they batch-read: each file
    // carries its decoded _PARTITION values and the shared scan
    // attaches them as typed literal columns per partition group
    val files: Seq[PaimonLite.DataFile] = start match {
      case None =>
        // initial batch: the full snapshot at endId — schema pinned
        val snap = PaimonLite.snapshot(spark, tableDir, Some(endId))
        if (snap.schema.json != initial.schema.json)
          throw new IllegalStateException(
            s"$tableDir: schema changed mid-stream")
        snap.files
      case Some(s) =>
        ((ver(s) + 1) to endId).flatMap(
          PaimonLite.deltaAdds(spark, tableDir, _))
    }
    asStreamingBatch(PaimonLite.scanAppendFiles(spark, tableDir,
      initial.schema, initial.partitionKeys, initial.defaultPartName,
      files))
  }

  /** One changelog micro-batch: the first batch is the observed
    * snapshot's merged read as '+I' (latest-full's initial scan);
    * later batches union the changelog of each id in (start, end]. */
  private def changelogBatch(start: Option[Offset],
                             endId: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    start match {
      case None =>
        val snap = PaimonLite.snapshot(spark, tableDir, Some(endId))
        if (snap.schema.json != initial.schema.json)
          throw new IllegalStateException(
            s"$tableDir: schema changed mid-stream")
        PaimonLite.read(spark, tableDir, snapshotId = Some(endId))
          .withColumn("_row_kind", lit("+I"))
          .withColumn("_snapshot_id", lit(endId))
      case Some(s) =>
        val startId = ver(s)
        if (startId == endId)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            PaimonStreamSource.changelogSchema(initial.schema))
        else ((startId + 1) to endId).map(sid =>
          PaimonLite.readChangelog(spark, tableDir, sid)
            .withColumn("_snapshot_id", lit(sid)))
          .reduce(_ unionAll _)
    }
  }

  override def toString: String = s"PaimonStreamLite[$tableDir]"
}
