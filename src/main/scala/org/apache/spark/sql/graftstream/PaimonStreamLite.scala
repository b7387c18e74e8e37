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

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
  : (String, StructType) =
    (shortName(),
      PaimonLite.snapshot(sqlContext.sparkSession, path(parameters)).schema)

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source =
    new PaimonStreamSource(sqlContext.sparkSession, path(parameters),
      parameters.get("maxSnapshotsPerTrigger").map(_.toLong))
}

class PaimonStreamSource(spark: SparkSession, tableDir: String,
                         maxSnapshotsPerTrigger: Option[Long])
    extends LiteVersionedStreamSource(spark, maxSnapshotsPerTrigger) {

  private val initial = PaimonLite.snapshot(spark, tableDir)
  // batch reads merge PK tables (PaimonLite.read); a STREAM over one
  // would replay delta adds as appends — updates double-counted,
  // deletes resurrected — so refuse loudly here
  if (initial.primaryKeys.nonEmpty) throw new IllegalStateException(
    s"$tableDir: primary-key table (keys ${initial.primaryKeys
      .mkString(", ")}) — PaimonStreamLite streams APPEND-ONLY tables " +
      "only (upsert changelogs are outside lite streaming scope)")
  override def schema: StructType = initial.schema

  override protected def latestOffset(): Long =
    PaimonLite.latestSnapshotId(spark, tableDir)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endId = ver(end)
    observe(endId)
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

  override def toString: String = s"PaimonStreamLite[$tableDir]"
}
