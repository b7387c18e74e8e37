package org.apache.spark.sql.graftstream

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.DeltaLogLite

/** Structured-Streaming SOURCE over a Delta-layout table — the
  * streaming face of [[graft.sources.DeltaLogLite]], implemented on
  * Spark's v1 `Source` contract (the same extension point the
  * reference-adjacent open-source Delta connector uses for its own
  * streaming source): offsets are LOG VERSIONS, each micro-batch is
  * the set of files ADDED in a version range, read through the shared
  * native-parquet path.
  *
  * Batch shape:
  *  - the FIRST batch (start = None) is the full snapshot at the
  *    version the stream first observed — checkpoint-aware, so a
  *    vacuumed table streams from its checkpoint exactly like a batch
  *    read;
  *  - every later batch is `addsBetween(start, end]` — incremental
  *    JSON replay only, bounded by commits-per-trigger, never a
  *    re-list of the table;
  *  - `maxVersionsPerTrigger` (option, default unbounded) caps how
  *    many commits one micro-batch absorbs — the Delta streaming
  *    rate-limit knob re-expressed at version grain;
  *  - `startingVersion` (option) starts the stream at a LOG VERSION
  *    instead of the current snapshot: the first batch is the adds of
  *    [startingVersion, latest] — the Delta source's own knob for
  *    resuming a pipeline from a known point without replaying the
  *    whole table.
  *
  * `readChangeFeed=true` switches the source to the CHANGE-DATA-FEED
  * stream (the Delta source's own option name): the schema gains
  * `_change_type` + `_commit_version`, the first batch is the
  * observed snapshot as 'insert' rows (or, with `startingVersion`,
  * the change feed of [startingVersion, latest]), and every later
  * batch is [[DeltaLogLite.readChanges]] over (start, end] — cdc
  * files when the writer materialized them, the synthesized
  * add/remove/DV diff otherwise. The table must carry
  * `delta.enableChangeDataFeed=true` at stream start (checked at
  * source creation, not first batch).
  *
  * Scope, loud failures (never silent wrong answers): APPEND-ONLY
  * streams — a `remove` action, a mid-stream schema change, a
  * protocol/deletion-vector gate, or a vacuumed range commit all
  * throw through [[DeltaLogLite.addsBetween]]'s gates (in CDF mode,
  * removes/DVs are served as change rows; the gates are
  * [[DeltaLogLite.readChanges]]'s own — rewrites and shrinking
  * vectors still refuse). At 100 TB the per-batch work is O(new
  * files): one bounded JSON read per commit plus a native vectorized
  * parquet scan of exactly the new files — pushdown/pruning/codegen
  * intact, no state proportional to table history.
  */
class DeltaStreamLite extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "delta-stream-lite"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "delta-stream-lite: 'path' option is required"))

  private def cdf(parameters: Map[String, String]): Boolean =
    parameters.get("readChangeFeed").exists(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
  : (String, StructType) = {
    val snap = DeltaLogLite.snapshot(
      sqlContext.sparkSession, path(parameters))
    (shortName(),
      if (cdf(parameters)) DeltaStreamSource.cdfSchema(snap.schema)
      else snap.schema)
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source =
    new DeltaStreamSource(sqlContext, path(parameters),
      parameters.get("maxVersionsPerTrigger").map(_.toLong),
      parameters.get("startingVersion").map(_.toLong),
      readChangeFeed = cdf(parameters))
}

object DeltaStreamSource {
  /** The CDF stream schema: data columns + the feed's two metadata
    * columns (the `_commit_timestamp` the full protocol also serves
    * needs commit-file mtimes — outside lite scope, omitted rather
    * than served wrong). */
  def cdfSchema(dataSchema: StructType): StructType =
    StructType(dataSchema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = false)))
}

class DeltaStreamSource(sqlContext: SQLContext, tableDir: String,
                        maxVersionsPerTrigger: Option[Long],
                        startingVersion: Option[Long] = None,
                        readChangeFeed: Boolean = false)
    extends LiteVersionedStreamSource(
      sqlContext.sparkSession, maxVersionsPerTrigger) {

  private val spark = sqlContext.sparkSession
  // pin schema/partition layout at stream start; addsBetween refuses
  // any mid-stream metaData whose schemaString differs
  private val initial = DeltaLogLite.snapshot(spark, tableDir)
  private val schemaJson = initial.schema.json
  if (readChangeFeed &&
    !initial.configuration.get("delta.enableChangeDataFeed")
      .contains("true")) throw new IllegalStateException(
    s"$tableDir: delta.enableChangeDataFeed is not true — cannot " +
      "stream the change feed")

  override def schema: StructType =
    if (readChangeFeed) DeltaStreamSource.cdfSchema(initial.schema)
    else initial.schema

  override protected def latestOffset(): Long =
    DeltaLogLite.latestVersion(spark, tableDir)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = ver(end)
    observe(endV)
    val batch =
      if (readChangeFeed) cdfBatch(start, endV)
      else start match {
        case None if startingVersion.isDefined =>
          // resume-from-version: the adds of [startingVersion, endV] —
          // never a full-table replay
          val adds = DeltaLogLite.addsBetween(spark, tableDir,
            startingVersion.get - 1, endV, schemaJson)
          DeltaLogLite.readFiles(spark, tableDir, initial.schema,
            initial.partitionColumns, adds, initial.physicalNames)
        case None =>
          // initial batch: the full snapshot at endV (checkpoint-aware)
          DeltaLogLite.read(spark, tableDir, versionAsOf = Some(endV))
        case Some(s) =>
          val startV = ver(s)
          val adds = if (startV == endV) Nil
            else DeltaLogLite.addsBetween(
              spark, tableDir, startV, endV, schemaJson)
          DeltaLogLite.readFiles(spark, tableDir, initial.schema,
            initial.partitionColumns, adds, initial.physicalNames)
      }
    asStreamingBatch(batch)
  }

  /** One CDF micro-batch: the protocol's streaming semantics — the
    * first batch without `startingVersion` is the observed snapshot
    * rendered as 'insert' rows at its version (a CDF consumer starts
    * from current state), with `startingVersion` it is the feed of
    * [startingVersion, endV]; every later batch is the feed of
    * (startV, endV]. */
  private def cdfBatch(start: Option[Offset], endV: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    start match {
      case None if startingVersion.isDefined =>
        DeltaLogLite.readChanges(spark, tableDir,
          startingVersion.get, endV)
      case None =>
        DeltaLogLite.read(spark, tableDir, versionAsOf = Some(endV))
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(endV))
      case Some(s) =>
        val startV = ver(s)
        if (startV == endV)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            DeltaStreamSource.cdfSchema(initial.schema))
        else DeltaLogLite.readChanges(spark, tableDir, startV + 1, endV)
    }
  }

  override def toString: String = s"DeltaStreamLite[$tableDir]"
}
