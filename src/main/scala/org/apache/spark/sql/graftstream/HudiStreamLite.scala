package org.apache.spark.sql.graftstream

import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.HudiCowLite

/** Structured-Streaming SOURCE over a Hudi COPY_ON_WRITE table — the
  * streaming face of [[graft.sources.HudiCowLite]], completing the
  * four-format streaming matrix next to [[DeltaStreamLite]],
  * [[IcebergStreamLite]] and [[PaimonStreamLite]]. Offsets are COMMIT
  * INSTANTS (Hudi instants are numeric timestamps, so they carry as
  * Long offsets directly), located in the timeline BY VALUE — an
  * instant that left the timeline (archived/cleaned) is a loud
  * failure, never a silent skip.
  *
  * Batch shape (the Iceberg-leg pattern):
  *  - the FIRST batch is the full base-file set at the latest instant
  *    when the stream starts;
  *  - each later batch is the SET DIFFERENCE
  *    `files(end) \ files(start)` — the start set comes from an
  *    in-instance cache in steady state, so each batch replays the
  *    bounded commit timeline once and scans exactly the new files;
  *  - `maxCommitsPerTrigger` caps commits per micro-batch.
  *
  * Scope, loud failures (never silent wrong answers): APPEND-ONLY
  * COW streams. An UPDATE (a commit rewriting an existing file
  * group's base file), clustering, or cleaning DROPS a file visible
  * at the batch's start instant and fails the dropped-files gate;
  * MERGE_ON_READ and deltacommits refuse through
  * [[HudiCowLite.snapshot]]'s own gates; a batch whose parquet
  * footers drift from the stream's pinned schema refuses (Hudi's lite
  * layout has no schema store to pin from, so the pin comes from the
  * initial snapshot's footers and every batch is checked against it).
  */
class HudiStreamLite extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "hudi-stream-lite"

  private def path(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "hudi-stream-lite: 'path' option is required"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
  : (String, StructType) = {
    val spark = sqlContext.sparkSession
    val snap = HudiCowLite.snapshot(spark, path(parameters))
    (shortName(), graft.sources.ColumnarScan(
      spark, path(parameters), None, snap.files).schema)
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source =
    new HudiStreamSource(sqlContext.sparkSession, path(parameters),
      parameters.get("maxCommitsPerTrigger").map(_.toLong))
}

class HudiStreamSource(spark: SparkSession, tableDir: String,
                       maxCommitsPerTrigger: Option[Long])
    extends LiteVersionedStreamSource(spark, maxCommitsPerTrigger) {

  // pin the schema from the initial snapshot's footers (one bounded
  // footer read per base file); every batch checks against it
  private val initialSchema: StructType = {
    val snap = HudiCowLite.snapshot(spark, tableDir)
    graft.sources.ColumnarScan(spark, tableDir, None, snap.files).schema
  }

  override def schema: StructType = initialSchema

  /** Instants parse as Longs so they carry as stream offsets; a
    * non-numeric-Long instant (outside Hudi's yyyyMMddHHmmssSSS
    * convention AND Long range) refuses loudly. */
  private def asLong(instant: String): Long =
    try instant.toLong
    catch { case _: NumberFormatException =>
      throw new IllegalStateException(
        s"$tableDir: instant $instant does not fit a Long offset — " +
          "outside HudiStreamLite scope")
    }

  private def history(): Seq[Long] =
    HudiCowLite.completedCommits(spark, tableDir).map(asLong)

  override protected def latestOffset(): Long =
    history().lastOption.getOrElse(-1L)

  /** OFFSETS ARE INSTANTS, located in the timeline BY VALUE — a
    * position-based offset silently shifts when archiving trims the
    * timeline's front; an instant that left the timeline is a LOUD
    * failure instead. */
  private var lastInstant: Long = -1L

  override def getOffset: Option[Offset] = {
    val hist = history()
    if (hist.isEmpty) return None
    val next: Long =
      if (lastInstant < 0) hist.last // initial snapshot: indivisible
      else {
        val pos = hist.indexOf(lastInstant)
        if (pos < 0) throw new IllegalStateException(
          s"$tableDir: the stream's instant $lastInstant left the " +
            "timeline (archived/cleaned) — cannot locate the next batch")
        maxCommitsPerTrigger match {
          case Some(k) => hist(math.min(hist.length - 1, pos + k.toInt))
          case None => hist.last
        }
      }
    lastInstant = next
    Some(org.apache.spark.sql.execution.streaming.runtime.LongOffset(next))
  }

  /** Cache of the last computed instant file set — steady state does
    * ONE timeline replay per batch instead of replaying both ends. */
  private var cachedFiles: Option[(Long, Set[String])] = None

  private def filesOf(instant: Long): Set[String] =
    cachedFiles.filter(_._1 == instant).map(_._2).getOrElse(
      HudiCowLite.snapshot(spark, tableDir,
        Some(instant.toString)).files.toSet)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endI = ver(end)
    lastInstant = math.max(lastInstant, endI)
    val endFiles = filesOf(endI)
    val newFiles = start match {
      case None => endFiles // initial batch: full snapshot
      case Some(s) =>
        val startFiles = filesOf(ver(s))
        val dropped = startFiles -- endFiles
        if (dropped.nonEmpty) throw new IllegalStateException(
          s"$tableDir: instant range (${ver(s)}, $endI] DROPS files " +
            s"(${dropped.take(3).mkString(", ")}…) — an update/" +
            "clustering/clean mid-stream is outside append-only " +
            "streaming scope")
        endFiles -- startFiles
    }
    cachedFiles = Some(endI -> endFiles)
    val batch =
      if (newFiles.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], initialSchema)
      else {
        val got = graft.sources.ColumnarScan(
          spark, tableDir, None, newFiles.toSeq.sorted)
        if (got.schema.map(f => (f.name, f.dataType)) !=
          initialSchema.map(f => (f.name, f.dataType)))
          throw new IllegalStateException(
            s"$tableDir: batch schema ${got.schema.simpleString} drifts " +
              s"from the stream's pinned ${initialSchema.simpleString} — " +
              "schema evolution is outside HudiStreamLite scope")
        got
      }
    asStreamingBatch(batch)
  }

  override def toString: String = s"HudiStreamLite[$tableDir]"
}
