package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Read-only Apache Iceberg table reader implemented from the PUBLIC
  * Iceberg table spec (iceberg.apache.org/spec/): a table directory
  * holds `metadata/v<N>.metadata.json` (current version named by
  * `metadata/version-hint.text` for Hadoop-catalog tables), each
  * snapshot points at an Avro MANIFEST LIST, each manifest-list row
  * names an Avro MANIFEST, and each manifest row carries a `data_file`
  * struct whose `file_path`/`status` determine the live parquet set.
  *
  * This is the second lakehouse-interop leg next to [[DeltaLogLite]]
  * (reference surface: thirdparty/auron-iceberg/.../
  * IcebergConvertProvider.scala — the reference converts Iceberg scans
  * into its native engine; here the same split of labor is Spark-first):
  *  - SNAPSHOT RESOLUTION (metadata JSON + manifest Avro replay) is
  *    bounded plan-time work — manifests count in the thousands, never
  *    fact-sized, and are read through Spark's bundled Avro source;
  *  - DATA READING is Spark's native vectorized parquet scan over the
  *    resolved file set (Iceberg data files store identity-partition
  *    columns IN the file, unlike Delta, so one schema'd read serves),
  *    keeping pushdown, pruning and whole-stage codegen intact.
  *
  * Lite scope, loud failures (never silent wrong answers):
  *  - format-version must be 1 or 2; v2 row-level DELETES are refused
  *    (a delete-content manifest or data_file.content != 0 throws);
  *  - only primitive column types (boolean/int/long/float/double/
  *    date/timestamp[tz]/string/uuid/decimal) — nested types throw;
  *  - missing metadata, an unknown snapshot id, or a manifest row
  *    without the expected fields throw with the path named.
  */
object IcebergLite {

  final case class Snapshot(snapshotId: Long, schema: StructType,
                            files: Seq[String])

  private implicit val fmts: Formats = DefaultFormats

  private val AvroFmt = "org.apache.spark.sql.avro.AvroFileFormat"

  /** `file:`-scheme URIs and absolute paths pass through; a relative
    * path (some writers store table-relative locations) resolves
    * against the table root. */
  private def resolve(tableDir: String, p: String): String = {
    val noScheme = p.stripPrefix("file://").stripPrefix("file:")
    if (noScheme.startsWith("/")) noScheme else s"$tableDir/$noScheme"
  }

  private def icebergType(t: String, where: String): DataType = t match {
    case "boolean"              => BooleanType
    case "int"                  => IntegerType
    case "long"                 => LongType
    case "float"                => FloatType
    case "double"               => DoubleType
    case "date"                 => DateType
    case "timestamp"            => TimestampNTZType
    case "timestamptz"          => TimestampType
    case "string" | "uuid"      => StringType
    case "binary"               => BinaryType
    case d if d.startsWith("decimal(") =>
      val Array(p, s) = d.stripPrefix("decimal(").stripSuffix(")")
        .split(",").map(_.trim.toInt)
      DecimalType(p, s)
    case other => throw new IllegalStateException(
      s"$where: unsupported Iceberg type '$other' (nested/complex types " +
        "are outside IcebergLite scope)")
  }

  private def parseSchema(fields: JValue, where: String): StructType =
    fields match {
      case JArray(fs) => StructType(fs.map { f =>
        val name = (f \ "name").extract[String]
        val required = (f \ "required").extractOpt[Boolean].getOrElse(false)
        val tpe = (f \ "type") match {
          case JString(t) => icebergType(t, where)
          case _ => throw new IllegalStateException(
            s"$where: field $name has a non-primitive type")
        }
        StructField(name, tpe, nullable = !required)
      })
      case _ =>
        throw new IllegalStateException(s"$where: schema has no fields")
    }

  /** Resolve the table's snapshot: latest metadata version (via
    * version-hint.text, else the highest v<N>.metadata.json), then the
    * current snapshot or `snapshotId`. */
  def snapshot(spark: SparkSession, tableDir: String,
               snapshotId: Option[Long] = None): Snapshot = {
    val metaDir = new Path(tableDir, "metadata")
    val fs = metaDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaDir))
      throw new IllegalStateException(s"$tableDir has no metadata directory")
    val hint = new Path(metaDir, "version-hint.text")
    val metaFile: Path =
      if (fs.exists(hint)) {
        val in = fs.open(hint)
        val v = try scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString.trim finally in.close()
        new Path(metaDir, s"v$v.metadata.json")
      } else {
        val versions = fs.listStatus(metaDir).toSeq.map(_.getPath.getName)
          .collect { case n if n.matches("v\\d+\\.metadata\\.json") =>
            n.stripPrefix("v").stripSuffix(".metadata.json").toLong }
        if (versions.isEmpty) throw new IllegalStateException(
          s"$tableDir: no v<N>.metadata.json in metadata/")
        new Path(metaDir, s"v${versions.max}.metadata.json")
      }
    if (!fs.exists(metaFile))
      throw new IllegalStateException(s"$tableDir: $metaFile missing")
    val in = fs.open(metaFile)
    val meta = try JsonMethods.parse(
      scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()

    val fv = (meta \ "format-version").extract[Int]
    if (fv != 1 && fv != 2) throw new IllegalStateException(
      s"$metaFile: format-version $fv unsupported (IcebergLite reads v1/v2)")
    val schema = (meta \ "schemas") match {
      case JArray(ss) => // v2: pick current-schema-id
        val cur = (meta \ "current-schema-id").extractOpt[Int].getOrElse(0)
        val s = ss.find(s => (s \ "schema-id").extractOpt[Int].contains(cur))
          .getOrElse(throw new IllegalStateException(
            s"$metaFile: current-schema-id $cur not in schemas"))
        parseSchema(s \ "fields", metaFile.toString)
      case _ => parseSchema(meta \ "schema" \ "fields", metaFile.toString)
    }
    val snaps = (meta \ "snapshots") match {
      case JArray(ss) => ss.map { s =>
        (s \ "snapshot-id").extract[Long] ->
          (s \ "manifest-list").extract[String]
      }
      case _ => Nil
    }
    val wantedId = snapshotId.orElse(
      (meta \ "current-snapshot-id").extractOpt[Long].filter(_ != -1L))
      .getOrElse(throw new IllegalStateException(
        s"$metaFile: table has no current snapshot"))
    val manifestList = snaps.toMap.getOrElse(wantedId,
      throw new IllegalArgumentException(
        s"$metaFile: snapshot $wantedId not found " +
          s"(have ${snaps.map(_._1).mkString(", ")})"))

    // manifest list: bounded plan-time read (one row per manifest)
    val mlPath = resolve(tableDir, manifestList)
    val ml = spark.read.format(AvroFmt).load(mlPath)
    if (!ml.columns.contains("manifest_path"))
      throw new IllegalStateException(
        s"$mlPath: manifest list lacks manifest_path")
    val mlRows = ml.collect()
    mlRows.foreach { r =>
      if (ml.columns.contains("content") &&
        r.getAs[Any]("content") != null &&
        r.getAs[Number]("content").intValue() != 0)
        throw new IllegalStateException(
          s"$mlPath: delete manifest present — v2 row-level deletes are " +
            "outside IcebergLite scope")
    }
    val manifests = mlRows.map(_.getAs[String]("manifest_path")).toSeq

    val files = manifests.flatMap { mp =>
      val p = resolve(tableDir, mp)
      val m = spark.read.format(AvroFmt).load(p)
      if (!m.columns.contains("data_file") || !m.columns.contains("status"))
        throw new IllegalStateException(
          s"$p: manifest lacks status/data_file fields")
      m.collect().flatMap { r =>
        val status = r.getAs[Number]("status").intValue()
        val df = r.getAs[org.apache.spark.sql.Row]("data_file")
        if (df.schema.fieldNames.contains("content") &&
          df.getAs[Any]("content") != null &&
          df.getAs[Number]("content").intValue() != 0)
          throw new IllegalStateException(
            s"$p: delete file entry — v2 row-level deletes are outside " +
              "IcebergLite scope")
        // status 2 = DELETED (tombstone retained for one snapshot)
        if (status == 2) None
        else Some(resolve(tableDir, df.getAs[String]("file_path")))
      }
    }
    Snapshot(wantedId, schema, files)
  }

  /** DataFrame over the snapshot's live files — one native parquet
    * scan (Iceberg data files carry identity-partition columns). */
  def read(spark: SparkSession, tableDir: String,
           snapshotId: Option[Long] = None): DataFrame = {
    val snap = snapshot(spark, tableDir, snapshotId)
    if (snap.files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    else spark.read.schema(snap.schema).parquet(snap.files: _*)
  }
}
