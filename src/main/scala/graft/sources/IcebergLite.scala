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
  * v2 POSITIONAL deletes (content=1) are READ: delete parquets carry
  * (file_path, pos) rows naming dead ordinals in specific data files;
  * the reader attaches `_metadata.file_path`/`_metadata.row_index` to
  * the data scan and LEFT ANTI-joins the delete set — Spark
  * auto-broadcasts a small delete side from parquet size statistics
  * and falls back to a shuffled join for a huge one, so the plan holds
  * at 100 TB. A positional delete row only ever names one immutable
  * data file (Iceberg file names are unique), so applying every delete
  * file in the snapshot is exact without sequence-number bookkeeping.
  *
  * Lite scope, loud failures (never silent wrong answers):
  *  - format-version must be 1 or 2; v2 EQUALITY deletes (content=2)
  *    are refused;
  *  - only primitive column types (boolean/int/long/float/double/
  *    date/timestamp[tz]/string/uuid/decimal) — nested types throw;
  *  - non-file:// filesystem schemes are refused in path resolution;
  *  - missing metadata, an unknown snapshot id, or a manifest row
  *    without the expected fields throw with the path named.
  */
object IcebergLite {

  final case class Snapshot(snapshotId: Long, schema: StructType,
                            files: Seq[String],
                            deleteFiles: Seq[String] = Nil)

  private implicit val fmts: Formats = DefaultFormats

  private val AvroFmt = "org.apache.spark.sql.avro.AvroFileFormat"

  /** `file:`-scheme URIs and absolute paths pass through; a relative
    * path (some writers store table-relative locations) resolves
    * against the table root. Any OTHER scheme (s3://, hdfs://, …) is
    * refused loudly — concatenating it under tableDir would produce a
    * nonsense path and an unrelated error downstream. */
  private def resolve(tableDir: String, p: String): String = {
    val scheme = "^([A-Za-z][A-Za-z0-9+.-]*)://".r.findFirstMatchIn(p)
      .map(_.group(1))
    scheme.filter(_ != "file").foreach { s =>
      throw new IllegalStateException(
        s"IcebergLite: unsupported filesystem scheme '$s://' in '$p' — " +
          "only file:// and table-relative paths are in scope")
    }
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

  /** Current metadata file: latest version via version-hint.text, else
    * the highest v<N>.metadata.json. Returns (path, parsed JSON). */
  private def loadMeta(spark: SparkSession,
                       tableDir: String): (Path, JValue) = {
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
    (metaFile, meta)
  }

  /** Snapshot ids in METADATA-LIST ORDER (append-only history appends
    * at the end) — the ordered offset surface for streaming reads. */
  def snapshotIds(spark: SparkSession, tableDir: String): Seq[Long] =
    (loadMeta(spark, tableDir)._2 \ "snapshots") match {
      case JArray(ss) => ss.map(s => (s \ "snapshot-id").extract[Long])
      case _ => Nil
    }

  /** Resolve the table's snapshot: latest metadata version (via
    * version-hint.text, else the highest v<N>.metadata.json), then the
    * current snapshot or `snapshotId`. */
  def snapshot(spark: SparkSession, tableDir: String,
               snapshotId: Option[Long] = None): Snapshot = {
    val (metaFile, meta) = loadMeta(spark, tableDir)

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
    // manifest-list content: 0 = data manifest, 1 = delete manifest
    val (dataManifests, deleteManifests) = mlRows.partition { r =>
      !ml.columns.contains("content") || r.getAs[Any]("content") == null ||
        r.getAs[Number]("content").intValue() == 0
    }

    def replay(manifestPaths: Seq[String],
               wantContent: Int, what: String): Seq[String] =
      manifestPaths.flatMap { mp =>
        val p = resolve(tableDir, mp)
        val m = spark.read.format(AvroFmt).load(p)
        if (!m.columns.contains("data_file") || !m.columns.contains("status"))
          throw new IllegalStateException(
            s"$p: manifest lacks status/data_file fields")
        m.collect().flatMap { r =>
          val status = r.getAs[Number]("status").intValue()
          val df = r.getAs[org.apache.spark.sql.Row]("data_file")
          val content =
            if (df.schema.fieldNames.contains("content") &&
              df.getAs[Any]("content") != null)
              df.getAs[Number]("content").intValue()
            else 0
          if (content == 2) throw new IllegalStateException(
            s"$p: equality delete file (content=2) — outside IcebergLite " +
              "scope (positional deletes are supported)")
          if (content != wantContent) throw new IllegalStateException(
            s"$p: $what manifest entry has content=$content " +
              s"(expected $wantContent)")
          // status 2 = DELETED (tombstone retained for one snapshot)
          if (status == 2) None
          else Some(resolve(tableDir, df.getAs[String]("file_path")))
        }
      }

    val files = replay(
      dataManifests.map(_.getAs[String]("manifest_path")).toSeq, 0, "data")
    val deletes = replay(
      deleteManifests.map(_.getAs[String]("manifest_path")).toSeq,
      1, "delete")
    Snapshot(wantedId, schema, files, deletes)
  }

  /** Canonicalize a path for the positional-delete anti-join: both the
    * delete rows' `file_path` column and Spark's `_metadata.file_path`
    * must land on the same spelling regardless of file:-scheme form. */
  private def normPathCol(tableDir: String,
                          c: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.functions._
    val abs = regexp_replace(c, "^file:/+", "/")
    when(abs.startsWith("/"), abs)
      .otherwise(concat(lit(s"$tableDir/"), abs))
  }

  /** DataFrame over the snapshot's live files — one native parquet
    * scan (Iceberg data files carry identity-partition columns), with
    * positional deletes applied as a LEFT ANTI join on
    * (file_path, row ordinal). */
  def read(spark: SparkSession, tableDir: String,
           snapshotId: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val snap = snapshot(spark, tableDir, snapshotId)
    if (snap.files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], snap.schema)
    else {
      // Columns resolve BY NAME here; the Iceberg spec resolves by
      // field-id, so a renamed column's physical parquet name would
      // silently read as null. Check EVERY file's footer (a rename
      // mid-history leaves a mix of old- and new-named files, and
      // which file a single spot-check lands on is listing-order
      // luck) — one bounded footer read per file, the same O(files)
      // plan-time grain as the manifest replay above.
      for (f <- snap.files) {
        val footer = spark.read.parquet(f).schema.fieldNames.toSet
        val missing = snap.schema.fieldNames.filterNot(footer.contains)
        if (missing.nonEmpty) throw new IllegalStateException(
          s"IcebergLite: $f lacks columns ${missing.mkString(", ")} — " +
            "the table likely renamed columns (field-id resolution is " +
            "outside IcebergLite scope)")
      }
      val data = spark.read.schema(snap.schema).parquet(snap.files: _*)
      if (snap.deleteFiles.isEmpty) data
      else {
        val dels = spark.read.parquet(snap.deleteFiles: _*)
        if (!dels.columns.contains("file_path") ||
          !dels.columns.contains("pos"))
          throw new IllegalStateException(
            s"IcebergLite: positional delete files " +
              s"${snap.deleteFiles.mkString(", ")} lack the spec's " +
              "file_path/pos columns")
        val delSet = dels.select(
          normPathCol(tableDir, col("file_path")).as("_del_path"),
          col("pos").cast("long").as("_del_pos"))
        data
          .withColumn("_ice_path",
            normPathCol(tableDir, col("_metadata.file_path")))
          .withColumn("_ice_pos", col("_metadata.row_index"))
          .join(delSet, col("_ice_path") === col("_del_path") &&
            col("_ice_pos") === col("_del_pos"), "left_anti")
          .drop("_ice_path", "_ice_pos")
      }
    }
  }
}
