package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Read-only Apache Hudi MERGE_ON_READ **SNAPSHOT** reader — the
  * query mode [[HudiCowLite]] refuses (it serves MOR read-optimized
  * only), implemented from the PUBLIC HoodieLogFormat layout
  * (hudi.apache.org + org.apache.hudi.common.table.log.HoodieLogFormat
  * / HoodieLogFormatWriter):
  *
  * TIMELINE → FILE SLICES: the `.hoodie` timeline replays like the COW
  * reader, but each (partition, fileId) group tracks its current BASE
  * file (columnar write — a deltacommit's new-group insert or a
  * compaction's `<t>.commit` rewrite, which STARTS A NEW SLICE and
  * absorbs earlier logs) plus the ordered LOG files appended to that
  * slice by later deltacommits.
  *
  * LOG FILE LAYOUT (per block, as HoodieLogFormatWriter writes it):
  * [6-byte magic "#HUDI#"] [8-byte block length excluding magic]
  * [4-byte log-format version (1)] [4-byte block-type ordinal]
  * [header map: 4-byte count, then per entry 4-byte key ordinal +
  * 4-byte length + UTF-8 value] [8-byte content length] [content]
  * [footer map, same layout] [8-byte total block size]. All integers
  * big-endian (DataOutputStream). The SCHEMA header (ordinal 2)
  * carries the block's Avro schema JSON.
  *
  * AVRO_DATA_BLOCK content: [4-byte format version] [4-byte record
  * count] then per record [4-byte length][binary-Avro record]. Upserts
  * AND deletes ride these blocks — a record whose
  * `_hoodie_is_deleted` field is true is Hudi's soft delete. The
  * DELETE_BLOCK type (whose key-list serialization has changed across
  * releases) and COMMAND/HFILE/PARQUET/CDC blocks refuse loudly.
  *
  * MERGE, Spark-first: base files are ONE native vectorized scan; log
  * files decode EXECUTOR-SIDE (a flatMap over the slice list — log
  * volume never lands on the driver); the winning log record per
  * `_hoodie_record_key` is a partial-combining max_by over the
  * (instant, log version, block index, record index) order, exactly
  * one shuffle on the key; winners with `_hoodie_is_deleted` drop the
  * key, the rest REPLACE base rows through a LEFT ANTI join (log side
  * broadcast when small) + union. No window, no driver loops.
  *
  * Lite scope, loud failures (never silent wrong answers): table type
  * must be MERGE_ON_READ; magic / log-format version / block-type /
  * length mismatches, a log without its base file, a base file
  * without `_hoodie_record_key`, non-record or nested Avro schemas,
  * and Avro fields absent from the base schema all refuse with the
  * path named.
  */
object HudiMorLite {

  private implicit val fmts: Formats = DefaultFormats

  private val Magic: Array[Byte] = "#HUDI#".getBytes("UTF-8")
  private val SchemaHeaderOrdinal = 2
  private val BlockTypeNames = Seq("COMMAND_BLOCK", "DELETE_BLOCK",
    "CORRUPT_BLOCK", "AVRO_DATA_BLOCK", "HFILE_DATA_BLOCK",
    "PARQUET_DATA_BLOCK", "CDC_DATA_BLOCK")
  private val AvroDataBlockOrdinal = 3

  /** One log file of a slice: path + the (instant, version) order key
    * — instants zero-padded so string ordering is numeric ordering. */
  final case class LogFile(path: String, instant: String, version: Int)

  /** One file group's current slice: the base columnar file and the
    * ordered log files appended to it. */
  final case class FileSlice(partition: String, fileId: String,
                             baseInstant: String, basePath: String,
                             logs: Seq[LogFile])

  final case class MorSnapshot(instant: String, slices: Seq[FileSlice])

  private def readText(fs: org.apache.hadoop.fs.FileSystem,
                       p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Log file name "`.<fileId>_<baseInstant>.log.<version>[_<token>]`"
    * → (fileId, baseInstant, version); anything else refuses. */
  private[graft] def parseLogName(name: String): (String, String, Int) = {
    val re = "^\\.(.+)_(\\d+)\\.log\\.(\\d+)(_.*)?$".r
    name match {
      case re(fileId, base, v, _) => (fileId, base, v.toInt)
      case _ => throw new IllegalStateException(
        s"HudiMorLite: '$name' is not a Hudi log file name " +
          "(.<fileId>_<baseInstant>.log.<version>)")
    }
  }

  /** Replay the timeline up to `asOfInstant` into file slices. */
  def snapshot(spark: SparkSession, tableDir: String,
               asOfInstant: Option[String] = None): MorSnapshot = {
    val hoodieDir = new Path(tableDir, ".hoodie")
    val fs = hoodieDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hoodieDir))
      throw new IllegalStateException(s"$tableDir has no .hoodie directory")
    val props = new Path(hoodieDir, "hoodie.properties")
    val tableType: Option[String] =
      if (!fs.exists(props)) None
      else readText(fs, props).linesIterator
        .map(_.trim).find(_.startsWith("hoodie.table.type="))
        .map(_.split("=", 2)(1).trim)
    if (!tableType.contains("MERGE_ON_READ"))
      throw new IllegalStateException(
        s"$tableDir: hoodie.table.type=${tableType.getOrElse("<absent>")}" +
          " — HudiMorLite serves MERGE_ON_READ snapshot queries " +
          "(COPY_ON_WRITE reads through HudiCowLite)")

    val names = fs.listStatus(hoodieDir).toSeq.map(_.getPath.getName)
    val commits: Seq[(String, String)] = names.collect {
      case n if n.matches("\\d+\\.commit") =>
        (n.stripSuffix(".commit"), "commit")
      case n if n.matches("\\d+\\.replacecommit") =>
        (n.stripSuffix(".replacecommit"), "replacecommit")
      case n if n.matches("\\d+\\.deltacommit") =>
        (n.stripSuffix(".deltacommit"), "deltacommit")
    }.sortBy(c => BigInt(c._1))
    if (commits.isEmpty)
      throw new IllegalStateException(s"$tableDir: no completed commits")
    val wanted = asOfInstant match {
      case Some(t) =>
        if (!commits.exists(_._1 == t)) throw new IllegalArgumentException(
          s"$tableDir: no completed commit at instant $t " +
            s"(have ${commits.map(_._1).mkString(", ")})")
        commits.takeWhile(c => BigInt(c._1) <= BigInt(t))
      case None => commits
    }

    // (partition, fileId) -> (baseInstant, basePath, logs)
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[(String, String), (String, String, Vector[LogFile])]
    for ((instant, kind) <- wanted) {
      val p = new Path(hoodieDir, s"$instant.$kind")
      val json = try JsonMethods.parse(readText(fs, p))
        catch { case e: Exception => throw new IllegalStateException(
          s"$tableDir: malformed commit $instant: ${e.getMessage}")
        }
      if (kind == "replacecommit")
        (json \ "partitionToReplaceFileIds") match {
          case JObject(parts) => parts.foreach { case (part, ids) =>
            ids match {
              case JArray(arr) => arr.foreach { id =>
                groups.remove((part, id.extract[String])): Unit
              }
              case _ => throw new IllegalStateException(
                s"$tableDir: replacecommit $instant " +
                  s"partitionToReplaceFileIds[$part] is not an array")
            }
          }
          case _ => throw new IllegalStateException(
            s"$tableDir: replacecommit $instant has no " +
              "partitionToReplaceFileIds")
        }
      (json \ "partitionToWriteStats") match {
        case JObject(parts) => parts.foreach { case (part, stats) =>
          stats match {
            case JArray(ws) => ws.foreach { w =>
              val fileId = (w \ "fileId").extractOpt[String].getOrElse(
                throw new IllegalStateException(
                  s"$tableDir: commit $instant writeStat without fileId"))
              val path = (w \ "path").extractOpt[String].getOrElse(
                throw new IllegalStateException(
                  s"$tableDir: commit $instant writeStat without path"))
              val name = path.split('/').last
              if (path.endsWith(".parquet") || path.endsWith(".orc")) {
                // a base write STARTS a new slice: earlier logs are
                // absorbed (compaction) or irrelevant (fresh insert)
                groups((part, fileId)) = (instant, path, Vector.empty)
              } else if (name.contains(".log.")) {
                val (logFileId, baseInstant, version) = parseLogName(name)
                if (logFileId != fileId) throw new IllegalStateException(
                  s"$tableDir: commit $instant log $name claims fileId " +
                    s"$logFileId but its writeStat says $fileId")
                val cur = groups.getOrElse((part, fileId),
                  throw new IllegalStateException(
                    s"$tableDir: commit $instant appends log $name to " +
                      s"file group $fileId which has NO base file — " +
                      "log-only groups are outside HudiMorLite scope"))
                if (cur._1 != baseInstant) throw new IllegalStateException(
                  s"$tableDir: log $name targets base instant " +
                    s"$baseInstant but group $fileId's current base is " +
                    s"${cur._1} — stale/foreign log")
                groups((part, fileId)) =
                  (cur._1, cur._2,
                    cur._3 :+ LogFile(path, instant, version))
              } else throw new IllegalStateException(
                s"$tableDir: commit $instant writes $path — neither a " +
                  "columnar base file nor a .log file")
            }
            case _ => throw new IllegalStateException(
              s"$tableDir: commit $instant partitionToWriteStats[$part] " +
                "is not an array")
          }
        }
        case _ => throw new IllegalStateException(
          s"$tableDir: commit $instant has no partitionToWriteStats")
      }
    }
    val slices = groups.toSeq.map { case ((part, fid), (bi, bp, logs)) =>
      FileSlice(part, fid, bi, s"$tableDir/$bp",
        logs.sortBy(l => (BigInt(l.instant), l.version))
          .map(l => l.copy(path = s"$tableDir/${l.path}")))
    }
    MorSnapshot(wanted.last._1, slices)
  }

  /** One decoded log record: the record key, the total order among
    * log records, the soft-delete flag, and the row values aligned to
    * the OUTPUT schema's field order. */
  private[graft] final case class LogRecord(key: String, ord: String,
                                            deleted: Boolean,
                                            values: Seq[Any])

  /** Parse one log FILE's blocks (executor-side; byte layout in the
    * object doc) and emit its records aligned to `fieldNames`/
    * `fieldTypes`. `ordPrefix` is the (instant, version) order key;
    * block/record indexes extend it to a total order. */
  private[graft] def decodeLogFile(path: String, ordPrefix: String,
                                   fieldNames: Seq[String],
                                   fieldTypes: Seq[DataType])
  : Iterator[LogRecord] = {
    val fsPath = new Path(path)
    val fs = fsPath.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = new DataInputStream(new java.io.BufferedInputStream(
      fs.open(fsPath)))
    try {
      val out = Vector.newBuilder[LogRecord]
      var blockIdx = 0
      var eof = false
      while (!eof) {
        val first = in.read()
        if (first < 0) eof = true
        else {
          val magic = new Array[Byte](6)
          magic(0) = first.toByte
          in.readFully(magic, 1, 5)
          if (!java.util.Arrays.equals(magic, Magic))
            throw new IllegalStateException(
              s"$path: block $blockIdx does not start with the #HUDI# " +
                "magic — corrupt or not a HoodieLogFormat file")
          in.readLong() // block length (excluding magic); re-derived below
          val fmtVersion = in.readInt()
          if (fmtVersion != 1) throw new IllegalStateException(
            s"$path: log-format version $fmtVersion (HudiMorLite reads " +
              "version 1)")
          val blockType = in.readInt()
          if (blockType != AvroDataBlockOrdinal)
            throw new IllegalStateException(
              s"$path: block $blockIdx is " +
                BlockTypeNames.lift(blockType)
                  .getOrElse(s"unknown type $blockType") +
                " — only AVRO_DATA_BLOCK is in HudiMorLite scope " +
                "(deletes ride _hoodie_is_deleted records)")
          // header map: count, then (key ordinal, length, utf8 value).
          // Sizes are UNTRUSTED input — a garbage count/length must
          // refuse by name, not allocate gigabytes
          def sane(n: Int, what: String): Int = {
            if (n < 0 || n > (1 << 26)) throw new IllegalStateException(
              s"$path: block $blockIdx claims $what of $n — corrupt")
            n
          }
          val headers = (0 until sane(in.readInt(), "header count"))
            .map { _ =>
              val k = in.readInt()
              val bytes =
                new Array[Byte](sane(in.readInt(), "header length"))
              in.readFully(bytes)
              k -> new String(bytes, "UTF-8")
            }.toMap
          val schemaJson = headers.getOrElse(SchemaHeaderOrdinal,
            throw new IllegalStateException(
              s"$path: block $blockIdx carries no SCHEMA header — " +
                "cannot decode its Avro records"))
          val contentLen = in.readLong()
          if (contentLen < 8 || contentLen > Int.MaxValue)
            throw new IllegalStateException(
              s"$path: block $blockIdx claims content length $contentLen")
          val content = new Array[Byte](contentLen.toInt)
          in.readFully(content)
          // footer map (usually empty) + trailing total size
          (0 until sane(in.readInt(), "footer count")).foreach { _ =>
            in.readInt()
            val bytes =
              new Array[Byte](sane(in.readInt(), "footer length"))
            in.readFully(bytes)
          }
          in.readLong()
          out ++= decodeAvroBlock(path, blockIdx, schemaJson, content,
            f"$ordPrefix%s|$blockIdx%010d", fieldNames, fieldTypes)
          blockIdx += 1
        }
      }
      out.result().iterator
    } finally in.close()
  }

  /** Decode an AVRO_DATA_BLOCK's content: [4-byte format version]
    * [4-byte record count] then per record [4-byte length][binary
    * Avro]. Flat primitive records only; fields resolve by NAME
    * against the output schema and must cover every output column. */
  private def decodeAvroBlock(path: String, blockIdx: Int,
                              schemaJson: String, content: Array[Byte],
                              ordPrefix: String, fieldNames: Seq[String],
                              fieldTypes: Seq[DataType])
  : Seq[LogRecord] = {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    import org.apache.avro.io.DecoderFactory
    val schema = new Schema.Parser().parse(schemaJson)
    if (schema.getType != Schema.Type.RECORD)
      throw new IllegalStateException(
        s"$path: block $blockIdx schema is ${schema.getType}, not a " +
          "record")
    val keyIdx = fieldNames.indexOf("_hoodie_record_key")
    val reader = new GenericDatumReader[GenericRecord](schema)
    val in = new DataInputStream(
      new java.io.ByteArrayInputStream(content))
    def sane(v: Int, what: String): Int = {
      if (v < 0 || v > content.length) throw new IllegalStateException(
        s"$path: block $blockIdx claims $what of $v over " +
          s"${content.length} content bytes — corrupt")
      v
    }
    in.readInt() // content format version
    val n = sane(in.readInt(), "record count")
    (0 until n).map { recIdx =>
      val bytes = new Array[Byte](sane(in.readInt(), "record length"))
      in.readFully(bytes)
      val rec = reader.read(null,
        DecoderFactory.get().binaryDecoder(bytes, null))
      def field(name: String): Any =
        if (rec.getSchema.getField(name) == null) null
        else rec.get(name) match {
          case u: org.apache.avro.util.Utf8 => u.toString
          case other => other
        }
      // every OUTPUT column must exist in the log record — a missing
      // column would silently null a patched row's value
      val missing = fieldNames.filter(n => rec.getSchema.getField(n) == null)
      if (missing.nonEmpty) throw new IllegalStateException(
        s"$path: block $blockIdx record lacks columns " +
          s"${missing.mkString(", ")} — partial log records are " +
          "outside HudiMorLite scope")
      val values = fieldNames.zip(fieldTypes).map { case (nm, dt) =>
        (field(nm), dt) match {
          case (null, _)                => null
          case (v: Number, LongType)    => v.longValue()
          case (v: Number, IntegerType) => v.intValue()
          case (v: Number, DoubleType)  => v.doubleValue()
          case (v: Number, FloatType)   => v.floatValue()
          case (v, StringType)          => v.toString
          case (v: Boolean, BooleanType) => v
          case (v, dt2) => throw new IllegalStateException(
            s"$path: column $nm holds ${v.getClass.getSimpleName} but " +
              s"the base schema says ${dt2.simpleString} — outside " +
              "HudiMorLite's flat-primitive scope")
        }
      }
      val key = if (keyIdx >= 0) values(keyIdx).asInstanceOf[String]
        else field("_hoodie_record_key") match {
          case null => throw new IllegalStateException(
            s"$path: block $blockIdx record has no _hoodie_record_key")
          case k => k.toString
        }
      val deleted = field("_hoodie_is_deleted") match {
        case b: java.lang.Boolean => b.booleanValue()
        case _                    => false
      }
      LogRecord(key, f"$ordPrefix%s|$recIdx%010d", deleted, values)
    }
  }

  /** Write a HoodieLogFormat log file — fixture/spec authoring, the
    * exact inverse of [[decodeLogFile]]'s layout. Each block is
    * (Avro schema JSON, records as field→value maps); `blockType`
    * overrides the ordinal to author refusal fixtures. */
  private[graft] def writeLogFile(path: String,
                                  blocks: Seq[(String,
                                    Seq[Map[String, Any]])],
                                  blockType: Int = AvroDataBlockOrdinal)
  : Unit = {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter,
      GenericRecord}
    import org.apache.avro.io.EncoderFactory
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    for ((schemaJson, records) <- blocks) {
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      // content: [format version][record count][per record: len+avro]
      val contentBos = new ByteArrayOutputStream()
      val contentOut = new DataOutputStream(contentBos)
      contentOut.writeInt(1)
      contentOut.writeInt(records.size)
      for (r <- records) {
        val rec = new GenericData.Record(schema)
        schema.getFields.forEach(f =>
          rec.put(f.name(), r.getOrElse(f.name(), null)))
        val recBos = new ByteArrayOutputStream()
        val enc = EncoderFactory.get().binaryEncoder(recBos, null)
        writer.write(rec, enc)
        enc.flush()
        contentOut.writeInt(recBos.size())
        contentOut.write(recBos.toByteArray)
      }
      val content = contentBos.toByteArray
      // header map: one SCHEMA entry; footer map: empty
      val headerBos = new ByteArrayOutputStream()
      val headerOut = new DataOutputStream(headerBos)
      headerOut.writeInt(1)
      headerOut.writeInt(SchemaHeaderOrdinal)
      val schemaBytes = schemaJson.getBytes("UTF-8")
      headerOut.writeInt(schemaBytes.length)
      headerOut.write(schemaBytes)
      val header = headerBos.toByteArray
      val footer = { val b = new ByteArrayOutputStream()
        new DataOutputStream(b).writeInt(0); b.toByteArray }
      val blockLen = 4 + 4 + header.length + 8 + content.length +
        footer.length + 8
      out.write(Magic)
      out.writeLong(blockLen.toLong)
      out.writeInt(1)         // log-format version
      out.writeInt(blockType)
      out.write(header)
      out.writeLong(content.length.toLong)
      out.write(content)
      out.write(footer)
      out.writeLong(6L + 8L + blockLen) // total incl. magic + len field
    }
    out.flush()
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      bos.toByteArray): Unit
  }

  /** MOR SNAPSHOT DataFrame: base scan patched by the winning log
    * record per key (plan shape in the object doc). */
  def read(spark: SparkSession, tableDir: String,
           asOfInstant: Option[String] = None): DataFrame = {
    val snap = snapshot(spark, tableDir, asOfInstant)
    if (snap.slices.isEmpty) throw new IllegalStateException(
      s"$tableDir: snapshot at ${snap.instant} resolves to zero file " +
        "slices — nothing to read")
    val base = ColumnarScan(spark, tableDir, None,
      snap.slices.map(_.basePath))
    if (!base.columns.contains("_hoodie_record_key"))
      throw new IllegalStateException(
        s"$tableDir: base files carry no _hoodie_record_key — cannot " +
          "merge log records (populateMetaFields=false tables are " +
          "outside HudiMorLite scope)")
    val logs: Seq[(String, String)] = snap.slices.flatMap { s =>
      s.logs.map(l =>
        l.path -> f"${BigInt(l.instant)}%020d|${l.version}%010d")
    }
    if (logs.isEmpty) return base
    val names = base.schema.fieldNames.toSeq
    val types = base.schema.fields.map(_.dataType).toSeq
    for ((nm, dt) <- names.zip(types)) dt match {
      case LongType | IntegerType | DoubleType | FloatType |
           StringType | BooleanType =>
      case other => throw new IllegalStateException(
        s"$tableDir: base column $nm is ${other.simpleString} — log " +
          "merging is flat-primitive scope in HudiMorLite")
    }
    // executor-side block decode: one task per log file (bounded list
    // on the driver, record volume stays distributed)
    val logSchema = StructType(
      StructField("_hml_key", StringType) ::
        StructField("_hml_ord", StringType) ::
        StructField("_hml_deleted", BooleanType) ::
        base.schema.fields.toList)
    val rowsRdd = spark.sparkContext
      .parallelize(logs, math.min(logs.size, 32).max(1))
      .flatMap { case (path, ordPrefix) =>
        decodeLogFile(path, ordPrefix, names, types).map(r =>
          Row.fromSeq(r.key +: r.ord +: r.deleted +: r.values))
      }
    val logDf = spark.createDataFrame(rowsRdd, logSchema)
    // winning record per key: ONE partial-combining max_by (the total
    // order string encodes instant|logVersion|block|record), then
    // winners patch the base — anti-join + union, no window
    val payload = struct(
      (col("_hml_deleted") +: names.map(col)): _*)
    val winners = logDf
      .groupBy(col("_hml_key"))
      .agg(max_by(payload, col("_hml_ord")).as("_hml_top"))
    val patched = winners
      .filter(!col("_hml_top._hml_deleted"))
      .select(names.map(n => col(s"_hml_top.$n").as(n)): _*)
    base
      .join(winners.select(col("_hml_key")),
        base("_hoodie_record_key") === col("_hml_key"), "left_anti")
      .unionByName(patched)
  }
}
