package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Read-only Apache Hudi COPY-ON-WRITE table reader implemented from
  * the PUBLIC Hudi layout (hudi.apache.org/docs — timeline + file
  * layout): `.hoodie/` holds `hoodie.properties` and a timeline of
  * `<instant>.commit` JSON files (completed commits only — `.inflight`
  * and `.requested` markers are in-progress and never read); each
  * commit's `partitionToWriteStats` names the base parquet file
  * written per FILE GROUP (fileId). Under copy-on-write a later commit
  * REWRITES a group's whole base file, so the snapshot at instant T is
  * simply: for every (partition, fileId), the path from the latest
  * commit ≤ T that touched it.
  *
  * Third lakehouse-interop leg next to [[DeltaLogLite]] and
  * [[IcebergLite]] (reference surface: thirdparty/auron-hudi — the
  * reference converts Hudi scans into its native engine). Same
  * Spark-first split: timeline replay is bounded plan-time metadata;
  * data reads are native vectorized parquet scans (COW base files
  * carry every column), keeping pushdown/pruning/codegen.
  *
  * `.replacecommit` instants (clustering / insert-overwrite) are
  * REPLAYED: the instant's `partitionToReplaceFileIds` first drops the
  * named (partition, fileId) groups, then its `partitionToWriteStats`
  * adds the replacement base files — so a clustered table reads its
  * compacted output, never both generations of a group.
  *
  * Lite scope, loud failures (never silent wrong answers):
  *  - `hoodie.table.type` must be COPY_ON_WRITE — MERGE_ON_READ needs
  *    log-file merging and is refused;
  *  - `.deltacommit` instants (a MOR artifact) are refused;
  *  - malformed commit JSON, a missing `.hoodie`, or an unknown
  *    `asOfInstant` throw with the file named.
  */
object HudiCowLite {

  final case class Snapshot(instant: String, files: Seq[String])

  private implicit val fmts: Formats = DefaultFormats

  private def readText(fs: org.apache.hadoop.fs.FileSystem,
                       p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Replay the commit timeline up to (and including) `asOfInstant`,
    * or fully. Returns the live base-file set. */
  def snapshot(spark: SparkSession, tableDir: String,
               asOfInstant: Option[String] = None): Snapshot = {
    val hoodieDir = new Path(tableDir, ".hoodie")
    val fs = hoodieDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hoodieDir))
      throw new IllegalStateException(s"$tableDir has no .hoodie directory")

    val props = new Path(hoodieDir, "hoodie.properties")
    if (fs.exists(props)) {
      val tableType = readText(fs, props).linesIterator
        .map(_.trim).find(_.startsWith("hoodie.table.type="))
        .map(_.split("=", 2)(1).trim)
      tableType.foreach { t =>
        if (t != "COPY_ON_WRITE") throw new IllegalStateException(
          s"$tableDir: hoodie.table.type=$t unsupported (HudiCowLite " +
            "reads COPY_ON_WRITE only; MERGE_ON_READ needs log merging)")
      }
    }

    val names = fs.listStatus(hoodieDir).toSeq.map(_.getPath.getName)
    names.find(_.endsWith(".deltacommit")).foreach { n =>
      throw new IllegalStateException(
        s"$tableDir: $n — deltacommit is a MERGE_ON_READ artifact")
    }
    // completed commits only: "<instant>.commit" / ".replacecommit"
    // exactly (inflight / requested markers have further suffixes and
    // are never read); instants are numeric timestamps — order
    // NUMERICALLY, not lexicographically (lexicographic missorts "9"
    // after "10" when widths vary)
    val commits: Seq[(String, String)] = names.collect {
      case n if n.matches("\\d+\\.commit") =>
        (n.stripSuffix(".commit"), "commit")
      case n if n.matches("\\d+\\.replacecommit") =>
        (n.stripSuffix(".replacecommit"), "replacecommit")
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

    // (partition, fileId) -> base file path; later commits win
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[(String, String), String]
    for ((instant, kind) <- wanted) {
      val p = new Path(hoodieDir, s"$instant.$kind")
      val json = try JsonMethods.parse(readText(fs, p))
        catch { case e: Exception => throw new IllegalStateException(
          s"$tableDir: malformed commit $instant: ${e.getMessage}")
        }
      // replacecommit: drop the replaced file groups FIRST, then add
      // the instant's replacement base files — never both generations
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
              groups((part, fileId)) = path
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
    Snapshot(wanted.last._1, groups.values.toSeq.map(p => s"$tableDir/$p"))
  }

  /** DataFrame over the snapshot's base files — one native parquet
    * scan (COW base files carry every column). */
  def read(spark: SparkSession, tableDir: String,
           asOfInstant: Option[String] = None): DataFrame = {
    val snap = snapshot(spark, tableDir, asOfInstant)
    // a commit with empty partitionToWriteStats resolves to zero files;
    // spark.read.parquet() with no paths dies with an opaque schema
    // error — refuse loudly instead (COW carries no schema store to
    // type an empty frame from)
    if (snap.files.isEmpty) throw new IllegalStateException(
      s"$tableDir: snapshot at ${snap.instant} resolves to zero base " +
        "files (empty partitionToWriteStats) — nothing to read")
    spark.read.parquet(snap.files: _*)
  }
}
