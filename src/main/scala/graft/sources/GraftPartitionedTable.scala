package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsDelete, SupportsMetadataColumns, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsDynamicOverwrite, SupportsOverwrite, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{AlwaysTrue, EqualNullSafe, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** PARTITIONED + WRITABLE catalog table (the Iceberg-shaped seam of
  * GraftCatalog — reference thirdparty lakehouse providers plug into
  * exactly this surface: CREATE TABLE ... PARTITIONED BY resolved to a
  * V2 identity Transform, INSERT INTO through the two-phase V2 batch
  * write, SELECT through a ScanBuilder whose partition-key predicates
  * PRUNE partitions source-side, ALTER TABLE ADD COLUMN as in-place
  * schema evolution with null read-back for pre-existing rows).
  *
  * Storage is an in-JVM map of partition-value → rows, each row keyed
  * by column NAME (so a schema-evolved read resolves by name and pads
  * missing columns with null — the same name-based resolution Iceberg
  * does with field ids). A real format durably writes files and keeps
  * manifests; the task-side write buffers + commit-message merge here
  * are the same two-phase commit CONTRACT at fixture scale (Spark's own
  * in-memory V2 test table ships row data in commit messages the same
  * way). The scan plans ONE InputPartition per surviving partition and
  * reports `partitions=kept/total` in its description — SourcesSpec
  * asserts pruning on it.
  */
object GraftPartitionedStore {
  final class TableState(@volatile var schema: StructType,
                         val partCol: String) {
    val data = new ConcurrentHashMap[String, Vector[Map[String, Any]]]()
    /** Time-travel history: one immutable snapshot per committed
      * version (a real format persists these as manifest lists; the
      * CONTRACT — version ids, commit timestamps, frozen data+schema —
      * is Iceberg's). Index == version id. */
    val versions =
      new java.util.concurrent.CopyOnWriteArrayList[Snapshot]()
  }
  final case class Snapshot(version: Long, commitTimeUs: Long,
                            schema: StructType,
                            data: Map[String, Vector[Map[String, Any]]])
  val tables = new ConcurrentHashMap[String, TableState]()

  /** Record a new version AFTER a commit mutates `state.data`. Every
    * commit path (batch append/overwrite, row-level replace, DELETE/
    * TRUNCATE) and CREATE TABLE (version 0, empty) calls this — the
    * same points a table format swaps its manifest. */
  def snapshot(state: TableState): Unit = state.synchronized {
    import scala.jdk.CollectionConverters._
    val frozen = state.data.asScala.toMap
    state.versions.add(Snapshot(state.versions.size().toLong,
      System.currentTimeMillis() * 1000L, state.schema, frozen))
  }

  /** Materialize snapshot `version` of `key` as a read-through table
    * state under a reserved "@v" key (idempotent), so the whole scan
    * stack — partition pruning, filter/column pushdown, runtime DPP —
    * works against historical versions unchanged. */
  def snapshotKey(key: String, version: Long): String = {
    val state = tables.get(key)
    require(state != null, s"no such table $key")
    require(version >= 0 && version < state.versions.size(),
      s"no version $version of $key " +
        s"(have 0..${state.versions.size() - 1})")
    val snap = state.versions.get(version.toInt)
    val sk = s"$key@v$version"
    tables.computeIfAbsent(sk, _ => {
      val st = new TableState(snap.schema, state.partCol)
      snap.data.foreach { case (pv, rows) => st.data.put(pv, rows) }
      st
    })
    sk
  }

  /** Render a partition VALUE as a storage key. NULL gets a reserved
    * sentinel and real values are prefixed, so a row whose partition
    * value is the STRING "null" can never share a bucket with the
    * null partition (previously both rendered "null", so a pruned
    * EqualTo(partCol, "null") — fully consumed, never re-evaluated by
    * Spark — wrongly returned NULL-partition rows, and a dynamic
    * overwrite of the "null" partition clobbered the NULL one). */
  def partKey(v: Any): String =
    if (v == null) "\u0000NULL" else "=" + String.valueOf(v)

  /** One v1 filter as a row predicate over the stored name→value maps,
    * or None for shapes the store cannot evaluate. Shared by the
    * overwrite commit and DELETE FROM — a filter ARRAY is always a
    * CONJUNCTION (the DSv2 contract). Null-safe equality against null
    * means "the column is absent" (nulls are not stored). */
  def rowPredicate(f: Filter): Option[Map[String, Any] => Boolean] =
    f match {
      case AlwaysTrue() => Some(_ => true)
      case EqualTo(c, v) => Some(r => r.get(c).contains(v))
      case EqualNullSafe(c, v) =>
        if (v == null) Some(r => !r.contains(c))
        else Some(r => r.get(c).contains(v))
      case In(c, vs) => Some(r => r.get(c).exists(vs.contains))
      case _ => None
    }

  /** Conjunction delete: drop every row matching ALL filters, then
    * drop emptied partitions. Throws (before mutating) on an
    * unsupported filter shape. */
  def deleteMatching(state: TableState, filters: Array[Filter]): Unit = {
    val preds = filters.map(f => rowPredicate(f).getOrElse(
      throw new UnsupportedOperationException(
        s"filter $f not supported (equality/IN/always-true only)")))
    val doomed = (r: Map[String, Any]) => preds.forall(_(r))
    state.data.replaceAll((_, rows) => rows.filterNot(doomed))
    state.data.entrySet().removeIf(e => e.getValue.isEmpty)
  }
}

class GraftPartitionedTable(key: String) extends Table
    with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsRowLevelOperations with SupportsMetadataColumns {

  /** `_partition` metadata column (the same provenance column Iceberg
    * exposes). Doubles as the row-level-operation metadata attribute:
    * its presence makes Spark plan the metadata-aware ReplaceData
    * writing task, whose projections split each merged row into
    * (metadata, data) — the DataWriter then receives rows in exactly
    * the declared write schema. Without any metadata attribute Spark's
    * plain writing task hands the writer the raw MergeRows output
    * (operation column included), which no by-position writer can
    * interpret. */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = "_partition"
      override def dataType(): DataType = StringType
      override def isNullable: Boolean = false
    })
  private def state: GraftPartitionedStore.TableState =
    GraftPartitionedStore.tables.get(key)

  // DELETE FROM ... WHERE <conjunction of equality/IN on any column>
  // resolves as a metadata delete; SupportsDelete's default
  // truncateTable() routes TRUNCATE TABLE through the same path
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(GraftPartitionedStore.rowPredicate(_).isDefined)
  override def deleteWhere(filters: Array[Filter]): Unit = {
    GraftPartitionedStore.deleteMatching(state, filters)
    GraftPartitionedStore.snapshot(state)
  }

  override def name(): String = key
  override def schema(): StructType = state.schema
  override def partitioning(): Array[Transform] =
    Array(Expressions.identity(state.partCol))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.OVERWRITE_BY_FILTER, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_DYNAMIC)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftPartitionedScanBuilder(key)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftPartitionedWriteBuilder(key, info.schema())

  // SQL MERGE INTO / UPDATE / non-metadata DELETE resolve through here
  // (the seam Iceberg's nightly upserts run on). canDeleteWhere above
  // still short-circuits simple deletes to the metadata path; anything
  // it declines falls back to this group-based rewrite.
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation =
        new GraftRowLevelOperation(key, info.command())
    }
}

/** GROUP-BASED row-level operation (the Iceberg copy-on-write model):
  * Spark rewrites MERGE/UPDATE/DELETE into (1) a scan of the affected
  * groups — here, partitions — through `newScanBuilder`, (2) a
  * replacement-row computation (the merge join / update projection,
  * planned entirely by Spark), and (3) a ReplaceData write through
  * `newWriteBuilder` whose commit swaps the scanned groups for the
  * replacement rows. The SAME operation instance serves both sides, so
  * the scan records which partitions the final plan actually read and
  * the write's commit replaces exactly those — partitions never
  * scanned are never touched.
  *
  * The scan deliberately does NOT push row-level filters: a group
  * replace must read every surviving row of an affected group (a
  * row-filtered scan would silently drop the carried-over rows on
  * rewrite). Partition-granular narrowing still happens at RUNTIME via
  * SupportsRuntimeV2Filtering — Spark's group-filter rule computes the
  * partitions containing matching rows with a separate throwaway scan
  * and hands them here as an IN predicate, so a MERGE touching one
  * partition of a 100 TB table reads and rewrites one partition, not
  * the table (the copy-on-write cost model Iceberg documents).
  */
class GraftRowLevelOperation(key: String, cmd: RowLevelOperation.Command)
    extends RowLevelOperation {
  /** Partitions the final planned scan read = the groups commit swaps. */
  @volatile private[sources] var scannedPartitions: Array[String] = _

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"GraftRowLevelOperation[$cmd]"

  // requesting _partition is what routes ReplaceData through the
  // projection-applying writing task — see metadataColumns() above
  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column("_partition"))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private val state = GraftPartitionedStore.tables.get(key)
      private var required: StructType = state.schema
      override def pruneColumns(s: StructType): Unit = required = s
      override def build(): Scan =
        new GraftGroupReplaceScan(GraftRowLevelOperation.this, key,
          state.partCol, required)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new GraftReplaceGroupsWrite(
          GraftRowLevelOperation.this, key,
          GraftPartitionedStore.tables.get(key).partCol, info.schema())
      }
    }
}

/** The affected-groups scan of a row-level operation: starts at every
  * partition, narrowed ONLY group-wise (runtime IN/= on the partition
  * column from Spark's group-filter rule), and reports what it planned
  * back to the operation so commit replaces exactly those groups. */
class GraftGroupReplaceScan(op: GraftRowLevelOperation, key: String,
                            partCol: String, required: StructType)
    extends Scan with Batch with SupportsRuntimeV2Filtering {
  @volatile private var runtimeKept: Array[String] =
    GraftPartitionedStore.tables.get(key).data.keySet()
      .toArray(Array.empty[String]).sorted

  override def readSchema(): StructType = required
  override def description(): String =
    s"GraftGroupReplaceScan table=$key groups=${runtimeKept.length}"
  override def toBatch: Batch = this

  // Runtime-filterable only when the partition column survives column
  // pruning: Spark's PartitionPruning resolves these refs against the
  // scan OUTPUT and throws (not skips) on a pruned-away column, so a
  // projection without the partition column must report no filter
  // attributes rather than an unresolvable one.
  override def filterAttributes(): Array[NamedReference] =
    if (required.fieldNames.contains(partCol))
      Array(Expressions.column(partCol))
    else Array.empty

  override def filter(predicates: Array[Predicate]): Unit = {
    def refIsPartCol(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case r: NamedReference =>
          r.fieldNames().length == 1 && r.fieldNames()(0) == partCol
        case _ => false
      }
    def litKey(e: org.apache.spark.sql.connector.expressions.Expression) =
      e match {
        case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
          Some(GraftPartitionedStore.partKey(l.value()))
        case _ => None
      }
    predicates.foreach { p =>
      val kids = p.children()
      p.name() match {
        case "IN" if kids.nonEmpty && refIsPartCol(kids.head) =>
          val vals = kids.tail.flatMap(litKey).toSet
          if (vals.size == kids.length - 1)
            runtimeKept = runtimeKept.filter(vals.contains)
        case "=" if kids.length == 2 && refIsPartCol(kids.head) =>
          litKey(kids(1)).foreach(v =>
            runtimeKept = runtimeKept.filter(_ == v))
        case _ => // unrecognized: keep the group (safe, never lossy)
      }
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    op.scannedPartitions = runtimeKept
    val data = GraftPartitionedStore.tables.get(key).data
    runtimeKept.map(pv =>
      GraftRowsPartition(data.getOrDefault(pv, Vector.empty)): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRowsReaderFactory(required, partCol)
}

/** ReplaceData commit: atomically swap the scanned groups for the
  * replacement rows. Tasks only buffer (same two-phase protocol as the
  * plain write), so an aborted job — task failure, thrown merge
  * expression — leaves the table byte-identical. */
class GraftReplaceGroupsWrite(op: GraftRowLevelOperation, key: String,
                              partCol: String, writeSchema: StructType)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftPartitionedWriterFactory(writeSchema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val data = GraftPartitionedStore.tables.get(key).data
    val incoming = messages.flatMap { case GraftRowsCommit(rows) => rows }
      .groupBy(r => GraftPartitionedStore.partKey(r.getOrElse(partCol, null)))
    val replaced = Option(op.scannedPartitions).getOrElse(
      throw new IllegalStateException(
        "ReplaceData commit before its group scan was planned"))
    replaced.foreach(data.remove)
    incoming.foreach { case (pv, rs) =>
      data.merge(pv, rs.toVector, (a, b) => a ++ b)
    }
    GraftPartitionedStore.snapshot(GraftPartitionedStore.tables.get(key))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class GraftPartitionedScanBuilder(key: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private val state = GraftPartitionedStore.tables.get(key)
  private var required: StructType = state.schema
  private var pushed: Array[Filter] = Array.empty
  private var keep: Option[Set[String]] = None // None = all partitions

  /** Accept partition-key equality/IN — the predicates a partitioned
    * store prunes with; everything else stays post-scan. Filters whose
    * value set contains NULL are NOT accepted (left for Spark to
    * evaluate): SQL equality to NULL is never true, so consuming one
    * here and pruning to the NULL-sentinel bucket would invert the
    * semantics. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo(c, v) => c == state.partCol && v != null
      case In(c, vs) => c == state.partCol && !vs.contains(null)
      case _ => false
    }
    accepted.foreach {
      case EqualTo(_, v) =>
        val s = Set(GraftPartitionedStore.partKey(v))
        keep = Some(keep.fold(s)(_ intersect s))
      case In(_, vs) =>
        val s = vs.map(GraftPartitionedStore.partKey).toSet
        keep = Some(keep.fold(s)(_ intersect s))
      case _ =>
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val all = state.data.keySet().toArray(Array.empty[String]).sorted
    val kept = keep.fold(all)(k => all.filter(k.contains))
    new GraftPartitionedScan(key, state.partCol, kept, all.length,
      required, pushed)
  }
}

/** One InputPartition per SURVIVING partition value — pruned partitions
  * are never planned (the row payload rides the partition descriptor;
  * a real format ships file handles instead). Implements RUNTIME
  * filtering too (SupportsRuntimeV2Filtering — the V2 dynamic-
  * partition-pruning seam): when the partitioned side joins a dim on
  * the partition column, Spark materializes the dim's key set first
  * and hands it here as an IN predicate, and partitions outside it are
  * dropped before planning — the join reads only the partitions the
  * dim can match, exactly how Iceberg prunes under DPP. */
class GraftPartitionedScan(key: String, partCol: String,
                           kept: Array[String], total: Int,
                           required: StructType, pushed: Array[Filter])
    extends Scan with Batch with SupportsRuntimeV2Filtering {
  // static pruning result, then narrowed again at runtime
  @volatile private var runtimeKept: Array[String] = kept

  override def readSchema(): StructType = required
  override def description(): String =
    s"GraftPartitionedScan table=$key partitions=${kept.length}/$total" +
      s" PushedFilters: [${pushed.mkString(", ")}]" +
      s" ReadColumns: ${required.fieldNames.mkString(",")}"
  override def toBatch: Batch = this

  // Runtime-filterable only when the partition column survives column
  // pruning: Spark's PartitionPruning resolves these refs against the
  // scan OUTPUT and throws (not skips) on a pruned-away column, so a
  // projection without the partition column must report no filter
  // attributes rather than an unresolvable one.
  override def filterAttributes(): Array[NamedReference] =
    if (required.fieldNames.contains(partCol))
      Array(Expressions.column(partCol))
    else Array.empty

  override def filter(predicates: Array[Predicate]): Unit = {
    def refIsPartCol(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case r: NamedReference =>
          r.fieldNames().length == 1 && r.fieldNames()(0) == partCol
        case _ => false
      }
    def litStr(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case l: org.apache.spark.sql.connector.expressions.Literal[_] =>
          Some(GraftPartitionedStore.partKey(l.value()))
        case _ => None
      }
    predicates.foreach { p =>
      val kids = p.children()
      p.name() match {
        case "IN" if kids.nonEmpty && refIsPartCol(kids.head) =>
          val vals = kids.tail.flatMap(litStr).toSet
          if (vals.size == kids.length - 1) // all literals parsed
            runtimeKept = runtimeKept.filter(vals.contains)
        case "=" if kids.length == 2 && refIsPartCol(kids.head) =>
          litStr(kids(1)).foreach(v =>
            runtimeKept = runtimeKept.filter(_ == v))
        case _ => // unrecognized runtime predicate: prune nothing (safe)
      }
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val data = GraftPartitionedStore.tables.get(key).data
    runtimeKept.map(pv =>
      GraftRowsPartition(data.getOrDefault(pv, Vector.empty)): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRowsReaderFactory(required, partCol)
}

case class GraftRowsPartition(rows: Vector[Map[String, Any]])
    extends InputPartition

class GraftRowsReaderFactory(required: StructType, partCol: String)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rows = p.asInstanceOf[GraftRowsPartition].rows
    val strConv = CatalystTypeConverters.createToCatalystConverter(StringType)
    // name-based resolution: a column added AFTER these rows were
    // written is absent from their maps and reads as null. The
    // `_partition` metadata column is synthesized from the row's
    // partition value rather than stored.
    val getters: Array[Map[String, Any] => Any] = required.fields.map { f =>
      if (f.name == "_partition")
        (r: Map[String, Any]) =>
          strConv(GraftPartitionedStore.partKey(r.get(partCol).orNull))
      else {
        val conv = CatalystTypeConverters.createToCatalystConverter(f.dataType)
        (r: Map[String, Any]) => r.get(f.name).map(conv).orNull
      }
    }
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        new GenericInternalRow(getters.map(_(rows(i))): Array[Any])
      override def close(): Unit = ()
    }
  }
}

/** Write modes: plain append; INSERT OVERWRITE TABLE (an AlwaysTrue
  * overwrite = truncate-and-load); overwrite-by-filter (the filter
  * array is a conjunction per the SupportsOverwrite contract,
  * evaluated row-level — equality/IN on any column); and DYNAMIC
  * partition overwrite (overwritePartitions() — replace exactly the
  * partitions present in the incoming data, the nightly-backfill
  * semantics). All deletion happens INSIDE commit, after every task
  * has succeeded and after every filter has validated — a failed job
  * or an unsupported filter leaves the old data fully intact, the
  * same atomicity a file format gets from its manifest swap. */
class GraftPartitionedWriteBuilder(key: String, writeSchema: StructType)
    extends WriteBuilder with SupportsOverwrite with SupportsDynamicOverwrite {
  private var overwriteFilters: Option[Array[Filter]] = None
  private var dynamic = false

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    overwriteFilters = Some(filters)
    this
  }

  override def overwriteDynamicPartitions(): WriteBuilder = {
    dynamic = true
    this
  }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new GraftPartitionedBatchWrite(
      key, writeSchema, GraftPartitionedStore.tables.get(key).partCol,
      overwriteFilters, dynamic)
  }
}

/** Two-phase commit: each task buffers its rows and hands them to the
  * driver in its commit message; nothing is visible until
  * BatchWrite.commit merges all messages — a failed/aborted task
  * contributes nothing (same atomicity contract a file format gets
  * from its manifest swap). */
class GraftPartitionedBatchWrite(key: String, writeSchema: StructType,
                                 partCol: String,
                                 overwriteFilters: Option[Array[Filter]],
                                 dynamic: Boolean)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftPartitionedWriterFactory(writeSchema)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val tableState = GraftPartitionedStore.tables.get(key)
    val data = tableState.data
    val incoming = messages.flatMap { case GraftRowsCommit(rows) => rows }
      .groupBy(r => GraftPartitionedStore.partKey(r.getOrElse(partCol, null)))
    // conjunction row-level delete; parses all filters before mutating
    // (an unsupported shape throws with the table intact). A static
    // PARTITION (col = 'v') spec arrives as EqualNullSafe.
    overwriteFilters.foreach(
      GraftPartitionedStore.deleteMatching(tableState, _))
    // dynamic mode: replace exactly the partitions the incoming data
    // touches; untouched partitions keep their rows
    if (dynamic) incoming.keys.foreach(data.remove)
    incoming.foreach { case (pv, rs) =>
      data.merge(pv, rs.toVector, (a, b) => a ++ b)
    }
    GraftPartitionedStore.snapshot(tableState)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class GraftRowsCommit(rows: Seq[Map[String, Any]])
    extends WriterCommitMessage

class GraftPartitionedWriterFactory(writeSchema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = ArrayBuffer.empty[Map[String, Any]]
      private val fields = writeSchema.fields.zipWithIndex.map {
        case (f, i) =>
          (f.name, i, f.dataType,
            CatalystTypeConverters.createToScalaConverter(f.dataType))
      }
      override def write(row: InternalRow): Unit =
        buf += fields.flatMap { case (n, i, dt, conv) =>
          if (row.isNullAt(i)) None
          else Some(n -> conv(row.get(i, dt)))
        }.toMap
      override def commit(): WriterCommitMessage = GraftRowsCommit(buf.toSeq)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
