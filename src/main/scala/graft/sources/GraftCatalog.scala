package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Column, Identifier, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 catalog plugin (SURVEY "what's missing #1" — lakehouse
  * table formats): no Iceberg/Hudi/Paimon jars exist in this offline
  * distribution, but THIS is the exact integration surface those
  * formats plug through (`spark.sql.catalog.<name>=<impl>` →
  * `CatalogPlugin`/`TableCatalog`, the same contract
  * IcebergConvertProvider's catalog rides in the reference's
  * thirdparty tree). The catalog manages named synthetic range tables:
  * SQL DDL (CREATE/DROP/SHOW) resolves through Spark's analyzer to
  * V2 identifiers, and a SELECT against a catalog table gets the full
  * pushdown stack of GraftRangeTable (filters, pruning, aggregates,
  * limit) with zero format-specific code in the query.
  *
  * Metadata lives in a JVM-wide map (a real format durably persists it;
  * the catalog CONTRACT — resolution, DDL, capability reporting — is
  * identical). Table property `n` sets the row count, `slices` the
  * split count.
  */
class GraftCatalog extends CatalogPlugin with TableCatalog
    with SupportsNamespaces {

  private var catalogName: String = _
  private val tables =
    new ConcurrentHashMap[Identifier, util.Map[String, String]]()

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def storeKey(ident: Identifier): String =
    s"$catalogName.${(ident.namespace() :+ ident.name()).mkString(".")}"

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!(namespace.isEmpty || namespace.sameElements(Array("default"))))
      throw new NoSuchNamespaceException(namespace)
    tables.keySet().toArray(Array.empty[Identifier])
      .filter(_.namespace().sameElements(namespace))
  }

  override def loadTable(ident: Identifier): Table = {
    val props = tables.get(ident)
    if (props == null) throw new NoSuchTableException(ident)
    if (GraftPartitionedStore.tables.containsKey(storeKey(ident)))
      new GraftPartitionedTable(storeKey(ident))
    else new GraftRangeTable(
      Option(props.get("n")).map(_.toLong).getOrElse(1000L),
      Option(props.get("slices")).map(_.toInt).getOrElse(4))
  }

  /** Time travel (`SELECT ... VERSION AS OF n`): serve version n of a
    * partitioned table through a frozen read-through state, so the
    * historical read gets the identical scan stack (partition pruning,
    * pushdown, runtime filtering) as the live table — the Iceberg
    * snapshot-read contract on the same TableCatalog seam. */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (tables.get(ident) == null) throw new NoSuchTableException(ident)
    val v = try version.toLong catch {
      case _: NumberFormatException => throw new UnsupportedOperationException(
        s"version must be a numeric snapshot id, got '$version'")
    }
    new GraftPartitionedTable(
      GraftPartitionedStore.snapshotKey(storeKey(ident), v))
  }

  /** `TIMESTAMP AS OF`: Spark hands micros-since-epoch; serve the last
    * version committed at or before it. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (tables.get(ident) == null) throw new NoSuchTableException(ident)
    val state = GraftPartitionedStore.tables.get(storeKey(ident))
    require(state != null, s"time travel: ${ident.name()} is not a " +
      "partitioned (versioned) table")
    import scala.jdk.CollectionConverters._
    val v = state.versions.asScala.takeWhile(_.commitTimeUs <= timestamp)
      .lastOption.getOrElse(throw new UnsupportedOperationException(
        s"no snapshot of ${ident.name()} at or before timestamp " +
          s"$timestamp")).version
    new GraftPartitionedTable(
      GraftPartitionedStore.snapshotKey(storeKey(ident), v))
  }

  override def createTable(ident: Identifier, columns: Array[Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (tables.containsKey(ident)) throw new TableAlreadyExistsException(ident)
    // PARTITIONED BY (col) → a writable partition-pruned row table
    // (the lakehouse shape); unpartitioned stays the synthetic
    // range table q142 exercises
    if (partitions.nonEmpty) {
      require(partitions.length == 1 && partitions(0).name() == "identity",
        s"only PARTITIONED BY (column) is supported, got " +
          partitions.mkString(", "))
      val partCol = partitions(0).references()(0).fieldNames()(0)
      val schema = StructType(columns.map(c =>
        StructField(c.name(), c.dataType(), c.nullable())))
      require(schema.fieldNames.contains(partCol),
        s"partition column $partCol not in ${schema.fieldNames.mkString(",")}")
      val st = new GraftPartitionedStore.TableState(schema, partCol)
      GraftPartitionedStore.tables.put(storeKey(ident), st)
      // defensive: no stale materialized snapshots may shadow this
      // fresh table's history (dropTable purges, but belt-and-braces)
      GraftPartitionedStore.tables.keySet()
        .removeIf(_.startsWith(storeKey(ident) + "@v"))
      GraftPartitionedStore.snapshot(st) // version 0: empty table
    }
    tables.put(ident, new util.HashMap[String, String](properties))
    loadTable(ident)
  }

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val props = tables.get(ident)
    if (props == null) throw new NoSuchTableException(ident)
    val state = GraftPartitionedStore.tables.get(storeKey(ident))
    changes.foreach {
      case s: TableChange.SetProperty => props.put(s.property(), s.value())
      case r: TableChange.RemoveProperty => props.remove(r.property())
      // schema evolution: the new column appends NULLABLE; rows
      // written before it resolve by name and read back null
      // (GraftRowsReaderFactory), Iceberg-style
      case a: TableChange.AddColumn if state != null =>
        require(a.fieldNames().length == 1,
          s"nested add-column unsupported: ${a.fieldNames().mkString(".")}")
        state.schema = StructType(state.schema.fields :+
          StructField(a.fieldNames()(0), a.dataType(), nullable = true))
      case other => throw new UnsupportedOperationException(other.toString)
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    GraftPartitionedStore.tables.remove(storeKey(ident))
    // drop materialized snapshot reads too, or a re-created table of
    // the same name would time-travel into the OLD table's history
    GraftPartitionedStore.tables.keySet()
      .removeIf(_.startsWith(storeKey(ident) + "@v"))
    tables.remove(ident) != null
  }

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit = {
    val props = tables.remove(oldIdent)
    if (props == null) throw new NoSuchTableException(oldIdent)
    tables.put(newIdent, props)
    // a partitioned table's schema+rows live in the store keyed by
    // identifier — move them too, or the renamed table would silently
    // resolve to a synthetic range table and orphan its data
    val state = GraftPartitionedStore.tables.remove(storeKey(oldIdent))
    if (state != null)
      GraftPartitionedStore.tables.put(storeKey(newIdent), state)
    // materialized snapshot reads are keyed by name — drop them so a
    // future table under the OLD name cannot serve this history
    GraftPartitionedStore.tables.keySet()
      .removeIf(_.startsWith(storeKey(oldIdent) + "@v"))
  }

  // SupportsNamespaces: single implicit "default" namespace
  override def listNamespaces(): Array[Array[String]] =
    Array(Array("default"))
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else throw new NoSuchNamespaceException(namespace)
  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] =
    if (namespace.sameElements(Array("default")) || namespace.isEmpty)
      new util.HashMap[String, String]()
    else throw new NoSuchNamespaceException(namespace)
  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("fixed single namespace")
  override def alterNamespace(namespace: Array[String],
                              changes: org.apache.spark.sql.connector.catalog.NamespaceChange*): Unit =
    throw new UnsupportedOperationException("fixed single namespace")
  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = false
}
