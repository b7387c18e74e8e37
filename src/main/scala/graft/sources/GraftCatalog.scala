package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Column, Identifier, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
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

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!(namespace.isEmpty || namespace.sameElements(Array("default"))))
      throw new NoSuchNamespaceException(namespace)
    tables.keySet().toArray(Array.empty[Identifier])
      .filter(_.namespace().sameElements(namespace))
  }

  override def loadTable(ident: Identifier): Table = {
    val props = tables.get(ident)
    if (props == null) throw new NoSuchTableException(ident)
    new GraftRangeTable(
      Option(props.get("n")).map(_.toLong).getOrElse(1000L),
      Option(props.get("slices")).map(_.toInt).getOrElse(4))
  }

  override def createTable(ident: Identifier, columns: Array[Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    if (tables.containsKey(ident)) throw new TableAlreadyExistsException(ident)
    tables.put(ident, new util.HashMap[String, String](properties))
    loadTable(ident)
  }

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table = {
    val props = tables.get(ident)
    if (props == null) throw new NoSuchTableException(ident)
    changes.foreach {
      case s: TableChange.SetProperty => props.put(s.property(), s.value())
      case r: TableChange.RemoveProperty => props.remove(r.property())
      case other => throw new UnsupportedOperationException(other.toString)
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    tables.remove(ident) != null

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit = {
    val props = tables.remove(oldIdent)
    if (props == null) throw new NoSuchTableException(oldIdent)
    tables.put(newIdent, props)
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
