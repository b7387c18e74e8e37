package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 connector (SURVEY §2.7 / §2.1 rows 19-20,26 —
  * the Spark-native answer to the reference's bespoke scan nodes
  * (kafka_scan, ipc_reader, ffi_reader, auron.proto:780-807): where the
  * reference adds protobuf plan nodes + a native reader, Spark's
  * extension point is a V2 `TableProvider` whose `ScanBuilder`
  * participates in pushdown).
  *
  * A deterministic synthetic table `(id BIGINT, sq BIGINT, tag STRING)`
  * of `n` rows in `slices` splits, demonstrating BOTH pushdown
  * surfaces:
  *  - filter pushdown (`SupportsPushDownFilters`): id-range predicates
  *    narrow the generated range SOURCE-side — splits outside the range
  *    are never planned, the scan-side row count shrinks (asserted in
  *    SourcesSpec), exactly what partition pruning does on a real store;
  *  - column pruning (`SupportsPushDownRequiredColumns`): readers emit
  *    only the required columns in the required order.
  *
  * At 100 TB this is the connector contract that keeps a scan from
  * reading the world: predicates and projections reach the source
  * instead of filtering post-hoc in the engine.
  */
class GraftRangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftRangeTable.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GraftRangeTable(
      Option(properties.get("n")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("slices")).map(_.toInt).getOrElse(4))
}

object GraftRangeTable {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sq", LongType, nullable = false),
    StructField("tag", StringType, nullable = false)))
}

class GraftRangeTable(n: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_range($n)"
  override def schema(): StructType = GraftRangeTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRangeScanBuilder(n, slices)
}

class GraftRangeScanBuilder(n: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private var lo: Long = 0L
  private var hi: Long = n // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GraftRangeTable.schema
  private var aggPushed: Option[Aggregation] = None

  private def isId(f: AggregateFunc): Boolean = f match {
    case m: Min => m.column() match {
      case r: NamedReference => r.fieldNames.sameElements(Array("id"))
      case _ => false
    }
    case m: Max => m.column() match {
      case r: NamedReference => r.fieldNames.sameElements(Array("id"))
      case _ => false
    }
    case c: Count => !c.isDistinct && (c.column() match {
      case r: NamedReference => r.fieldNames.sameElements(Array("id"))
      case _ => false
    })
    case _: CountStar => true
    case _ => false
  }

  /** COMPLETE aggregate pushdown for ungrouped count(*)/count(id)/
    * min(id)/max(id): on a range the answers are arithmetic over
    * [lo, hi) — the source returns ONE row and the engine plans no
    * aggregation at all. Filter pushdown runs first, so the pushed
    * range already reflects id predicates. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    agg.groupByExpressions().isEmpty && agg.aggregateExpressions().forall(isId)

  override def pushAggregation(agg: Aggregation): Boolean =
    if (supportCompletePushDown(agg)) { aggPushed = Some(agg); true }
    else false

  /** Accept id-range predicates; everything else stays post-scan. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("id", _: Long) => true
      case GreaterThan("id", _: Long) => true
      case LessThanOrEqual("id", _: Long) => true
      case LessThan("id", _: Long) => true
      case EqualTo("id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1)
      case LessThan("id", v: Long) => hi = math.min(hi, v)
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ =>
    }
    pushed = accepted
    rejected // Spark re-applies these above the scan
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** LIMIT fully pushed: a range's first `limit` rows (after the
    * pushed id-filters) are just a shorter range. */
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, math.max(lo, 0L) + limit)
    true
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = aggPushed match {
    case Some(agg) =>
      new GraftRangeAggScan(math.max(lo, 0L), math.max(hi, lo), agg, pushed)
    case None =>
      new GraftRangeScan(math.max(lo, 0L), math.max(hi, lo), slices,
        required, pushed)
  }
}

/** Scan for a completely-pushed ungrouped aggregate: one partition,
  * one row, values computed arithmetically from the (filtered) range. */
class GraftRangeAggScan(lo: Long, hi: Long, agg: Aggregation,
                        pushed: Array[Filter]) extends Scan with Batch {
  private val fields = agg.aggregateExpressions().map {
    case _: CountStar => ("count_star", LongType)
    case _: Count => ("count_id", LongType)
    case _: Min => ("min_id", LongType)
    case _: Max => ("max_id", LongType)
    case other => throw new IllegalStateException(other.toString)
  }

  override def readSchema(): StructType =
    StructType(fields.map { case (nm, dt) =>
      StructField(nm, dt, nullable = true) })

  override def description(): String =
    s"GraftRangeAggScan range=[$lo,$hi) PushedAggregates: " +
      s"[${agg.aggregateExpressions().mkString(", ")}]" +
      s" PushedFilters: [${pushed.mkString(", ")}]"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftRangePartition(0, 1))

  override def createReaderFactory(): PartitionReaderFactory = {
    val span = math.max(0L, hi - lo)
    val values: Array[Any] = agg.aggregateExpressions().map {
      case _: CountStar => span
      case _: Count => span // id is never null
      case _: Min => if (span == 0) null else lo
      case _: Max => if (span == 0) null else hi - 1
      case other => throw new IllegalStateException(other.toString)
    }
    new GraftSingleRowReaderFactory(values)
  }
}

class GraftSingleRowReaderFactory(values: Array[Any])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = new GenericInternalRow(values)
      override def close(): Unit = ()
    }
}

class GraftRangeScan(lo: Long, hi: Long, slices: Int,
                     required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required

  override def description(): String =
    s"GraftRangeScan range=[$lo,$hi) PushedFilters: [${pushed.mkString(", ")}]" +
      s" ReadColumns: ${required.fieldNames.mkString(",")}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val span = math.max(0L, hi - lo)
    val per = math.max(1L, (span + slices - 1) / slices)
    (0 until slices).iterator
      .map(i => (lo + i * per, math.min(hi, lo + (i + 1) * per)))
      .filter { case (a, b) => a < b } // pruned splits are never planned
      .map { case (a, b) => GraftRangePartition(a, b): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftRangeReaderFactory(required.fieldNames)
}

case class GraftRangePartition(start: Long, end: Long) extends InputPartition

class GraftRangeReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GraftRangePartition]
    new PartitionReader[InternalRow] {
      private var cur = gp.start - 1
      override def next(): Boolean = { cur += 1; cur < gp.end }
      override def get(): InternalRow = {
        val vals: Array[Any] = cols.map {
          case "id" => cur
          case "sq" => cur * cur
          case "tag" => UTF8String.fromString("t" + (cur % 7))
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }
}
