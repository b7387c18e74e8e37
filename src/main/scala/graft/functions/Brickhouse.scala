package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Brickhouse-style array aggregates (SURVEY §2.3 "brickhouse
  * collect/combine_unique" — the last uncovered aggregate row).
  *
  * Reference parity: auron recognises Hive's brickhouse
  * `collect`/`combine_unique` UDAFs over an ARRAY child
  * (spark-extension NativeConverters.scala:1301-1318) and lowers BOTH
  * onto its collect-set kernel (native-engine
  * datafusion-ext-plans/src/agg/brickhouse/collect.rs:33,
  * combine_unique.rs:34 — each wraps `AggCollectSet`), i.e. the
  * distinct union of array elements across the group's rows.
  * [[CombineUnique]] matches that exactly; [[BhCollect]] additionally
  * keeps Brickhouse's original duplicate-preserving list semantics
  * (a superset of the reference's approximation). Both emit sorted
  * output so results are deterministic and oracle-hashable.
  *
  * Scale: typed `Aggregator`s get Spark's two-phase (partial/final)
  * aggregation for free — element sets merge map-side before the
  * shuffle. CombineUnique's buffer is bounded by the group's distinct
  * element count; BhCollect, like Spark's own collect_list, is
  * inherently proportional to group size — callers bound the per-row
  * contribution (e.g. `slice`) when groups are huge.
  */
object Brickhouse {

  /** UTF-8 byte-order comparison, matching DuckDB's binary collation in
    * list_sort: Scala's default String ordering compares UTF-16 code
    * units, which diverges for supplementary-plane characters. */
  private val utf8Order: Ordering[String] = (a: String, b: String) =>
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Distinct union of array elements per group, sorted. */
  object CombineUnique
      extends Aggregator[Seq[String], mutable.HashSet[String], Seq[String]] {
    override def zero: mutable.HashSet[String] = mutable.HashSet.empty
    override def reduce(
        b: mutable.HashSet[String], a: Seq[String]): mutable.HashSet[String] = {
      if (a != null) a.foreach(e => if (e != null) b += e)
      b
    }
    override def merge(
        x: mutable.HashSet[String],
        y: mutable.HashSet[String]): mutable.HashSet[String] = x ++= y
    override def finish(b: mutable.HashSet[String]): Seq[String] =
      b.toSeq.sorted(utf8Order)
    override def bufferEncoder: Encoder[mutable.HashSet[String]] =
      org.apache.spark.sql.Encoders.kryo[mutable.HashSet[String]]
    override def outputEncoder: Encoder[Seq[String]] =
      ExpressionEncoder[Seq[String]]()
  }

  /** All array elements per group (duplicates kept), sorted. */
  object BhCollect
      extends Aggregator[Seq[String], mutable.ArrayBuffer[String], Seq[String]] {
    override def zero: mutable.ArrayBuffer[String] = mutable.ArrayBuffer.empty
    override def reduce(
        b: mutable.ArrayBuffer[String],
        a: Seq[String]): mutable.ArrayBuffer[String] = {
      if (a != null) a.foreach(e => if (e != null) b += e)
      b
    }
    override def merge(
        x: mutable.ArrayBuffer[String],
        y: mutable.ArrayBuffer[String]): mutable.ArrayBuffer[String] = x ++= y
    override def finish(b: mutable.ArrayBuffer[String]): Seq[String] =
      b.toSeq.sorted(utf8Order)
    override def bufferEncoder: Encoder[mutable.ArrayBuffer[String]] =
      org.apache.spark.sql.Encoders.kryo[mutable.ArrayBuffer[String]]
    override def outputEncoder: Encoder[Seq[String]] =
      ExpressionEncoder[Seq[String]]()
  }
}
