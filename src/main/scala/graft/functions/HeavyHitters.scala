package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a `TypedImperativeAggregate` —
  * the single-pass frequent-items operator (same UDAF extension point as
  * KmvSketch.scala; reference UDAF seam: agg/spark_udaf_wrapper.rs +
  * auron.proto AggUdaf:167-171). Input: one string item per row; output:
  * the surviving (item, weight) counters, weight-descending.
  *
  * State is AT MOST k counters regardless of input size — constant
  * executor memory per group, mergeable partial → final like any
  * built-in agg, so the full-corpus frequency census that would need a
  * group-by over every distinct token shrinks to one k-entry sketch per
  * partition plus a k-entry merge at the driver side of the agg.
  *
  * Guarantees (classic MG + mergeability, Agarwal et al., "Mergeable
  * Summaries", PODS'12): for true count c(x) over n items, the sketch
  * retains every x with c(x) > n/(k+1), and any reported weight w(x)
  * satisfies c(x) - n/(k+1) <= w(x) <= c(x). The merge implements the
  * paper's combine: sum counters, then subtract the (k+1)-th largest
  * weight and drop non-positives — the error bound telescopes, so
  * partial aggregation across any partitioning preserves the guarantee
  * (HeavyHittersSpec proves superset-of-truth across repartitionings).
  *
  * The intended 2-pass pattern at scale (q206): sketch pass → tiny
  * candidate set → broadcast-join exact-count pass restricted to the
  * candidates → threshold filter. Only candidate rows ever reach the
  * second shuffle, and the final answer is EXACT — the sketch only
  * prunes, so its estimation error never surfaces in results.
  */
case class MisraGriesSketch(
    child: Expression,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(k > 0, "misra_gries: k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType), StructField("weight", LongType))))
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  /** Classic MG step: known item +1; room → insert at 1; full → decrement
    * every counter (dropping zeros) and DISCARD the new item. The
    * decrement-all is O(k) but amortized O(1): each decrement round is
    * paid for by k prior increments. */
  private def offer(buf: java.util.HashMap[String, Long], s: String): Unit = {
    val cur = buf.get(s)
    if (cur != 0L || buf.containsKey(s)) buf.put(s, cur + 1L)
    else if (buf.size < k) buf.put(s, 1L)
    else {
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  override def update(
      buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString)
    buf
  }

  /** Mergeable-summaries combine: pointwise sum, then if over k entries
    * subtract the (k+1)-th largest weight from all and drop <= 0. */
  override def merge(
      buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, cur + e.getValue)
    }
    if (buf.size > k) {
      val weights = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { weights(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(weights)
      val cut = weights(buf.size - k - 1) // (k+1)-th largest
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue - cut <= 0L) eit.remove()
        else e.setValue(e.getValue - cut)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    // weight-descending, token-ascending: deterministic output order
    val sorted = entries.sortBy { case (t, w) => (-w, t) }
    new GenericArrayData(sorted.map { case (t, w) =>
      InternalRow(UTF8String.fromString(t), w)
    })
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.entrySet().iterator()
    val items = new scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)](
      buf.size)
    while (it0.hasNext) {
      val e = it0.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      items += ((b, e.getValue))
      bytes += 4 + b.length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(items.size)
    items.foreach { case (b, w) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(w)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(new String(b, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MisraGriesSketch = copy(child = c.head)
}

object MisraGriesSketch {
  /** misra_gries(item, k): frequent-item candidates with weights. Every
    * item whose true count exceeds n/(k+1) is guaranteed present. */
  def misraGries(item: Column, k: Int = 256): Column =
    ColumnBridge.column(
      MisraGriesSketch(ColumnBridge.expression(item), k)
        .toAggregateExpression())
}
