package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** K-Minimum-Values distinct-count sketch as a `TypedImperativeAggregate`
  * — the same extension point the reference's UDAF fallback wraps
  * (SURVEY §2.6; reference agg/spark_udaf_wrapper.rs + auron.proto
  * AggUdaf:167-171). Input: array<string> of tokens per row; output: the
  * estimated number of distinct tokens across the group.
  *
  * Sketch state is a bounded sorted set of the k smallest 64-bit token
  * hashes — constant memory per group, mergeable across partitions
  * (partial → final works like any built-in agg), serializable for
  * shuffle. Estimator: (k-1) / kthValue, mapped from the unsigned-hash
  * unit interval.
  */
case class KmvDistinctSketch(
    child: Expression,
    k: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    // store hashes flipped by Long.MinValue so natural ordering equals
    // unsigned ordering of the raw hash
    val key: java.lang.Long = h ^ Long.MinValue
    buf.add(key)
    if (buf.size > k) buf.remove(buf.last)
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      var i = 0
      while (i < a.numElements()) {
        val t = a.getUTF8String(i)
        if (t != null) {
          val s = t.toString
          val h1 = scala.util.hashing.MurmurHash3.stringHash(s, 0x1b873593)
          val h2 = scala.util.hashing.MurmurHash3.stringHash(s, 0xe6546b64)
          add(buf, (h1.toLong << 32) | (h2.toLong & 0xffffffffL))
        }
        i += 1
      }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      buf.add(it.next())
      if (buf.size > k) buf.remove(buf.last)
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val n = buf.size
    if (n < k) n.toDouble
    else {
      // k-th smallest unsigned hash mapped to (0, 1]
      val kthUnsigned = buf.last ^ Long.MinValue
      val frac = (kthUnsigned.toDouble / 2.0) / 9.223372036854776e18 + 0.5
      (k - 1).toDouble / frac
    }
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinctSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinctSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): KmvDistinctSketch = copy(child = c.head)
}

object KmvDistinctSketch {
  /** kmv_distinct(tokens_array): approximate distinct count of elements. */
  def kmvDistinct(tokens: Column, k: Int = 256): Column =
    ColumnBridge.column(
      KmvDistinctSketch(ColumnBridge.expression(tokens), k)
        .toAggregateExpression())
}
