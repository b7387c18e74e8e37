package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.types._

/** Codec for Apache Paimon's serialized `BinaryRow` — the fixed-layout
  * row format partition values travel in inside manifest entries
  * (`_PARTITION` bytes). The layout is published in the Paimon format
  * docs and source (org.apache.paimon.data.BinaryRow, inherited from
  * Flink's BinaryRowData):
  *
  *  - NULL-BITS region first: 1 header byte (row kind) shares the
  *    region, so its width is `((arity + 63 + 8) / 64) * 8` bytes and
  *    field i's null bit is bit `(i + 8)` — byte `(i+8)>>3`, mask
  *    `1 << ((i+8)&7)`.
  *  - Then `arity` FIXED 8-byte slots. Primitives sit in the slot's
  *    low bytes (little-endian — the serialized form is the writer's
  *    memory image and production hardware is LE; a BE-written row is
  *    outside scope and would fail the decode checks loudly).
  *  - VAR-LENGTH values (string/bytes): if len <= 7 the slot itself is
  *    "compact" — bytes 0..len-1 hold the data and byte 7 is
  *    `0x80 | len`; otherwise the slot holds
  *    `(offset from row start) << 32 | len` and the bytes live in the
  *    variable part after the fixed slots.
  *
  * Scope (loud failures): boolean / tinyint / smallint / int / bigint /
  * float / double / date / string. Decode validates slot padding,
  * offsets and lengths against the buffer so a mis-guessed layout
  * refuses rather than mis-reading. The ENCODER exists for fixtures
  * and future sink support and is the exact inverse.
  */
object BinaryRowCodec {

  private def nullBitsWidth(arity: Int): Int = ((arity + 63 + 8) / 64) * 8

  private def supported(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | DateType | StringType => true
    case _ => false
  }

  /** Decode one serialized BinaryRow into one value per field (null
    * elements for null fields). `types` are the partition columns'
    * Spark types in schema order. */
  def decode(bytes: Array[Byte], types: Seq[DataType],
             where: String): Seq[Any] = {
    val arity = types.length
    val fixedEnd = nullBitsWidth(arity) + 8 * arity
    if (bytes.length < fixedEnd) throw new IllegalStateException(
      s"$where: BinaryRow has ${bytes.length} bytes but $arity fields " +
        s"need at least $fixedEnd — not a BinaryRow of this row type")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def isNull(i: Int): Boolean = {
      val bit = i + 8
      (bytes(bit >> 3) & (1 << (bit & 7))) != 0
    }
    types.zipWithIndex.map { case (dt, i) =>
      if (!supported(dt)) throw new IllegalStateException(
        s"$where: BinaryRow field type ${dt.simpleString} is outside " +
          "codec scope")
      val off = nullBitsWidth(arity) + 8 * i
      // fixed-width primitives are zero-padded to the 8-byte slot in
      // the published layout (the writer zeroes its segment); junk in
      // the high bytes means a mis-guessed layout — refuse instead of
      // silently mis-reading
      def padded(width: Int): Unit =
        for (j <- (off + width) until (off + 8))
          if (bytes(j) != 0) throw new IllegalStateException(
            s"$where: BinaryRow field $i has non-zero padding byte " +
              s"at slot offset ${j - off} — not a " +
              s"${dt.simpleString} slot of this layout")
      if (isNull(i)) null
      else dt match {
        case BooleanType => padded(1); bytes(off) != 0
        case ByteType    => padded(1); bytes(off)
        case ShortType   => padded(2); bb.getShort(off)
        case IntegerType | DateType => padded(4); bb.getInt(off)
        case LongType    => bb.getLong(off)
        case FloatType   => padded(4); bb.getFloat(off)
        case DoubleType  => bb.getDouble(off)
        case StringType =>
          val slot = bb.getLong(off)
          if ((slot & 0x8000000000000000L) != 0) { // compact: in-slot
            val len = ((slot >>> 56) & 0x7f).toInt
            if (len > 7) throw new IllegalStateException(
              s"$where: compact BinaryRow string claims $len bytes (>7)")
            val out = new Array[Byte](len)
            System.arraycopy(bytes, off, out, 0, len)
            new String(out, StandardCharsets.UTF_8)
          } else {
            val start = (slot >>> 32).toInt
            val len = slot.toInt
            if (start < fixedEnd || len < 0 ||
              start.toLong + len > bytes.length)
              throw new IllegalStateException(
                s"$where: BinaryRow string slot points at " +
                  s"[$start, ${start.toLong + len}) outside the row " +
                  s"(${bytes.length} bytes)")
            new String(bytes, start, len, StandardCharsets.UTF_8)
          }
        case other => throw new IllegalStateException(
          s"$where: unreachable type $other")
      }
    }
  }

  /** Encode values (null allowed) as a serialized BinaryRow — the
    * exact inverse of [[decode]], used to author spec fixtures. */
  def encode(values: Seq[Any], types: Seq[DataType]): Array[Byte] = {
    require(values.length == types.length,
      s"encode: ${values.length} values for ${types.length} types")
    val arity = types.length
    val nullBits = nullBitsWidth(arity)
    val fixedEnd = nullBits + 8 * arity
    val varParts = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var varLen = 0
    val fixed = ByteBuffer.allocate(fixedEnd).order(ByteOrder.LITTLE_ENDIAN)
    // slot writes below; null bits patched into the header region
    val nullMask = new Array[Byte](nullBits)
    values.zip(types).zipWithIndex.foreach { case ((v, dt), i) =>
      require(supported(dt), s"encode: unsupported type ${dt.simpleString}")
      val off = nullBits + 8 * i
      if (v == null) {
        val bit = i + 8
        nullMask(bit >> 3) = (nullMask(bit >> 3) | (1 << (bit & 7))).toByte
      } else dt match {
        case BooleanType =>
          fixed.put(off, if (v.asInstanceOf[Boolean]) 1.toByte else 0.toByte)
        case ByteType    => fixed.put(off, v.asInstanceOf[Byte])
        case ShortType   => fixed.putShort(off, v.asInstanceOf[Short])
        case IntegerType | DateType =>
          fixed.putInt(off, v.asInstanceOf[Int])
        case LongType    => fixed.putLong(off, v.asInstanceOf[Long])
        case FloatType   => fixed.putFloat(off, v.asInstanceOf[Float])
        case DoubleType  => fixed.putDouble(off, v.asInstanceOf[Double])
        case StringType =>
          val b = v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
          if (b.length <= 7) {
            var slot = (0x80L | b.length.toLong) << 56
            for (j <- b.indices)
              slot |= (b(j).toLong & 0xffL) << (8 * j)
            fixed.putLong(off, slot)
          } else {
            val start = fixedEnd + varLen
            fixed.putLong(off, (start.toLong << 32) | b.length.toLong)
            varParts += b
            varLen += b.length
          }
        case other => throw new IllegalArgumentException(
          s"encode: unreachable type $other")
      }
    }
    val out = ByteBuffer.allocate(fixedEnd + varLen)
    val arr = fixed.array()
    System.arraycopy(nullMask, 0, arr, 0, nullBits)
    out.put(arr)
    varParts.foreach(out.put)
    out.array()
  }
}
