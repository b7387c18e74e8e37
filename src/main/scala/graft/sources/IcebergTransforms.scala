package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iceberg PARTITION TRANSFORMS (iceberg.apache.org/spec "Partition
  * Transforms" + "Appendix B: 32-bit Hash Requirements") — the value
  * computations a spec-conformant WRITER must apply to place a row in
  * its partition. Implemented from the published spec so
  * [[IcebergLite.compact]] can rewrite bucket/truncate/temporal
  * partitioned tables, not just identity:
  *
  *  - `bucket[N]`: `(murmur3_x86_32(bytes) & Int.MaxValue) % N`, where
  *    int/long/date hash as the 8-byte LITTLE-ENDIAN long and strings
  *    as UTF-8 bytes (seed 0). The spec pins test vectors
  *    (34 → 2017239379, "iceberg" → 1210000089, date 2017-11-16 →
  *    -653330422) — IcebergSpec asserts them, so a mis-implemented
  *    hash fails loudly rather than silently mis-bucketing.
  *  - `truncate[W]`: ints/longs truncate toward negative infinity
  *    (`v - (((v % W) + W) % W)`), strings to their first W chars.
  *  - `days` / `months` / `years` on dates: whole units since
  *    1970-01-01 (result type int).
  *
  * Spark's own hash functions are NOT substitutable here: Spark's
  * murmur3 uses a different seed (42) and a non-standard tail mix, so
  * the bucket function is a scala UDF over this exact
  * implementation — acceptable because compaction is a maintenance
  * write path, not a query hot path.
  */
object IcebergTransforms {

  /** Standard murmur3_x86_32 (public domain algorithm), seed 0 —
    * byte-for-byte the function Iceberg's spec names. */
  def murmur3(data: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h1 = 0 // seed
    val nblocks = data.length / 4
    var i = 0
    while (i < nblocks) {
      var k1 = (data(4 * i) & 0xff) | ((data(4 * i + 1) & 0xff) << 8) |
        ((data(4 * i + 2) & 0xff) << 16) | ((data(4 * i + 3) & 0xff) << 24)
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    val tail = nblocks * 4
    var k1 = 0
    val rem = data.length & 3
    if (rem >= 3) k1 ^= (data(tail + 2) & 0xff) << 16
    if (rem >= 2) k1 ^= (data(tail + 1) & 0xff) << 8
    if (rem >= 1) {
      k1 ^= data(tail) & 0xff
      k1 *= c1; k1 = Integer.rotateLeft(k1, 15); k1 *= c2
      h1 ^= k1
    }
    h1 ^= data.length
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** The spec's long hash: 8 little-endian bytes (ints, dates and
    * timestamps promote to long first, so bucket(34:int) ==
    * bucket(34L)). */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    murmur3(b)
  }

  def hashString(s: String): Int =
    murmur3(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def bucketLong(v: Long, n: Int): Int =
    ((hashLong(v) & Int.MaxValue) % n)

  def bucketString(s: String, n: Int): Int =
    ((hashString(s) & Int.MaxValue) % n)

  /** One resolved partition-spec field: the staged column expression,
    * the manifest partition-struct type, and the parser that turns
    * the staging directory's string back into the typed value. */
  final case class Resolved(name: String, expr: Column => Column,
                            resultType: DataType, parse: String => Any)

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  /** Resolve `transform` over a source column of `srcType`, or refuse
    * loudly naming what is in scope. */
  def resolve(where: String, name: String, transform: String,
              srcType: DataType): Resolved = {
    def parseBy(dt: DataType): String => Any = dt match {
      case IntegerType => _.toInt
      case LongType    => _.toLong
      case StringType  => identity
      case BooleanType => _.toBoolean
      case DateType    => java.sql.Date.valueOf(_)
      case other => throw new IllegalStateException(
        s"$where: partition value type ${other.simpleString} — outside " +
          "lite compaction scope")
    }
    def refuse(): Nothing = throw new IllegalStateException(
      s"$where: partition transform '$transform' over " +
        s"${srcType.simpleString} — identity, bucket[N] " +
        "(int/long/string/date), truncate[W] (int/long/string) and " +
        "days/months/years (date) are inside lite compaction scope")
    transform match {
      case "identity" =>
        Resolved(name, c => c, srcType, parseBy(srcType))
      case BucketRe(nStr) =>
        val n = nStr.toInt
        require(n > 0, s"$where: bucket[$n] needs a positive N")
        val f: Column => Column = srcType match {
          case IntegerType | LongType =>
            val u = udf((v: java.lang.Long) =>
              if (v == null) null
              else Int.box(bucketLong(v.longValue(), n)))
            c => u(c.cast(LongType))
          case DateType =>
            // dates hash as their epoch-day count promoted to long
            val u = udf((v: java.lang.Integer) =>
              if (v == null) null
              else Int.box(bucketLong(v.longValue(), n)))
            c => u(datediff(c, to_date(lit("1970-01-01"))))
          case StringType =>
            val u = udf((v: String) =>
              if (v == null) null else Int.box(bucketString(v, n)))
            c => u(c)
          case _ => refuse()
        }
        Resolved(name, f, IntegerType, _.toInt)
      case TruncateRe(wStr) =>
        val w = wStr.toInt
        require(w > 0, s"$where: truncate[$w] needs a positive W")
        srcType match {
          case IntegerType | LongType =>
            // truncates toward NEGATIVE infinity per the spec
            Resolved(name,
              c => (c - (((c % w) + w) % w)).cast(srcType),
              srcType, parseBy(srcType))
          case StringType =>
            Resolved(name, c => substring(c, 1, w), StringType,
              identity)
          case _ => refuse()
        }
      case "days" if srcType == DateType =>
        Resolved(name, c => datediff(c, to_date(lit("1970-01-01"))),
          IntegerType, _.toInt)
      case "months" if srcType == DateType =>
        Resolved(name,
          c => (year(c) - 1970) * 12 + month(c) - 1,
          IntegerType, _.toInt)
      case "years" if srcType == DateType =>
        Resolved(name, c => year(c) - 1970, IntegerType, _.toInt)
      case _ => refuse()
    }
  }
}
