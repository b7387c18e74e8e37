package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused k-permutation MinHash signature — one pass over the token array
  * computes all k slots via double hashing (h_i = h1 + i*h2, the
  * standard Kirsch-Mitzenstein construction), versus k separate
  * transform+array_min traversals. Codegen'd (doGenCode static call).
  *
  * Signature quality is equivalent to k independent hash permutations
  * for LSH banding purposes; PipelineSpec asserts recall >= 0.6 against
  * the exact-Jaccard pairs.
  */
case class MinHashSignatureExpr(child: Expression, k: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  // analysis-time type gate: the kernel reads UTF8String slots straight
  // out of ArrayData — a non-string array would read garbage memory,
  // not throw (same gate as JaccardSim)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs an array<string> input, got ${t.simpleString(10)}")
    }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignatureExpr.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = MinHashSignatureExpr.getClass.getName.stripSuffix("$") +
        "$.MODULE$"
      s"${ev.value} = $cls.compute($c, $k);"
    })

  override protected def withNewChildInternal(c: Expression): MinHashSignatureExpr =
    copy(child = c)
}

/** Fused MinHash signature + LSH band hashes: one pass computes the
  * k = bands×rows signature slots (same construction as
  * [[MinHashSignatureExpr]]), then folds each band's `rows` slots into
  * one 64-bit band key (murmur fmix64 avalanche seeded by the band
  * index). Returns Array[Long] of length `bands` — the per-band keys
  * the LSH candidate join equi-joins on. Replaces an
  * explode(array(struct(xxhash64(slot…×rows))×bands)) tree whose
  * generated code grew with bands×rows (janino chokes past ~256
  * element_at calls) and re-evaluated element_at per slot. */
case class MinHashBandsExpr(child: Expression, bands: Int, rows: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs an array<string> input, got ${t.simpleString(10)}")
    }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSignatureExpr.computeBands(
      input.asInstanceOf[ArrayData], bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = MinHashSignatureExpr.getClass.getName.stripSuffix("$") +
        "$.MODULE$"
      s"${ev.value} = $cls.computeBands($c, $bands, $rows);"
    })

  override protected def withNewChildInternal(c: Expression): MinHashBandsExpr =
    copy(child = c)
}

object MinHashSignatureExpr {
  /** The ONE min-hash kernel both entry points share — signature-only
    * and banded callers must stay hash-identical, or minhashSignature-
    * based queries silently desynchronize from minhashBands-based ones. */
  private def computeMins(arr: ArrayData, k: Int): Array[Long] = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      val tok = arr.getUTF8String(t)
      val s = if (tok == null) "" else tok.toString
      val h1 = scala.util.hashing.MurmurHash3.stringHash(s, 0x3c074a61)
      val h2 = scala.util.hashing.MurmurHash3.stringHash(s, 0x7a9b4c5d) | 1
      val b1 = (h1.toLong << 32) | (h1.toLong & 0xffffffffL)
      val b2 = (h2.toLong << 32) | (h2.toLong & 0xffffffffL)
      var i = 0
      var h = b1
      while (i < k) {
        if (h < mins(i)) mins(i) = h
        h += b2
        i += 1
      }
      t += 1
    }
    mins
  }

  def compute(arr: ArrayData, k: Int): ArrayData =
    new GenericArrayData(computeMins(arr, k))

  /** murmur3 fmix64 — the standard 64-bit avalanche. */
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  def computeBands(arr: ArrayData, bands: Int, rows: Int): ArrayData = {
    val mins = computeMins(arr, bands * rows)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = fmix64(0x9e3779b97f4a7c15L ^ b.toLong)
      var j = 0
      while (j < rows) {
        acc = fmix64(acc ^ mins(b * rows + j))
        j += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  def minhashSignature(tokens: Column, k: Int): Column =
    ColumnBridge.column(
      MinHashSignatureExpr(ColumnBridge.expression(tokens), k))

  def minhashBands(tokens: Column, bands: Int, rows: Int): Column =
    ColumnBridge.column(
      MinHashBandsExpr(ColumnBridge.expression(tokens), bands, rows))
}
