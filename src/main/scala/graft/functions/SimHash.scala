package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a token array — a custom Catalyst `Expression` with
  * full codegen (`doGenCode` emits a static call, keeping the operator
  * inside whole-stage codegen; SURVEY §7.3 lists simhash as one of the
  * genuinely-missing pieces that justify a native expression).
  *
  * Algorithm: per token compute a 64-bit hash (two scala MurmurHash3
  * 32-bit passes with distinct seeds); accumulate +1/-1 per bit; the
  * signature bit is the sign of the accumulator. Near-duplicate documents
  * land within small Hamming distance.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    SimHash64.hash(toks)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = SimHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.hashArrayData($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Codegen entry point. */
  def hashArrayData(arr: ArrayData): Long = {
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    hash(toks)
  }

  def hash(tokens: Array[UTF8String]): Long = {
    val acc = new Array[Int](64)
    var i = 0
    while (i < tokens.length) {
      val s = if (tokens(i) == null) "" else tokens(i).toString
      val h1 = scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c)
      val h2 = scala.util.hashing.MurmurHash3.stringHash(s, 0x85ebca6b)
      val h64 = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
      var b = 0
      while (b < 64) {
        if (((h64 >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Column-level entry: simhash64(tokens_array). Uses the Spark 4
    * classic Column<->Expression bridge. */
  def simhash64(tokens: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
  }
}
