package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Sign-LSH bucket id from hash-derived hyperplanes — a codegen'd
  * expression with NO stored plane matrix: plane(i, d) is a deterministic
  * pseudo-gaussian computed from murmur hashes (Box-Muller), so the same
  * (seed, bits) always produces the same bucketing for any vector
  * dimension. This is what lets the optimizer Rule (GraftLshRewrite)
  * inject bucket equality into a join condition without schema plumbing.
  */
case class LshBucketExpr(child: Expression, bits: Int, seed: Int)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override protected def nullSafeEval(input: Any): Any =
    LshBucketExpr.compute(input.asInstanceOf[ArrayData], bits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = LshBucketExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.compute($c, $bits, $seed);"
    })

  override protected def withNewChildInternal(c: Expression): LshBucketExpr =
    copy(child = c)
}

object LshBucketExpr {
  /** Deterministic standard-gaussian plane weight for (seed, plane, dim)
    * via Box-Muller over two murmur-derived uniforms. */
  private def planeWeight(seed: Int, i: Int, d: Int): Double = {
    import scala.util.hashing.MurmurHash3
    val h1 = MurmurHash3.productHash((seed, i, d, 1))
    val h2 = MurmurHash3.productHash((seed, i, d, 2))
    val u1 = ((h1 & 0x7fffffff).toDouble + 1.0) / 2147483649.0 // (0,1]
    val u2 = (h2 & 0x7fffffff).toDouble / 2147483648.0         // [0,1)
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  def compute(v: ArrayData, bits: Int, seed: Int): Long = {
    val n = v.numElements()
    var bucket = 0L
    var i = 0
    while (i < bits) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        dot += v.getDouble(d) * planeWeight(seed, i, d)
        d += 1
      }
      if (dot > 0.0) bucket |= (1L << i)
      i += 1
    }
    bucket
  }

  def lshBucketHashed(v: Column, bits: Int, seed: Int = 7): Column =
    ColumnBridge.column(
      LshBucketExpr(ColumnBridge.expression(v), bits, seed))
}
