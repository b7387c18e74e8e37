package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact token-set Jaccard similarity of two string arrays as a fused
  * codegen'd Catalyst `Expression`: one hash-set pass computing
  * |A∩B| / |A∪B| directly, instead of the previous
  * `size(array_intersect) / size(array_union)` composition which
  * materializes BOTH derived arrays per row. On the LSH verify path the
  * expression runs once per candidate pair — millions of times per
  * batch on a dup-heavy corpus — so the two array allocations per row
  * were the dominant verification cost.
  *
  * Semantics match the composition exactly (and DuckDB's
  * `len(list_intersect(a,b)) / len(list_distinct(a||b))` oracle): both
  * sides are treated as SETS (duplicates collapse), equality is
  * byte-wise on UTF-8, and the result is the integer-count ratio — so
  * oracle-checked queries (q73/q118/q129) hash-match unchanged. */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardSim.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = JaccardSim.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.jaccard($a, $b);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSim =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {
  /** Interpreted + codegen entry point. Null array elements are ignored
    * (upstream tokenizers never emit them). */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val sa = new java.util.HashSet[UTF8String](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) {
      val e = a.getUTF8String(i)
      if (e != null) sa.add(e)
      i += 1
    }
    val sb = new java.util.HashSet[UTF8String](b.numElements() * 2)
    var inter = 0
    i = 0
    while (i < b.numElements()) {
      val e = b.getUTF8String(i)
      if (e != null && sb.add(e) && sa.contains(e)) inter += 1
      i += 1
    }
    val union = sa.size + sb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Column-level entry: jaccard_sim(tok_a, tok_b). */
  def jaccardSim(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      JaccardSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
