package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Custom table-generating function (UDTF surface, SURVEY §2.6 — the
  * reference wraps Spark UDTFs via GenerateUdtf, auron.proto:618-628;
  * ours is a native Catalyst `Generator`): emits one row per adjacent
  * token pair — the n-gram shingling primitive for dedup pipelines.
  *
  * Generators run inside GenerateExec partition-locally: no shuffle, no
  * state, scales linearly.
  */
case class BigramsGenerator(child: Expression)
  extends UnaryExpression with CollectionGenerator with CodegenFallback {

  override def position: Boolean = false
  override def inline: Boolean = false
  override def collectionType: DataType = ArrayType(elementSchema)

  override def elementSchema: StructType = StructType(Seq(
    StructField("w1", StringType), StructField("w2", StringType)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input)
    if (arr == null) Nil
    else {
      val a = arr.asInstanceOf[ArrayData]
      val n = a.numElements()
      (0 until n - 1).map { i =>
        InternalRow(a.getUTF8String(i), a.getUTF8String(i + 1))
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): BigramsGenerator =
    copy(child = c)
}

object BigramsGenerator {
  /** bigrams(tokens_array) -> rows of (w1, w2). */
  def bigrams(tokens: Column): Column =
    ColumnBridge.column(BigramsGenerator(ColumnBridge.expression(tokens)))
}
