package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** might_contain over a BROADCAST Bloom filter (r21, from ADVICE r20):
  * the triangle prefilter used to inline the serialized filter as a
  * plan Literal inside BloomFilterMightContain — ~1.2 bytes/edge held
  * in multiple driver copies, copied by every optimizer transform and
  * hex-expanded in raw explain output (the sf0.1 plan snapshot was
  * 2.9 MB from one such line; near the 2e8-edge gate it is a ~230 MB
  * literal and a driver-memory incident). This expression instead
  * references a `sparkContext.broadcast(BloomFilter)` — ONE driver
  * copy, shipped torrent-style once per executor — and keeps
  * whole-stage codegen: the generated code resolves `broadcast.value`
  * once per task into a mutable slot and calls `mightContainLong`
  * per row. (Spark's own injected runtime filter uses a scalar
  * subquery, but BloomFilterAggregate silently clamps sizing to the
  * runtime-filter confs — 4M items / 8M bytes by default — which would
  * quietly degrade the 1% fpp the prefilter is sized for; the
  * driver-built, exactly-sized filter has no such cliff.)
  *
  * False positives only cost extra shuffle: callers re-check exactly
  * (the closing semi-join), so results are unchanged by construction.
  */
case class BloomMightContainBroadcast(
    bf: Broadcast[BloomFilter],
    child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_broadcast"

  override protected def nullSafeEval(input: Any): Any =
    bf.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloomBroadcast", bf,
      classOf[Broadcast[BloomFilter]].getName)
    val filterCls = classOf[BloomFilter].getName
    // resolved once per generated-class instance (= once per task),
    // not per row — Broadcast.value() is a lookup each call otherwise
    val filterVar = ctx.addMutableState(filterCls, "bloomFilterValue",
      v => s"$v = ($filterCls) $bfRef.value();")
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $filterVar.mightContainLong($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainBroadcast =
    copy(child = newChild)
}

object BloomMightContainBroadcast {
  def col(bf: Broadcast[BloomFilter], hash: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      BloomMightContainBroadcast(bf, ColumnBridge.expression(hash)))
  }
}
