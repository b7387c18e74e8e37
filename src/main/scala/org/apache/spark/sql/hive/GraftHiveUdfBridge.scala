package org.apache.spark.sql.hive

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.hive.HiveShim.HiveFunctionWrapper

/** `private[hive]` accessor (same pattern as GraftPlanBridge): exposes
  * Spark's own Hive-UDF adapter expressions to graft's Hive bridge.
  * HiveSimpleUDF adapts `o.a.h.hive.ql.exec.UDF` subclasses (reflective
  * evaluate(), java-type signature mapping); HiveGenericUDF adapts
  * `GenericUDF` (ObjectInspector initialization + DeferredObject
  * arguments). Both are full Catalyst expressions — null handling,
  * codegen fallback, serialization to executors — so a bridged Hive
  * UDF runs distributed exactly like a native function. */
object GraftHiveUdfBridge {
  def simple(name: String, className: String,
             children: Seq[Expression]): Expression =
    HiveSimpleUDF(name, HiveFunctionWrapper(className), children)

  def generic(name: String, className: String,
              children: Seq[Expression]): Expression =
    HiveGenericUDF(name, HiveFunctionWrapper(className), children)
}
