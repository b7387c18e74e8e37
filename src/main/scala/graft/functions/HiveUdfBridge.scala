package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.hive.GraftHiveUdfBridge

/** Hive UDF bridge (SURVEY "what's missing" — the reference detects and
  * wraps Hive UDFs so migrating Hive workloads keep their jars:
  * spark-extension/.../HiveUDFUtil.scala). `register` takes the UDF
  * CLASS NAME a Hive user has in their `CREATE FUNCTION ... AS
  * 'com.acme.MyUDF'` DDL, sniffs which of the two Hive UDF protocols
  * the class speaks — old-style `UDF` (reflective evaluate signature)
  * vs `GenericUDF` (ObjectInspector negotiation) — and registers the
  * matching Spark adapter expression under the given SQL name. No
  * HiveSessionCatalog / metastore needed: the adapter expressions are
  * plain Catalyst, so this works on any SparkSession and the bridged
  * function runs distributed with real null semantics.
  */
object HiveUdfBridge {

  def register(spark: SparkSession, name: String, className: String): Unit = {
    val clazz = java.lang.Class.forName(
      className, true, Thread.currentThread().getContextClassLoader)
    val builder: Seq[Expression] => Expression =
      if (classOf[org.apache.hadoop.hive.ql.exec.UDF]
          .isAssignableFrom(clazz))
        es => GraftHiveUdfBridge.simple(name, className, es)
      else if (classOf[org.apache.hadoop.hive.ql.udf.generic.GenericUDF]
          .isAssignableFrom(clazz))
        es => GraftHiveUdfBridge.generic(name, className, es)
      else throw new IllegalArgumentException(
        s"$className is neither a Hive UDF nor a GenericUDF")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "hive")
  }
}
