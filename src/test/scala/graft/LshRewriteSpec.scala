package graft

import graft.functions.CosineSimilarity.cosineSim
import graft.functions.VectorOps.asDouble
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GraftLshRewrite: the cosine-threshold cross join must become a bucket
  * equi-join (no nested loop) and return a subset of the exact result. */
class LshRewriteSpec extends AnyFunSuite {
  import TestSession._

  private def pairsQuery() = {
    val c = Tables.df(spark, sf, "embeddings")
      .filter(col("vec_id") <= 200)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val a = c.select(col("vec_id").as("a_id"), col("v").as("va"))
    val b = c.select(col("vec_id").as("b_id"), col("v").as("vb"))
    a.join(b, col("a_id") < col("b_id") &&
      cosineSim(col("va"), col("vb")) >= 0.25)
      .select(col("a_id"), col("b_id"))
  }

  test("rewrite fires, plans an equi-join on lsh buckets, result is a " +
    "subset of exact") {
    val exact = pairsQuery().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "need some exact pairs for the comparison")

    spark.experimental.extraOptimizations =
      Seq(graft.plans.GraftLshRewrite)
    spark.conf.set("spark.graft.ann.lshRewrite.enabled", "true")
    try {
      val df = pairsQuery()
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("lsh_bucket"), plan.take(2000))
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"rewrite must eliminate the nested loop:\n${plan.take(2000)}")
      val approx = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(approx.subsetOf(exact),
        s"LSH result must be a subset (got ${approx.size} vs ${exact.size})")
    } finally {
      spark.conf.unset("spark.graft.ann.lshRewrite.enabled")
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("rule is inert when disabled") {
    spark.experimental.extraOptimizations =
      Seq(graft.plans.GraftLshRewrite)
    try {
      val plan = pairsQuery().queryExecution.optimizedPlan.toString
      assert(!plan.contains("lsh_bucket"), plan.take(1000))
    } finally spark.experimental.extraOptimizations = Nil
  }
}
