package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime-optimization parity (SURVEY §4) and the non-deterministic
  * function family (SURVEY §7.4 — excluded from oracle hashing; tested
  * by distribution properties instead). */
class RuntimeFeaturesSpec extends AnyFunSuite {
  import TestSession._

  test("runtime bloom-filter join pruning rewrites the plan " +
    "(parity with reference bloom_filter.rs / might_contain)") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.number.threshold" -> "100")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = Tables.df(spark, sf, "lineitem")
      val ord = Tables.df(spark, sf, "orders")
        .filter(col("o_totalprice") > 450000.0)
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .agg(sum(col("l_quantity")))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"), optimized.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ANSI mode raises on overflow/div-zero where default mode nulls") {
    import org.apache.spark.sql.functions.{expr, lit}
    val key = "spark.sql.ansi.enabled"
    val saved = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "true")
      val err = intercept[Exception] {
        spark.range(1).select(expr("1 / 0")).collect()
      }
      assert(err.getMessage.contains("DIVIDE_BY_ZERO"), err.getMessage)
      spark.conf.set(key, "false")
      val r = spark.range(1).select(expr("try_divide(1, 0)")).collect()
      assert(r.head.isNullAt(0))
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("spark_partition_id / monotonically_increasing_id / rand " +
    "distribution properties") {
    val df = Tables.df(spark, sf, "lineitem")
      .select(spark_partition_id().as("pid"),
        monotonically_increasing_id().as("mid"),
        rand(42).as("r"))
    val n = df.count()
    val stats = df.agg(
      countDistinct(col("mid")).as("mids"),
      min(col("r")).as("rmin"), max(col("r")).as("rmax"),
      avg(col("r")).as("ravg")).collect().head
    assert(stats.getAs[Long]("mids") == n, "mid must be unique")
    assert(stats.getAs[Double]("rmin") >= 0.0 &&
      stats.getAs[Double]("rmax") < 1.0)
    assert(math.abs(stats.getAs[Double]("ravg") - 0.5) < 0.05,
      s"rand mean ${stats.getAs[Double]("ravg")} not ~0.5")
  }
}
