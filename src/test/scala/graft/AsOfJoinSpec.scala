package graft

import org.scalatest.funsuite.AnyFunSuite

/** The native as-of join operator (plans/AsOfJoinNative.scala): physical
  * plan shape + agreement with the compositional window formulation. */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSession._

  test("q125 plans the custom BroadcastAsOfJoinExec over a broadcast " +
    "exchange (no shuffle of the probe side)") {
    val df = SparkEntry.queries("q125_asof_native")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastAsOfJoin"),
      s"expected the custom exec in:\n$plan")
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastQueryStage"),
      "right side must ride Spark's broadcast machinery")
  }

  test("native exec output equals the q103 window formulation " +
    "row-for-row") {
    val native = SparkEntry.queries("q125_asof_native")(spark, sf)
      .collect().map(_.toSeq)
    val window = SparkEntry.queries("q103_asof_join")(spark, sf)
      .collect().map(_.toSeq)
    assert(native.length == window.length)
    native.zip(window).foreach { case (a, b) => assert(a == b) }
  }

  test("right side over the broadcast threshold plans the SHUFFLED " +
    "as-of exec (co-partitioned, big-big path) with identical results") {
    val broadcastRows = SparkEntry.queries("q125_asof_native")(spark, sf)
      .collect().map(_.toSeq)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1") // nothing broadcasts -> shuffled branch
      val df = SparkEntry.queries("q125_asof_native")(spark, sf)
      val rows = df.collect().map(_.toSeq)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("ShuffledAsOfJoin"),
        s"expected the shuffled exec in:\n$plan")
      assert(!plan.split("\\+- == Initial Plan ==").head
          .contains("BroadcastAsOfJoin"))
      // both sides hash-clustered on the key by EnsureRequirements
      assert("hashpartitioning\\(user_id".r.findFirstIn(plan).isDefined ||
        "hashpartitioning\\(c_user".r.findFirstIn(plan).isDefined, plan)
      assert(rows.length == broadcastRows.length)
      rows.zip(broadcastRows).foreach { case (a, b) => assert(a == b) }
    } finally spark.conf.set(key, saved)
  }

  test("unmatched left rows null-pad; matched rows take the latest " +
    "at-or-before right row") {
    val rows = SparkEntry.queries("q125_asof_native")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(3))
        assert(r.getLong(4) <= r.getLong(2),
          "click must not be after the purchase")
    }
    // fixture has at least one purchase with no preceding click
    assert(rows.exists(_.isNullAt(3)), "null-pad path unexercised")
  }
}
