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

  test("spark.graft.asof.impl=sort_merge plans the SORT-MERGE as-of " +
    "exec (spill-safe O(1) merge state) with identical results") {
    val broadcastRows = SparkEntry.queries("q125_asof_native")(spark, sf)
      .collect().map(_.toSeq)
    val key = "spark.graft.asof.impl"
    try {
      spark.conf.set(key, "sort_merge")
      val df = SparkEntry.queries("q125_asof_native")(spark, sf)
      val rows = df.collect().map(_.toSeq)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeAsOfJoin"),
        s"expected the sort-merge exec in:\n$plan")
      // EnsureRequirements must have inserted in-partition sorts on
      // both sides (the spill-capable part of the design)
      assert("(?s)Sort .*Sort ".r.findFirstIn(plan).isDefined,
        s"expected SortExec on both children in:\n$plan")
      assert(rows.length == broadcastRows.length)
      rows.zip(broadcastRows).foreach { case (a, b) => assert(a == b) }
    } finally spark.conf.unset(key)
  }

  test("auto ladder picks sort-merge when the right side is too big " +
    "to hash per partition") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val bKey = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(bKey)
    try {
      spark.conf.set(bKey, "1") // 1 byte: nothing broadcasts or hashes
      val df = SparkEntry.queries("q125_asof_native")(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.split("== Initial Plan ==").head
        .contains("SortMergeAsOfJoin"), s"expected SMJ shape in:\n$plan")
    } finally spark.conf.set(bKey, saved)
  }

  test("non-integral time/tie-break columns are rejected at plan build " +
    "time, not at task runtime") {
    import org.apache.spark.sql.functions._
    val ev = Tables.df(spark, sf, "events")
    val p = ev.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val c = ev.select(col("event_id").as("c_id"),
      col("user_id").as("c_user"), unix_micros(col("ts")).as("c_ts"),
      col("event_type").as("c_type"), col("ts").as("c_raw_ts"))
    val strTime = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoinOps.asof(p, c,
        "user_id", "c_user", "event_type", "c_ts", "c_id")
    }
    assert(strTime.getMessage.contains("time column event_type"))
    val strTie = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoinOps.asof(p, c,
        "user_id", "c_user", "ts_us", "c_ts", "c_type")
    }
    assert(strTie.getMessage.contains("tie-break column c_type"))
    // timestamp (long-backed) time IS accepted at build
    graft.plans.AsOfJoinOps.asof(p, c,
      "user_id", "c_user", "ts_us", "c_raw_ts", "c_id")
  }

  test("as-of exec reports matched/null-padded SQL metrics") {
    import org.apache.spark.sql.functions._
    graft.GraftExtensions.register(spark)
    // no trailing orderBy: a global sort's range-partitioner sampling
    // pass would execute the probe twice and double the metrics
    val ev = Tables.df(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        unix_micros(col("ts")).as("click_ts_us"))
    val df = graft.plans.AsOfJoinOps
      .asof(p, c, "user_id", "c_user", "ts_us", "click_ts_us", "click_id")
    val rows = df.collect()
    val nulls = rows.count(_.isNullAt(3)).toLong
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // walk through AQE wrappers and query-stage leaves
    def findExecs(p: SparkPlan): Seq[graft.plans.BroadcastAsOfJoinExec] = {
      val here = p match {
        case e: graft.plans.BroadcastAsOfJoinExec => Seq(e)
        case _ => Nil
      }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(findExecs)
    }
    val execs = findExecs(df.queryExecution.executedPlan)
    assert(execs.nonEmpty, "custom exec not found in the plan")
    val m = execs.head.metrics
    assert(m("numMatched").value == rows.length - nulls,
      s"matched metric ${m("numMatched").value} != ${rows.length - nulls}")
    assert(m("numNullPadded").value == nulls,
      s"null-pad metric ${m("numNullPadded").value} != $nulls")
  }

  test("sort-merge as-of with STRING keys matches the broadcast path " +
    "under forced spill (UTF8String views must not outlive the spill " +
    "reader's reused buffer)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    graft.GraftExtensions.register(spark) // planner strategy for AsOfJoinPlan
    // 200k right rows in ONE partition overshoots the session's 64k
    // force-spill threshold -> SortExec spills -> merge rows come back
    // through UnsafeSorterSpillReader's reused record buffer, the exact
    // scenario where a retained UTF8String candidateKey view corrupts
    def skey(c: org.apache.spark.sql.Column) =
      when(c % 3 === 0, lit("hot_key"))
        .otherwise(format_string("key_%03d", c % 40))
    val nRight = 200000L
    val right = spark.range(nRight).select(
      skey(col("id")).as("r_key"), col("id").as("r_time"),
      (col("id") * 7 % 1000).as("r_val"))
    val left = spark.range(5000).select(
      skey(col("id") * 11).as("l_key"),
      (col("id") * 37 % nRight).as("l_time"))
    def run(impl: String, parts: String): (Array[Seq[Any]], SparkPlan) = {
      val saved = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.graft.asof.impl", impl)
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try {
        val df = graft.plans.AsOfJoinOps.asof(left, right,
          "l_key", "r_key", "l_time", "r_time", "r_val")
        val rows = df.collect().map(_.toSeq)
          .sortBy(_.mkString(" "))
        (rows, df.queryExecution.executedPlan)
      } finally {
        spark.conf.unset("spark.graft.asof.impl")
        spark.conf.set("spark.sql.shuffle.partitions", saved)
      }
    }
    val (expected, _) = run("broadcast", "4")
    val (got, plan) = run("sort_merge", "1")
    def findSorts(p: SparkPlan): Seq[SortExec] = {
      val here = p match { case s: SortExec => Seq(s); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(findSorts)
    }
    val spilled = findSorts(plan).map(_.metrics("spillSize").value).sum
    assert(spilled > 0, s"scenario unexercised: no sort spilled in:\n$plan")
    assert(got.length == expected.length,
      s"${got.length} rows vs ${expected.length}")
    got.zip(expected).foreach { case (a, b) => assert(a == b) }
  }

  test("metamorphic: forward as-of equals backward as-of under " +
    "time/tie negation (randomized keyed series)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.GraftExtensions.register(spark)
    // forward(t, tie) must equal backward(-t, -tie) negated back:
    // greatest -rt <= -lt is smallest rt >= lt, and the per-direction
    // tie rules (backward greatest / forward smallest) swap the same
    // way. Random data exercises null-pads, duplicate times and tie
    // collisions that the fixture might not.
    val rnd = new scala.util.Random(20260813L)
    // left times overshoot the right range so forward null-pads occur
    val L = Seq.fill(400)((rnd.nextInt(8).toLong,
      rnd.nextInt(1000).toLong)).toDF("k", "t")
    val R = Seq.fill(400)((rnd.nextInt(8).toLong,
      rnd.nextInt(500).toLong, rnd.nextInt(50).toLong))
      .toDF("rk", "rt", "tie")
    val fwd = graft.plans.AsOfJoinOps
      .asof(L, R, "k", "rk", "t", "rt", "tie", "forward")
      .select(col("k"), col("t"), col("rt"), col("tie"))
      .collect().map(_.toSeq.map(String.valueOf)).sorted(
        Ordering.by((s: Seq[String]) => s.mkString("|")))
    val Ln = L.select(col("k"), (-col("t")).as("t"))
    val Rn = R.select(col("rk"), (-col("rt")).as("rt"),
      (-col("tie")).as("tie"))
    val back = graft.plans.AsOfJoinOps
      .asof(Ln, Rn, "k", "rk", "t", "rt", "tie", "backward")
      .select(col("k"), (-col("t")).as("t"), (-col("rt")).as("rt"),
        (-col("tie")).as("tie"))
      .collect().map(_.toSeq.map(String.valueOf)).sorted(
        Ordering.by((s: Seq[String]) => s.mkString("|")))
    assert(fwd.length == back.length)
    fwd.zip(back).foreach { case (a, b) => assert(a == b) }
    assert(fwd.exists(_(2) != "null"), "no matches — fixture too sparse")
    assert(fwd.exists(_(2) == "null"), "no null-pads — fixture too dense")
  }

  test("tolerance prunes far matches identically across all three " +
    "physical shapes") {
    import org.apache.spark.sql.functions._
    graft.GraftExtensions.register(spark)
    val tol = 10L * 60 * 1000000 // 10 min in µs
    def run(impl: String): Array[Seq[Any]] = {
      spark.conf.set("spark.graft.asof.impl", impl)
      try {
        val ev = Tables.df(spark, sf, "events")
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"))
        val c = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"),
            col("user_id").as("c_user"),
            unix_micros(col("ts")).as("click_ts_us"))
        graft.plans.AsOfJoinOps
          .asof(p, c, "user_id", "c_user", "ts_us", "click_ts_us",
            "click_id", "backward", tol)
          .select(col("purchase_id"), col("ts_us"), col("click_ts_us"))
          .orderBy(col("purchase_id")).collect().map(_.toSeq)
      } finally spark.conf.unset("spark.graft.asof.impl")
    }
    val bc = run("broadcast")
    val sh = run("shuffled_hash")
    val sm = run("sort_merge")
    bc.indices.foreach { i =>
      assert(bc(i) == sh(i) && bc(i) == sm(i), s"row $i")
    }
    // every match is within tolerance, and tolerance actually pruned
    // something relative to the unbounded q125 run
    bc.foreach { r =>
      if (r(2) != null)
        assert(r(1).asInstanceOf[Long] - r(2).asInstanceOf[Long] <= tol)
    }
    val unboundedNulls = SparkEntry.queries("q125_asof_native")(spark, sf)
      .collect().count(_.isNullAt(3))
    assert(bc.count(_(2) == null) > unboundedNulls,
      "tolerance pruned nothing — fixture too dense or tol too wide")
  }

  test("an unknown as-of direction is rejected at plan build time") {
    import org.apache.spark.sql.functions._
    val ev = Tables.df(spark, sf, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoinOps.asof(ev, ev,
        "user_id", "user_id", "ts_us", "ts_us", "event_id", "sideways")
    }
    assert(e.getMessage.contains("backward|forward|nearest"))
  }

  test("forward and nearest directions agree across all three physical " +
    "shapes, and forward matches are at-or-after") {
    import org.apache.spark.sql.functions._
    graft.GraftExtensions.register(spark)
    def build(direction: String, impl: String): Array[Seq[Any]] = {
      spark.conf.set("spark.graft.asof.impl", impl)
      try {
        val ev = Tables.df(spark, sf, "events")
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"))
        val c = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"),
            col("user_id").as("c_user"),
            unix_micros(col("ts")).as("click_ts_us"))
        graft.plans.AsOfJoinOps
          .asof(p, c, "user_id", "c_user", "ts_us", "click_ts_us",
            "click_id", direction)
          .select(col("purchase_id"), col("user_id"), col("ts_us"),
            col("click_id"), col("click_ts_us"))
          .orderBy(col("purchase_id")).collect().map(_.toSeq)
      } finally spark.conf.unset("spark.graft.asof.impl")
    }
    Seq("forward", "nearest").foreach { d =>
      val bc = build(d, "broadcast")
      val sh = build(d, "shuffled_hash")
      val sm = build(d, "sort_merge")
      assert(bc.length == sh.length && bc.length == sm.length, d)
      bc.indices.foreach { i =>
        assert(bc(i) == sh(i), s"$d: broadcast vs shuffled row $i")
        assert(bc(i) == sm(i), s"$d: broadcast vs sort-merge row $i")
      }
    }
    val fwd = build("forward", "broadcast")
    assert(fwd.exists(r => r(3) != null), "no forward matches in fixture")
    fwd.foreach { r =>
      if (r(3) != null)
        assert(r(4).asInstanceOf[Long] >= r(2).asInstanceOf[Long],
          "forward click must be at-or-after the purchase")
    }
  }

  test("inner and anti as-of agree with the outer formulation across " +
    "all three physical shapes") {
    import org.apache.spark.sql.functions._
    graft.GraftExtensions.register(spark)
    val tol = 10L * 60 * 1000000
    def frames(impl: String)
        : (Array[Seq[Any]], Array[Seq[Any]], Array[Seq[Any]]) = {
      spark.conf.set("spark.graft.asof.impl", impl)
      try {
        val ev = Tables.df(spark, sf, "events")
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"))
        val c = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"),
            col("user_id").as("c_user"),
            unix_micros(col("ts")).as("click_ts_us"))
        def go(jt: String) = graft.plans.AsOfJoinOps
          .asof(p, c, "user_id", "c_user", "ts_us", "click_ts_us",
            "click_id", "backward", tol, jt)
        val anti = go("anti")
        // anti emits the LEFT schema only
        assert(anti.columns.toSeq ===
          Seq("purchase_id", "user_id", "ts_us"), s"$impl anti schema")
        (go("outer").orderBy(col("purchase_id")).collect().map(_.toSeq),
          go("inner").orderBy(col("purchase_id")).collect().map(_.toSeq),
          anti.orderBy(col("purchase_id")).collect().map(_.toSeq))
      } finally spark.conf.unset("spark.graft.asof.impl")
    }
    Seq("broadcast", "shuffled_hash", "sort_merge").foreach { impl =>
      val (outer, inner, anti) = frames(impl)
      // output col order: purchase_id, user_id, ts_us, click_id, ...
      val matched = outer.filter(_(3) != null)
      val unmatched = outer.filter(_(3) == null).map(_.take(3))
      assert(inner.nonEmpty && anti.nonEmpty,
        s"$impl: fixture must exercise both paths")
      assert(inner.length + anti.length == outer.length, impl)
      assert(inner.toSeq == matched.toSeq, s"$impl inner != outer-matched")
      assert(anti.toSeq == unmatched.toSeq, s"$impl anti != outer-unmatched")
    }
  }

  test("multi-key as-of: a composite key equivalent to the single key " +
    "reproduces it exactly across all three physical shapes; a null " +
    "key FIELD matches nothing on every shape") {
    import org.apache.spark.sql.functions._
    graft.GraftExtensions.register(spark)
    val ev = Tables.df(spark, sf, "events")
    def purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
    def clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"),
        unix_micros(col("ts")).as("click_ts_us"))
    val baseline = graft.plans.AsOfJoinOps
      .asof(purchases, clicks, "user_id", "c_user", "ts_us",
        "click_ts_us", "click_id")
      .select(col("purchase_id"), col("click_id"))
      .orderBy(col("purchase_id")).collect().map(_.toSeq)
    // composite with a STRING component (exercises var-length fields
    // in the UnsafeRow key): (user_id % 3 as string, user_id) carries
    // exactly the single key\'s information
    Seq("broadcast", "shuffled_hash", "sort_merge").foreach { impl =>
      spark.conf.set("spark.graft.asof.impl", impl)
      try {
        val p2 = purchases
          .withColumn("grp", (col("user_id") % 3).cast("string"))
        val c2 = clicks
          .withColumn("cgrp", (col("c_user") % 3).cast("string"))
        val multi = graft.plans.AsOfJoinOps
          .asofBy(p2, c2, Seq("grp", "user_id"), Seq("cgrp", "c_user"),
            "ts_us", "click_ts_us", "click_id")
          .select(col("purchase_id"), col("click_id"))
          .orderBy(col("purchase_id")).collect().map(_.toSeq)
        assert(multi.toSeq == baseline.toSeq, s"$impl multi != single")
        // null in ANY key column -> matches nothing (null-padded),
        // uniformly across shapes
        val pNull = purchases.withColumn("grp",
          when(col("user_id") % 2 === 0, (col("user_id") % 3).cast("string")))
        val nulled = graft.plans.AsOfJoinOps
          .asofBy(pNull, c2, Seq("grp", "user_id"), Seq("cgrp", "c_user"),
            "ts_us", "click_ts_us", "click_id")
          .select(col("user_id"), col("click_id")).collect()
        val oddMatched = nulled.exists(r =>
          r.getLong(0) % 2 != 0 && !r.isNullAt(1))
        assert(!oddMatched, s"$impl: null key field must never match")
        assert(nulled.exists(r => !r.isNullAt(1)),
          s"$impl: even keys should still match")
      } finally spark.conf.unset("spark.graft.asof.impl")
    }
    // mismatched key types are an analysis-time error, not an empty join
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoinOps.asofBy(
        purchases.withColumn("k", col("user_id").cast("int")), clicks,
        Seq("k"), Seq("c_user"), "ts_us", "click_ts_us", "click_id")
    }
    assert(e.getMessage.contains("key type mismatch"))
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
