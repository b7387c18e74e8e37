package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions — the 100 TB design contract. A query
  * that silently loses its broadcast, pushdown, partial agg, or top-k
  * pushdown would still be correct on 60k rows and catastrophic at scale;
  * these tests pin the plan shapes. */
class PlanSpec extends AnyFunSuite {
  import TestSession._

  private def finalPlan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q11 star join broadcasts all four dims (no fact shuffle pre-agg)") {
    val p = finalPlan("q11_join_star")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(2000))
    assert(!p.contains("SortMergeJoin"), "dims must broadcast, not SMJ")
  }

  test("q1 aggregates map-side before the shuffle (partial_sum)") {
    val p = finalPlan("q1_agg")
    assert(p.contains("partial_sum"), p.take(2000))
  }

  test("q30 rank top-k uses WindowGroupLimit partial+final pushdown") {
    val p = finalPlan("q30_window_rank")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("q35 merge hint plans SortMergeJoin") {
    val p = finalPlan("q35_join_smj")
    assert(p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q36 shuffle_hash hint plans ShuffledHashJoin") {
    val p = finalPlan("q36_join_shj")
    assert(p.contains("ShuffledHashJoin"), p.take(2000))
  }

  test("q17 non-equi band join plans BroadcastNestedLoopJoin") {
    val p = finalPlan("q17_join_nonequi")
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("q15/q16 semi/anti lower to semi/anti joins") {
    assert(finalPlan("q15_join_semi").contains("LeftSemi"))
    assert(finalPlan("q16_join_anti").contains("LeftAnti"))
  }

  test("q77 ANN broadcasts probes and top-ks via WindowGroupLimit") {
    val p = finalPlan("q77_ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("q25 rollup plans the Expand operator") {
    val p = finalPlan("q25_rollup")
    assert(p.contains("Expand"), p.take(2000))
  }

  test("q64 bucketed join runs without a shuffle exchange before the join") {
    // consider only the Final Plan section (the Initial Plan dump below it
    // repeats the pre-AQE tree)
    val p = finalPlan("q64_bucketed_join").split("== Initial Plan ==").head
    val joinIdx = p.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, p.take(2000))
    assert(p.contains("Bucketed: true"), p.take(2000))
    // no Exchange may feed the join inputs (bucketing pre-shuffled them);
    // the only exchanges allowed are the post-join agg/sort ones above it
    val belowJoin = p.substring(joinIdx)
    assert(!belowJoin.contains("Exchange hashpartitioning"),
      s"bucketed join must not reshuffle:\n${belowJoin.take(2000)}")
  }

  test("repartition flavors plan the right partitionings (§2.1 row 18)") {
    import org.apache.spark.sql.functions.col
    val li = Tables.df(spark, sf, "lineitem")
    assert(li.repartition(4).queryExecution.executedPlan.toString
      .contains("RoundRobinPartitioning"))
    assert(li.repartition(4, col("l_orderkey")).queryExecution.executedPlan
      .toString.contains("hashpartitioning"))
    assert(li.repartitionByRange(4, col("l_orderkey")).queryExecution
      .executedPlan.toString.contains("rangepartitioning"))
  }

  test("partitioned parquet read-back prunes partitions on the filter") {
    import org.apache.spark.sql.functions.col
    // q60 wrote /tmp/graft_sink/parquet partitioned by l_returnflag
    SparkEntry.queries("q60_parquet_roundtrip")(spark, sf).collect()
    val df = spark.read.parquet("/tmp/graft_sink/parquet")
      .filter(col("l_returnflag") === "A")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      plan.take(1500))
  }

  test("cached dataframe scans from InMemoryTableScan") {
    import org.apache.spark.sql.functions.col
    val df = Tables.df(spark, sf, "nation").cache()
    try {
      df.count() // materialize the cache
      val agg = df.groupBy(col("n_regionkey")).count()
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("InMemoryTableScan"), plan.take(1500))
    } finally df.unpersist()
  }

  test("plain limit plans CollectLimit") {
    val p = Tables.df(spark, sf, "lineitem").limit(3)
      .queryExecution.executedPlan.toString
    assert(p.contains("CollectLimit"), p)
  }

  test("q50 wordcount partial-aggregates before its shuffle") {
    val p = finalPlan("q50_explode_wordcount")
    assert(p.contains("partial_count") || p.contains("partial_"), p.take(2000))
    assert(p.contains("Generate"), p.take(2000))
  }

  test("q108 binned range join plans an equi-join on the bin, not BNLJ") {
    val p = finalPlan("q108_range_join_binned")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range join must not fall back to nested-loop: " + p.take(2000))
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions " +
    "at runtime") {
    import spark.implicits._
    val out = "/tmp/graft_dpp_fact"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(out, "_SUCCESS")))
      Tables.df(spark, sf, "lineitem")
        .write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    val dimPath = "/tmp/graft_dpp_dim"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dimPath, "_SUCCESS")))
      Seq(("R", "returned"), ("A", "accepted"), ("N", "none"))
        .toDF("flag", "label").write.mode("overwrite").parquet(dimPath)
    val fact = spark.read.parquet(out)
    // DPP fires only when the build side carries a SELECTIVE predicate;
    // the dim must be file-based (a filtered LocalRelation constant-folds
    // into an unfiltered one and the selectivity check sees nothing)
    val dim = spark.read.parquet(dimPath)
      .filter(org.apache.spark.sql.functions.col("label") === "returned")
    val df = fact.join(dim, fact("l_returnflag") === dim("flag"))
      .groupBy(dim("flag")).count()
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"fact scan must carry a runtime partition-pruning filter:\n" +
        plan.take(3000))
  }

  test("AQE splits a skewed join partition at runtime " +
    "(OptimizeSkewedJoin, skew=true)") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        "65536",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 99% of left rows share key 7: one shuffle partition dwarfs the
      // others, the exact hot-key layout q38 salts by hand — here AQE
      // must detect it from runtime stats and split the skewed
      // partition into parallel sub-reads
      val left = spark.range(0, 300000).select(
        when(col("id") % 100 =!= 0, lit(7L)).otherwise(col("id"))
          .as("k"), col("id").as("v"))
      val right = spark.range(0, 1000).select(col("id").as("rk"))
      // no aggregate downstream: a consumer that requires the join's
      // output partitioning (e.g. groupBy(k)) would veto the split,
      // since splitting a partition breaks hash-partitioning — the
      // same reason production plans sink skewed joins straight to
      // output or re-shuffle explicitly
      val j = left.hint("merge")
        .join(right.hint("merge"), col("k") === col("rk"))
      j.collect() // a plain result stage imposes no distribution
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "AQE must mark the skewed SMJ side for runtime splitting\n" +
          plan.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q97 LSH band join carries narrow keys only — no token arrays " +
    "in the band shuffle or candidate distinct") {
    import org.apache.spark.sql.catalyst.plans.logical
    val df = SparkEntry.queries("q97_minhash_full")(spark, sf)
    val bandJoins = df.queryExecution.optimizedPlan.collect {
      case j: logical.Join if j.condition.exists(
          _.references.exists(_.name == "band")) => j
    }
    assert(bandJoins.nonEmpty, "band equi-join missing from the plan")
    bandJoins.foreach { j =>
      val carried = j.children.flatMap(_.output).map(_.name)
      assert(!carried.exists(_.startsWith("tok")),
        s"band join must not shuffle token payloads, carries: $carried")
    }
    // the candidate dedup must also be over the narrow pair, not arrays
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: logical.Aggregate
          if a.groupingExpressions.nonEmpty &&
            a.references.exists(_.name == "a_id") &&
            a.groupingExpressions.length == a.aggregateExpressions.length =>
        a
    }
    aggs.foreach { a =>
      assert(!a.output.map(_.name).exists(_.startsWith("tok")),
        s"distinct must be narrow-key, got ${a.output.map(_.name)}")
    }
  }

  test("q176 CTE frames materialize once: both channels read the " +
    "frequent-parts and best-customers sets through exchange reuse") {
    val p = finalPlan("q176_cte_reuse")
    // the two channel branches consume identical freqParts/bestCust
    // subtrees; ReuseExchange (or AQE's stage reuse) must dedupe them
    // rather than recompute the aggregations per branch
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      p.take(3000))
  }

  test("q177 per-channel top-10 pushes down via WindowGroupLimit") {
    val p = finalPlan("q177_channel_rankings")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("q178 dims broadcast; the fact is shuffled only once (grouped " +
    "frame feeds both window passes)") {
    val p = finalPlan("q178_yoy_share")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("SortMergeJoin"), "dims must broadcast, not SMJ")
  }

  test("q192 rolling metrics run as a time-interval RANGE frame, not " +
    "a rows frame") {
    val p = finalPlan("q192_window_time_range")
    assert(p.contains("RangeFrame"), p.take(2000))
    assert(p.contains("INTERVAL '-10' MINUTE"), p.take(2000))
  }

  test("q193 dims broadcast and the moving average is a centered " +
    "3-row frame over the grouped series") {
    val p = finalPlan("q193_moving_avg")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("SortMergeJoin"), "dims must broadcast, not SMJ")
    assert(p.contains("specifiedwindowframe(RowFrame, -1, 1)"),
      p.take(3000))
  }

  test("q194 the yearly-spend aggregate materializes once: the " +
    "self-join's second side reads through exchange reuse") {
    val p = finalPlan("q194_yoy_growth")
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      p.take(3000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1,
      "customer dim must broadcast\n" + p.take(3000))
  }

  test("q195 channels full-outer join at customer grain (aggregates " +
    "join, not facts)") {
    val p = finalPlan("q195_channel_fullouter")
    assert(p.contains("FullOuter"), p.take(3000))
    // both sides aggregate before the join: partial aggregation must
    // appear below the join in the plan
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      p.take(3000))
  }

  test("q199 correlated LATERAL top-k decorrelates to a window rank " +
    "(one fact pass), never a per-outer-row nested loop") {
    val p = finalPlan("q199_lateral_topk")
    assert(p.contains("Window"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "lateral must decorrelate, not re-execute per order\n" + p.take(3000))
    // AQE repeats the tree under "== Initial Plan ==" — count scans in
    // the executed section only: one orders scan + one lineitem scan
    val fin = p.split("== Initial Plan ==").head
    assert("FileScan".r.findAllIn(fin).size == 2, fin.take(3000))
  }

  test("q200 waiting-suppliers collapses the EXISTS/NOT-EXISTS self-" +
    "join pair into one grouped pass (shared subtree reused, supplier " +
    "broadcast, no nested-loop)") {
    val p = finalPlan("q200_waiting_suppliers")
    // the (orderkey, suppkey) late-flag aggregate feeds both the
    // waiting-line filter and the per-order census; its exchange must
    // materialize once
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      p.take(3000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1,
      "supplier dim must broadcast\n" + p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(3000))
  }

  test("q201 existence-flag census: EXISTS probes fold into one " +
    "grouped pass, dims broadcast") {
    val p = finalPlan("q201_customer_segments")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(3000))
    assert(!p.contains("SortMergeJoin"), "dims must broadcast, not SMJ")
    assert(p.contains("partial_count") || p.contains("partial_max"),
      p.take(3000))
  }

  test("q202 interval-overlap join runs as an equi-join on the bin " +
    "(canonical-bin dedup), never a nested loop over interval pairs") {
    val p = finalPlan("q202_interval_overlap")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "keyless interval overlap must bin-join, not BNLJ\n" + p.take(3000))
    // the bin equi-join is a hash/merge join; the left-restore join on
    // p_id is a second equi-join — at least two, all equi
    assert("HashJoin|SortMergeJoin".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("q203 two-fact cumulative comparison: channels aggregate " +
    "before the FULL OUTER join, dims broadcast") {
    val p = finalPlan("q203_cumulative_fullouter")
    assert(p.contains("FullOuter"), p.take(3000))
    assert(p.contains("partial_sum"),
      "facts must aggregate below the join\n" + p.take(3000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4,
      "customer/nation and supplier/nation dims must broadcast\n" +
        p.take(3000))
  }

  test("q204 band census collapses 8 scalar-subquery counts into ONE " +
    "fact scan with conditional aggregation") {
    val p = finalPlan("q204_band_census")
    val fin = p.split("== Initial Plan ==").head
    assert("FileScan".r.findAllIn(fin).size == 1,
      "one pass over lineitem, not 8\n" + fin.take(3000))
    assert(p.contains("partial_sum"), p.take(3000))
    assert(!p.contains("Join"), "no joins — a single-pass census\n" +
      p.take(3000))
  }

  test("q205 sessionization reuses ONE user_id shuffle for both " +
    "window passes and the session aggregate") {
    val p = finalPlan("q205_sessionize")
    val fin = p.split("== Initial Plan ==").head
    // lag + cumsum + final groupBy are all user_id-keyed: exactly one
    // hashpartitioning exchange in the executed plan
    assert("Exchange hashpartitioning".r.findAllIn(fin).size == 1,
      "all three passes must share the user_id exchange\n" +
        fin.take(3000))
    assert(p.contains("Window"), p.take(3000))
  }

  test("q212 cov-anomaly: the qualifying frame aggregates once and " +
    "self-joins through exchange reuse — one fact scan") {
    val p = finalPlan("q212_cov_anomaly")
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      p.take(3000))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      p.take(3000))
    val fin = p.split("== Initial Plan ==").head
    assert("FileScan".r.findAllIn(fin).size == 1,
      "lineitem must scan once\n" + fin.take(3000))
  }

  test("q209 gap-fill builds its calendar spine in-plan and " +
    "carry-forwards in one window pass (fact collapses before the " +
    "spine join)") {
    val p = finalPlan("q209_gap_fill")
    assert(p.contains("Window"), p.take(3000))
    // the monthly aggregate must form below the spine's left join
    assert(p.contains("partial_sum"), p.take(3000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "customer/nation dims must broadcast\n" + p.take(3000))
  }

  test("q210 cohort retention joins at user grain and broadcasts " +
    "cohort sizes — no fact-sized shuffle after the grouped passes") {
    val p = finalPlan("q210_cohort_retention")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1,
      "sizes must broadcast onto cells\n" + p.take(3000))
    assert(p.contains("partial_min") || p.contains("partial_count"),
      "first-touch pass must partial-aggregate\n" + p.take(3000))
  }

  test("q207 NOT IN plans the null-aware anti join fast path, not a " +
    "nested loop") {
    val p = finalPlan("q207_not_in_nullaware")
    // the isNullAwareAntiJoin flag prints as the trailing boolean on the
    // BHJ line: "BroadcastHashJoin [...], [...], LeftAnti, BuildRight, true"
    assert("LeftAnti, Build(Right|Left), true".r.findFirstIn(p).isDefined,
      "single-column NOT IN must take the hashed null-aware path\n" +
        p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("q206 heavy hitters: sketch pass reduces map-side (partial " +
    "agg), candidates broadcast back, no full-vocabulary shuffle " +
    "before candidate pruning") {
    val p = finalPlan("q206_heavy_hitters")
    assert(p.contains("ObjectHashAggregate"),
      "MG sketch is a TypedImperativeAggregate\n" + p.take(3000))
    assert(p.contains("partial_misra_gries"),
      "sketch must partial-aggregate before its single-row shuffle\n" +
        p.take(3000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 1,
      "candidate set must broadcast onto the token stream\n" +
        p.take(3000))
  }

  test("q216 late shipments: date-offset theta rides the orderkey equi " +
    "hash join; dims broadcast; never a nested loop") {
    val p = finalPlan("q216_late_shipments")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "theta must stay inside the equi join\n" + p.take(3000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "supplier and nation must broadcast\n" + p.take(3000))
  }

  test("q217 cross-channel INTERSECT restricts the fact via a semi " +
    "join (no row duplication)") {
    val p = finalPlan("q217_cross_channel_items")
    assert(p.contains("LeftSemi"), p.take(3000))
  }

  test("q215 duplicate-mass signals partial-aggregate the " +
    "high-cardinality (doc, gram) level map-side") {
    val p = finalPlan("q215_repetition_quality")
    assert(p.contains("partial_count"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(3000))
  }

  test("q232 disjunctive dim filter is PUSHED to the parquet scan as " +
    "an Or() and the filtered dim broadcasts") {
    val p = finalPlan("q232_disjunctive_dim")
    assert(p.contains("PushedFilters: [Or(") ||
      """PushedFilters: \[.*Or\(""".r.findFirstIn(p).isDefined,
      "disjunction must reach the scan\n" + p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("q233 returns netting aggregates the returns side to order " +
    "grain BEFORE the left join (partial agg below the join)") {
    val p = finalPlan("q233_returns_netting")
    assert(p.contains("LeftOuter"), p.take(3000))
    assert(p.contains("partial_sum"), p.take(3000))
  }

  test("q241 existence census keeps literal semi AND anti joins with " +
    "key-only probe sides") {
    val p = finalPlan("q241_existence_census")
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(p.contains("LeftAnti"), p.take(3000))
  }

  test("q226 z-order box predicate pushes into the clustered scan") {
    val p = finalPlan("q226_zorder_box")
    assert(
      """PushedFilters: \[[^\]]*GreaterThanOrEqual\(l_partkey""".r
        .findFirstIn(p).isDefined, p.take(3000))
  }

  test("q239 repeat buyers: ONE fact pass — the year-conditional " +
    "census partial-aggregates below the dim joins (r20 fusion of the " +
    "former two-leg self-pair), no fact-x-fact join anywhere") {
    val p = finalPlan("q239_repeat_buyers")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // both year sums partial-aggregate map-side in the single census
    assert("partial_sum".r.findAllIn(p).size >= 2, p.take(3000))
    // the fusion's point: exactly one lineitem scan feeds the query
    val finalSection = p.split("== Initial Plan ==").head
    assert(finalSection.split('\n')
      .count(l => l.contains("FileScan parquet") &&
        l.contains("lineitem")) === 1, finalSection.take(3000))
  }

  test("q385 rank alignment: both global ranks ride PartitionSweep " +
    "over ONE range exchange each, and the rank-pair join broadcasts " +
    "(position-independent — the near-equal legs' build side is an " +
    "AQE coin flip)") {
    // count in the FINAL section only (the AQE string repeats the
    // plan under "== Initial Plan ==")
    val p = finalPlan("q385_rank_align").split("== Initial Plan ==").head
    assert("PartitionSweep".r.findAllIn(p).size == 2, p.take(3000))
    assert("Exchange rangepartitioning".r.findAllIn(p).size >= 2,
      p.take(3000))
    assert(!p.contains("windowspecdefinition"),
      "global rank must not ride a window\n" + p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("hashpartitioning(_pp_id"),
      "prefix path must not re-shuffle on _pp_id\n" + p.take(3000))
  }

  test("q274 joins a partitioned file source with RUNTIME partition " +
    "pruning (dynamicpruningexpression in the scan)") {
    val p = finalPlan("q274_dpp")
    assert(p.toLowerCase.contains("dynamicpruning"),
      "DPP must reach the partitioned scan\n" + p.take(3000))
  }

  test("q249 probe read prunes index PARTITIONS (literal cell filter) " +
    "and returns exactly q111's answer") {
    val df = SparkEntry.queries("q249_ann_partitioned_index")(spark, sf)
    val rows = df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*cell""".r.findFirstIn(p).isDefined,
      "cell IN (...) must prune index directories\n" + p.take(3000))
    val q111 = SparkEntry.queries("q111_ann_ivf")(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == q111.map(_.toString).toSeq,
      "physical layout must not change the ANN answer")
  }

  test("q305 BM25 broadcasts df + corpus stats; the corpus never joins " +
    "a fact-sized side") {
    val p = finalPlan("q305_bm25_search")
    assert(p.contains("BroadcastHashJoin"),
      "term-df join must broadcast\n" + p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "1-row corpus stats must broadcast-cross\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q306 covariance matrix is ONE corpus scan with map-side partial " +
    "covar accumulators, no joins") {
    val p = finalPlan("q306_embedding_covariance")
    assert(!p.contains("Join"), "no self-join/explode-rejoin\n" + p.take(2000))
    val finalSection = p.split("== Initial Plan ==")(0)
    assert("FileScan".r.findAllIn(finalSection).size == 1,
      "exactly one corpus scan\n" + p.take(2000))
    assert(p.contains("partial_covar_pop"),
      "covar must partial-aggregate map-side\n" + p.take(2000))
  }

  test("q316 OR-join rewrite plans two hash joins — never the " +
    "nested-loop the literal OR predicate forces") {
    val p = finalPlan("q316_or_join_union")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      "each OR branch must run as its own equi-join\n" + p.take(2000))
  }

  test("q312 ppjoin candidates come from an equi self-join on prefix " +
    "tokens — never a cartesian all-pairs") {
    val p = finalPlan("q312_ppjoin_exact")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "the all-pairs comparison must not materialize\n" + p.take(2000))
  }

  test("q308 above-group-average decorrelates: fact aggregates to " +
    "customer grain first, nation average broadcasts back") {
    val p = finalPlan("q308_above_avg_returns")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "nation dim + nation-average census must broadcast\n" + p.take(2000))
    assert(p.contains("partial_sum"),
      "returns must partial-aggregate map-side\n" + p.take(2000))
  }

  test("q310 WOE binning assigns bins map-side from broadcast " +
    "boundaries — no global ntile window") {
    val p = finalPlan("q310_woe_binning")
    assert(!p.contains("WindowExec") && !p.contains("RunningWindow"),
      "no fact-wide window allowed\n" + p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin"),
      "decile boundaries must broadcast\n" + p.take(2000))
  }

  test("q307 skyline runs the staircase on domain-sized aggregates — " +
    "no dominance self-join") {
    val p = finalPlan("q307_skyline")
    assert(!p.contains("Join"),
      "staircase rewrite must eliminate the NOT EXISTS join\n" + p.take(2000))
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      p.take(2000))
  }
}
