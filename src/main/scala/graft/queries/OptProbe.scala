package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage-level profiler for the optimization rounds: times the
  * sub-stages of the heavy bench queries (edge generation, candidate
  * generation, CC loop, ...) so optimization effort lands where the
  * seconds are. Not part of the library surface; never run by the
  * driver. Usage: runMain graft.queries.OptProbe <sfDir> <probe>
  */
object OptProbe {
  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val probe = if (args.length > 1) args(1) else "triangle"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-optprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    try graft.SparkEntry.queries("q1_agg")(spark, dir).count()
    catch { case _: Throwable => }

    probe match {
      case "triangle" => triangle(spark, dir)
      case "dedup" => dedup(spark, dir)
      case "semantic" => semantic(spark, dir)
      case "lp" => lp(spark, dir)
      case "q" =>
        // jobs/stages/tasks of ONE named query, two passes (pass 1
        // authors memoized fixtures; pass 2 is the bench-comparable
        // read-only shape)
        val name = args(2)
        val fn = graft.SparkEntry.queries(name)
        for (pass <- 1 to 2)
          jobStats(spark, s"p$pass $name")(fn(spark, dir).count())
      case "survey" =>
        // jobs/stages/tasks per bench query — outliers are where fixed
        // scheduling overhead (not data) is the cost at this scale.
        // Two passes: memoized-fixture queries author on pass 1, so
        // pass 2 is the bench-comparable (read-only) shape.
        for (pass <- 1 to 2) {
          println(s"--- survey pass $pass")
          graft.Bench.headline.foreach { q =>
            graft.SparkEntry.queries.get(q).foreach { fn =>
              try jobStats(spark, s"p$pass $q")(fn(spark, dir).count())
              catch { case e: Throwable => println(s"FAILED $q") }
            }
          }
        }
      case _ => println(s"unknown probe $probe")
    }
    spark.stop()
  }

  /** Current (self-join) co-purchase edge builder — copy of
    * Analytics4.coPurchaseEdges for A/B timing. */
  private def edgesSelfJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.df(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
    li.toDF("ok", "pa")
      .join(li.toDF("ok2", "pb"),
        col("ok") === col("ok2") && col("pa") < col("pb"))
      .select(col("pa").as("u"), col("pb").as("v")).distinct()
  }

  /** Candidate rewrite: one groupBy collects each order's distinct part
    * set, pairs explode from the sorted array — one lineitem shuffle
    * instead of two + join. */
  private def edgesGrouped(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.df(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
    li.groupBy(col("ok"))
      .agg(array_sort(collect_set(col("p"))).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps) - i - 1), " +
          "y -> struct(x AS u, y AS v))))")).as("e"))
      .select(col("e.u"), col("e.v")).distinct()
  }

  private def triangle(s: SparkSession, dir: String): Unit = {
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val e1 = timed("edges selfjoin+checkpoint") {
        edgesSelfJoin(s, dir).localCheckpoint()
      }
      timed("edges count")(println("n=" + e1.count()))
      val e2 = timed("edges grouped+checkpoint") {
        edgesGrouped(s, dir).localCheckpoint()
      }
      timed("edges grouped count")(println("n=" + e2.count()))
      // --- triangleStats internals, stage by stage (mirror of
      // Analytics4.triangleStats) on the checkpointed edge list
      val e = e1
      val deg = e.select(col("u").as("x"))
        .union(e.select(col("v").as("x")))
        .groupBy(col("x")).agg(count(lit(1)).as("d"))
      timed("deg count")(println("n=" + deg.count()))
      val o = e
        .join(broadcast(deg.toDF("xu", "du")), col("u") === col("xu"))
        .join(broadcast(deg.toDF("xv", "dv")), col("v") === col("xv"))
        .select(
          when(col("du") <= col("dv"), col("u")).otherwise(col("v"))
            .as("src"),
          when(col("du") <= col("dv"), col("v")).otherwise(col("u"))
            .as("dst"))
      val oc = timed("orient+checkpoint")(o.localCheckpoint())
      val wedges = oc.toDF("s1", "x")
        .join(oc.toDF("s2", "y").hint("shuffle_hash"),
          col("s1") === col("s2") && col("x") < col("y"))
        .select(col("x"), col("y"))
      timed("wedges count")(println("n=" + wedges.count()))
      val nTri = wedges
        .join(e.hint("shuffle_hash"),
          col("x") === col("u") && col("y") === col("v"), "leftsemi")
        .agg(count(lit(1)).as("n_triangles"))
      timed("wedges+close")(println(nTri.collect().mkString))
      // grouped wedge generation: one shuffle of o + pair explode
      val wedges2 = oc.groupBy(col("src"))
        .agg(array_sort(collect_list(col("dst"))).as("ns"))
        .select(explode(expr(
          "flatten(transform(ns, (a, i) -> " +
            "transform(slice(ns, i + 2, size(ns) - i - 1), " +
            "b -> struct(a AS x, b AS y))))")).as("w"))
        .select(col("w.x"), col("w.y"))
      val nTri2 = wedges2
        .join(e.hint("shuffle_hash"),
          col("x") === col("u") && col("y") === col("v"), "leftsemi")
        .agg(count(lit(1)).as("n_triangles"))
      timed("wedges2+close (grouped)")(println(nTri2.collect().mkString))
      // Bloom prefilter on the close (guide §3.2): drop wedges whose
      // (x, y) key can't be a canonical edge BEFORE the exchange
      val nTri3 = timed("bloom build+filter+close") {
        val m = e.count()
        val bf = e.stat.bloomFilter(xxhash64(col("u"), col("v")), m, 0.01)
        val bfB = s.sparkContext.broadcast(bf)
        val mightContain = udf((h: Long) => bfB.value.mightContainLong(h))
        val pre = wedges.filter(mightContain(xxhash64(col("x"), col("y"))))
        val n = pre.join(e.hint("shuffle_hash"),
            col("x") === col("u") && col("y") === col("v"), "leftsemi")
          .agg(count(lit(1)).as("n_triangles")).collect()
        println("preFiltered close " + n.mkString)
        n
      }
      timed("triangleStats given edges") {
        Analytics4.triangleStats(e1).collect().foreach(println)
      }
    }
  }

  private def dedup(s: SparkSession, dir: String): Unit = {
    val docs = Tables.df(s, dir, "documents")
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val pairs = timed("verifiedPairs+checkpoint") {
        Pipeline3.verifiedPairs(docs).localCheckpoint()
      }
      timed("pairs count")(println("n=" + pairs.count()))
      val edges = pairs
        .select(col("a_id").as("src"), col("b_id").as("dst"))
        .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      val labels = timed("connectedComponents") {
        Pipeline3.connectedComponents(edges)
      }
      timed("labels count")(println("n=" + labels.count()))
      jobStats(s, "cc (current)") {
        Pipeline3.connectedComponents(edges).count()
      }
      jobStats(s, "ccQuad") {
        ccQuad(edges).count()
      }
      val qDf = ccQuad(edges)
      val diffQ = labels.toDF("n1", "r1").join(qDf.toDF("n2", "r2"),
        col("n1") === col("n2") && col("r1") === col("r2"), "full_outer")
        .filter(col("n1").isNull || col("n2").isNull).count()
      println(s"cc-vs-ccQuad mismatches=$diffQ")
      timed("full q129") {
        graft.SparkEntry.queries("q129_dedup_pipeline")(s, dir).count()
      }
    }
  }

  /** Count jobs/stages/tasks launched while `f` runs. */
  private def jobStats[T](s: SparkSession, label: String)(f: => T): T = {
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(
          st: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(st.stageInfo.numTasks)
      }
    }
    s.sparkContext.addSparkListener(l)
    val r = timed(label)(f)
    Thread.sleep(500)
    s.sparkContext.removeSparkListener(l)
    println(s"STATS $label jobs=${jobs.get} stages=${stages.get} " +
      s"tasks=${tasks.get}")
    r
  }

  private def semantic(s: SparkSession, dir: String): Unit = {
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      val pairs = jobStats(s, "semanticVerifiedPairs+checkpoint") {
        Similarity.semanticVerifiedPairs(s, dir).localCheckpoint()
      }
      timed("pairs count")(println("n=" + pairs.count()))
      val edges = pairs
        .select(col("a_id").as("src"), col("b_id").as("dst"))
        .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      jobStats(s, "cc over pairs") {
        Pipeline3.connectedComponents(edges).count()
      }
      jobStats(s, "ccLazy over pairs") {
        ccLazy(edges).count()
      }
      jobStats(s, "ccAqeOff over pairs") {
        ccAqeOff(edges).count()
      }
      val offDf = ccAqeOff(edges)
      val aOff = Pipeline3.connectedComponents(edges)
      val diffOff = aOff.toDF("n1", "r1").join(offDf.toDF("n2", "r2"),
        col("n1") === col("n2") && col("r1") === col("r2"), "full_outer")
        .filter(col("n1").isNull || col("n2").isNull).count()
      println(s"cc-vs-ccAqeOff mismatches=$diffOff")
      jobStats(s, "ccQuad over pairs") {
        ccQuad(edges).count()
      }
      val qDf = ccQuad(edges)
      val aQ = Pipeline3.connectedComponents(edges)
      val diffQ = aQ.toDF("n1", "r1").join(qDf.toDF("n2", "r2"),
        col("n1") === col("n2") && col("r1") === col("r2"), "full_outer")
        .filter(col("n1").isNull || col("n2").isNull).count()
      println(s"cc-vs-ccQuad mismatches=$diffQ")
      // equivalence: same (node -> root) map
      val aDf = Pipeline3.connectedComponents(edges)
      val bDf = ccLazy(edges)
      val diff = aDf.toDF("n1", "r1").join(bDf.toDF("n2", "r2"),
        col("n1") === col("n2") && col("r1") === col("r2"), "full_outer")
        .filter(col("n1").isNull || col("n2").isNull).count()
      println(s"cc-vs-ccLazy mismatches=$diff")
      jobStats(s, "full q133") {
        graft.SparkEntry.queries("q133_semantic_dedup")(s, dir).count()
      }
    }
  }

  /** Prototype: connectedComponents with LAZY localCheckpoints — the
    * labelSum convergence probe doubles as the materialization action,
    * one job per round instead of checkpoint-count + sum. */
  private def ccLazy(edgesIn: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val edges = edgesIn.repartition(col("src")).localCheckpoint(false)
    def labelSum(df: DataFrame): BigDecimal = {
      val r = df.agg(sum(col("root").cast(DecimalType(38, 0))).as("s"))
        .head()
      if (r.isNullAt(0)) BigDecimal(0) else BigDecimal(r.getDecimal(0))
    }
    var labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("mn"))
      .select(col("src").as("node"),
        least(col("mn"), col("src")).as("root"))
      .localCheckpoint(false)
    var prev: BigDecimal = null
    var cur = labelSum(labels)
    var iters = 0
    val maxIters = 64
    while ((prev == null || cur < prev) && iters < maxIters) {
      val hopped = edges.join(labels.hint("shuffle_hash"),
          edges("src") === labels("node"))
        .select(col("dst").as("node"), col("root"))
        .union(labels)
        .groupBy(col("node")).agg(min(col("root")).as("root"))
      val byNode = hopped
        .select(col("node").as("r_node"), col("root").as("r_root"))
      val next = hopped.join(byNode.hint("shuffle_hash"),
          hopped("root") === byNode("r_node"))
        .select(col("node"), least(col("root"), col("r_root")).as("root"))
        .localCheckpoint(false)
      prev = cur
      cur = labelSum(next) // materializes next's checkpoint blocks
      freeCk(labels)
      labels = next
      iters += 1
    }
    freeCk(edges)
    println(s"ccLazy iters=$iters")
    labels
  }

  /** Prototype: lazy CC with TWO shortcut hops per round (pointer
    * quadrupling) — fewer rounds on chain-y graphs at +1 label-sized
    * exchange per round. */
  private def ccQuad(edgesIn: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val edges = edgesIn.repartition(col("src")).localCheckpoint(false)
    def labelSum(df: DataFrame): BigDecimal = {
      val r = df.agg(sum(col("root").cast(DecimalType(38, 0))).as("s"))
        .head()
      if (r.isNullAt(0)) BigDecimal(0) else BigDecimal(r.getDecimal(0))
    }
    def shortcut(df: DataFrame): DataFrame = {
      val byNode = df.select(col("node").as("r_node"),
        col("root").as("r_root"))
      df.join(byNode.hint("shuffle_hash"), df("root") === byNode("r_node"))
        .select(col("node"), least(col("root"), col("r_root")).as("root"))
    }
    var labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("mn"))
      .select(col("src").as("node"),
        least(col("mn"), col("src")).as("root"))
      .localCheckpoint(false)
    var prev: BigDecimal = null
    var cur = labelSum(labels)
    var iters = 0
    while ((prev == null || cur < prev) && iters < 64) {
      val hopped = edges.join(labels.hint("shuffle_hash"),
          edges("src") === labels("node"))
        .select(col("dst").as("node"), col("root"))
        .union(labels)
        .groupBy(col("node")).agg(min(col("root")).as("root"))
      val next = shortcut(shortcut(hopped)).localCheckpoint(false)
      prev = cur
      cur = labelSum(next)
      freeCk(labels)
      labels = next
      iters += 1
    }
    freeCk(edges)
    println(s"ccQuad iters=$iters")
    labels
  }

  /** Prototype: the CC loop with AQE disabled for the loop's own jobs
    * only (VERDICT r20 item 5 — the residual ~7 jobs/round is AQE
    * re-planning per tiny stage). The final labels are materialized
    * checkpoint blocks, so downstream consumers see a LogicalRDD and
    * the restored conf. */
  private def ccAqeOff(edgesIn: DataFrame): DataFrame = {
    val s = edgesIn.sparkSession
    val prev = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try ccLazy(edgesIn)
    finally s.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def freeCk(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))

  private def lp(s: SparkSession, dir: String): Unit = {
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      timed("full q258") {
        graft.SparkEntry.queries("q258_label_propagation")(s, dir).count()
      }
    }
  }
}
