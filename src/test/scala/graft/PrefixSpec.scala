package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DistributedPrefix

/** DistributedPrefix must be bit-identical to the single-partition
  * window it replaces (q353/q358/q359 scale-killer fix), including on
  * tied keys and across partition boundaries. */
class PrefixSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("prefixSum matches single-partition running sum (with ties)") {
    // keys deliberately collide (k % 7) so ties span values; value
    // varies so order errors would surface in the prefix
    val df = (1 to 5000)
      .map(i => ((i * 37) % 7, (i * 13) % 11, (i % 5) - 2L))
      .toDF("k1", "k2", "v")
    val single = df.withColumn("ps",
      sum(col("v")).over(Window.orderBy(col("k1"), col("k2"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val dist = DistributedPrefix.prefixSum(
      df, Seq(col("k1"), col("k2")), col("v"), "ps", numParts = 8)
    // ties share (k1,k2) so any tied rows' prefix sets are permuted;
    // compare the MULTISET of (k1,k2,v,ps) rows
    val a = single.groupBy("k1", "k2", "v", "ps").count()
    val b = dist.groupBy("k1", "k2", "v", "ps").count()
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("globalRank matches row_number under a total order") {
    val df = (1 to 3000).map(i => ((i * 7919) % 100003, i.toLong))
      .toDF("x", "id")
    val single = df.withColumn("r",
      row_number().over(Window.orderBy(col("x"), col("id")))
        .cast("long"))
    val dist = DistributedPrefix.globalRank(
      df, Seq(col("x"), col("id")), "r", numParts = 8)
    assert(single.except(dist).isEmpty && dist.except(single).isEmpty)
  }

  test("globalRank supports descending keys") {
    val df = (1 to 1000).map(i => ((i * 31) % 97, i.toLong))
      .toDF("x", "id")
    val single = df.withColumn("r",
      row_number().over(Window.orderBy(col("x").desc, col("id")))
        .cast("long"))
    val dist = DistributedPrefix.globalRank(
      df, Seq(col("x").desc, col("id")), "r", numParts = 8)
    assert(single.except(dist).isEmpty && dist.except(single).isEmpty)
  }

  test("sweepLine matches single-window live + lead across partitions") {
    // interval boundaries with coinciding instants: delta -1 sorts
    // before +1 at equal t, and partition edges must not lose t_next
    val bounds = (1 to 2000).flatMap { i =>
      val t0 = (i * 97) % 500L
      Seq((t0, 1L), (t0 + 1 + (i % 40), -1L))
    }.toDF("t", "delta")
    val w = Window.orderBy(col("t"), col("delta"))
    val single = bounds
      .withColumn("live", sum(col("delta")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("t_next", lead(col("t"), 1).over(w))
    val dist = DistributedPrefix.sweepLine(
      bounds, col("t"), col("delta"), numParts = 8)
    // tied (t,delta) rows permute freely in both plans; compare the
    // quantities downstream consumers use: per-(t,delta) live multiset
    // and the segment sums
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("t", "delta", "live").count()
    assert(canon(single).except(canon(dist)).isEmpty &&
      canon(dist).except(canon(single)).isEmpty)
    def segs(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("t_next").isNotNull)
      .agg(sum(col("live") * (col("t_next") - col("t"))).as("occ"),
        sum(when(col("live") >= 1, col("t_next") - col("t"))
          .otherwise(0L)).as("uni"))
      .head()
    assert(segs(single) == segs(dist))
  }

  test("prefixSum plans exactly one full-data exchange (native operator)") {
    val df = (1 to 2000).map(i => ((i * 37) % 101, (i % 5) - 2L))
      .toDF("k", "v")
    val dist = DistributedPrefix.prefixSum(
      df, Seq(col("k")), col("v"), "ps", numParts = 8)
    dist.collect()
    // the AQE string repeats the plan under "== Initial Plan ==" —
    // count exchanges in the FINAL section only
    val plan = dist.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("PartitionSweep"), s"no native operator:\n$plan")
    val exchanges = "Exchange (\\w+)".r.findAllMatchIn(plan)
      .map(_.group(1)).toList
    assert(exchanges == List("rangepartitioning"),
      s"expected exactly one range exchange, got $exchanges:\n$plan")
    assert(!plan.contains("windowspecdefinition"),
      s"prefix path still rides a window:\n$plan")
    // the Long-valued census must ride BELOW the partition-local sort
    // (one sort total, not two) — prove the bypass engages rather than
    // silently falling back to re-sorting
    val aqe = dist.queryExecution.executedPlan
      .asInstanceOf[org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec]
    // query stages are leaf nodes to collect() — descend through them
    def sweeps(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[graft.plans.PartitionSweepExec] = {
      val here = p match {
        case e: graft.plans.PartitionSweepExec => Seq(e)
        case _ => Nil
      }
      val kids = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(sweeps)
    }
    val found = sweeps(aqe.executedPlan)
    assert(found.nonEmpty && found.forall(_.censusBypassesSort),
      s"census does not bypass the sort:\n${aqe.executedPlan}")
  }

  test("roster-wide lint: no unpartitioned window over unbounded input") {
    // The scale contract, enforced over EVERY declared query's
    // optimized plan, walked as a TREE (a Window node with an empty
    // partitionSpec is a single-partition global window — no string
    // matching, so oddly-printed attribute names can't slip through).
    // Such a window is only allowed when its input grain is provably
    // bounded: a declared bounded-grain ordering column listed below.
    // Everything else must ride DistributedPrefix (now the native
    // PartitionSweepExec — zero windows) / orderBy().limit() /
    // percentile bucketing. (q375/q338/q371/q367 were the round-10
    // escapees this lint makes structurally impossible.)
    // Every entry names the ordering attribute(s) a query's global
    // window may legitimately ride, with WHY the input grain is
    // bounded (does not grow with corpus row count):
    // "<no-order>" marks an ORDER-less global window (sum(x) OVER ()
    // share-of-total) — still single-partition, allowed only on the
    // same bounded-grain proof. The old regex lint never saw these;
    // the tree walk does.
    val boundedGrain: Map[String, Set[String]] = Map(
      // ~30 log2 length buckets post-aggregation
      "q183_length_histogram" -> Set("<no-order>"),
      // nation grain (25 rows) post-aggregation
      "q328_hierarchy_shares" -> Set("<no-order>"),
      // exactly 3 storage tiers post-aggregation
      "q384_storage_tiering" -> Set("<no-order>"),
      // calendar-date grain — rows bounded by the date span, not data
      "q152_cumulative_compare" -> Set("d"),
      // input is the post-orderBy().limit(50) sample — 50 rows
      "q259_weighted_sample" -> Set("key"),
      // staircase runs on the distinct (price) domain, dimension-sized
      "q307_skyline" -> Set("price"),
      // month grain
      "q320_seasonal_decompose" -> Set("m"),
      "q327_cusum_changepoint" -> Set("m"),
      // fixed vocab-growth checkpoints
      "q337_vocab_growth" -> Set("checkpoint"),
      // exactly 10 deciles
      "q338_gains_table" -> Set("decile"),
      // distinct event-time (date) grain of the survival table
      "q344_kaplan_meier" -> Set("t"),
      // minute-of-span time buckets
      "q346_burst_detection" -> Set("minute"),
      // fixed histogram bins
      "q352_binned_ks" -> Set("bkt"),
      // nation grain (25 rows)
      "q361_largest_remainder" -> Set("rem"),
      // stratum grain
      "q372_neyman_allocation" -> Set("rem"))
    val broken = scala.collection.mutable.ListBuffer.empty[String]
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        scala.util.Try(fn(spark, sf).queryExecution.optimizedPlan) match {
          case scala.util.Failure(e) =>
            // a query that cannot even build its plan must FAIL the
            // lint, not silently dodge it
            broken += s"$name: ${e.getMessage}"
            Nil
          case scala.util.Success(plan) =>
            plan.collect {
              case w: org.apache.spark.sql.catalyst.plans.logical.Window
                  if w.partitionSpec.isEmpty =>
                val first = w.orderSpec.headOption
                  .flatMap(_.references.headOption).map(_.name)
                  .getOrElse("<no-order>")
                if (boundedGrain.getOrElse(name, Set.empty)
                    .contains(first)) None
                else Some(s"$name: global window ordered by $first")
              case w: org.apache.spark.sql.catalyst.plans.logical
                  .WindowGroupLimit if w.partitionSpec.isEmpty =>
                val first = w.orderSpec.headOption
                  .flatMap(_.references.headOption).map(_.name)
                  .getOrElse("<no-order>")
                if (boundedGrain.getOrElse(name, Set.empty)
                    .contains(first)) None
                else Some(s"$name: global window-group-limit by $first")
            }.flatten
        }
    }
    assert(broken.isEmpty,
      s"queries whose plans failed to build:\n${broken.mkString("\n")}")
    assert(offenders.isEmpty,
      s"unpartitioned windows over undeclared input:\n${offenders.mkString("\n")}")
  }

  test("q353/q358/q359 plans ride the native sweep, no global window") {
    // the scale contract: every Window in these plans must be keyed
    // (PARTITION BY); the global-order prefix work rides
    // PartitionSweepExec over the one range exchange
    for (q <- Seq("q353_gini_concentration", "q358_peak_concurrency",
        "q359_interval_coverage")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionSweep"),
        s"$q does not ride the native prefix operator:\n$plan")
      "windowspecdefinition\\(([^)]*)".r
        .findAllMatchIn(plan).map(_.group(1)).foreach { sp =>
          val first = sp.split(",").head.trim
          val orderFirst = first.contains(" ASC") || first.contains(" DESC")
          assert(!orderFirst,
            s"$q has an unpartitioned window: $sp")
        }
    }
  }
}
