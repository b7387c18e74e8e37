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

  test("roster-wide lint: no unpartitioned window over unbounded input") {
    // The scale contract, enforced over EVERY declared query's
    // optimized plan: a windowspecdefinition whose FIRST argument is a
    // sort item (prints with ASC/DESC) has no partition keys, i.e. it
    // is a single-partition global window. That is only allowed when
    // its input grain is provably bounded: the DistributedPrefix
    // offset census (_pp_id — one row per shuffle partition) or a
    // declared bounded-grain ordering column listed below. Everything
    // else must ride DistributedPrefix / orderBy().limit() /
    // percentile bucketing. (q375/q338/q371/q367 were the round-10
    // escapees this lint now makes structurally impossible.)
    // Every entry names the ordering attribute(s) a query's global
    // window may legitimately ride, with WHY the input grain is
    // bounded (does not grow with corpus row count):
    val boundedGrain: Map[String, Set[String]] = Map(
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
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val planTry = scala.util.Try(
          fn(spark, sf).queryExecution.optimizedPlan.toString)
        planTry.toOption.toSeq.flatMap { plan =>
          "windowspecdefinition\\(([^)]*)".r
            .findAllMatchIn(plan).map(_.group(1)).flatMap { sp =>
              val first = sp.split(",").head.trim
              val orderFirst =
                first.contains(" ASC") || first.contains(" DESC")
              val attr = first.takeWhile(c => c != ' ' && c != '#')
              val ok = !orderFirst || attr.startsWith("_pp_id") ||
                boundedGrain.getOrElse(name, Set.empty).contains(attr)
              if (ok) None else Some(s"$name: $sp")
            }
        }
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows over undeclared input:\n${offenders.mkString("\n")}")
  }

  test("q353/q358/q359 plans contain no unpartitioned fact window") {
    // the scale contract: every Window in these plans must either be
    // keyed (PARTITION BY) or run over the bounded per-partition
    // offset table (one row per shuffle partition)
    for (q <- Seq("q353_gini_concentration", "q358_peak_concurrency",
        "q359_interval_coverage")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // in a windowspecdefinition the partition columns print as bare
      // attributes while ordering items carry ASC/DESC — so a spec
      // whose FIRST argument is a sort item has no partition keys.
      // The only such window these plans may contain is the helper's
      // offset window over _pp_id (one row per shuffle partition).
      val specs = "windowspecdefinition\\(([^)]*)".r
        .findAllMatchIn(plan).map(_.group(1)).toList
      assert(specs.nonEmpty, s"$q plan shows no window specs:\n$plan")
      specs.foreach { sp =>
        val first = sp.split(",").head.trim
        val orderFirst = first.contains(" ASC") || first.contains(" DESC")
        assert(!orderFirst || first.startsWith("_pp_id"),
          s"$q has an unpartitioned non-offset window: $sp")
      }
    }
  }
}
