package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fifth analytics module: statistical-inference operators — the
  * deterministic bootstrap (resampling without randomness), a Benford
  * first-digit audit (the fraud/data-entry anomaly screen), and
  * Kaplan–Meier survival with right-censoring (time-to-event analytics).
  *
  * Determinism conventions as everywhere else: resample weights and
  * digit censuses are exact integers from salted md5 bytes, weighted
  * sums ride DECIMAL, and the one genuinely multiplicative estimator
  * (KM's survival product) runs as exp(Σ ln(·)) over an ORDERED window
  * so both engines accumulate in the same sequence.
  */
object Analytics5 extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic Poisson bootstrap CI for the mean order price —
    // the estimator a pipeline publishes WITH its error bars. Each of
    // B=20 resamples assigns every row an integer weight from a salted
    // md5 byte, mapped to {0,1,2,3} with Poisson(1)-approximating mass
    // (.368/.368/.184/.08) — the production-standard streaming
    // bootstrap, made reproducible: no RNG, so both engines draw the
    // IDENTICAL resamples. Per-resample means are exact-decimal
    // weighted sums; the CI is percentile_disc over the 20 means. The
    // explode is a bounded ×B blowup of ONE column, partial-aggregated
    // map-side.
    "q342_bootstrap_ci" -> { (s, dir) =>
      val o = Tables.df(s, dir, "orders")
        .select(col("o_orderkey").as("k"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("x"))
      val resampled = o
        .select(col("k"), col("x"),
          explode(sequence(lit(1), lit(20))).as("r"))
        .withColumn("b",
          conv(substring(md5(concat(lit("boot"), col("r"),
            lit("_"), col("k").cast(StringType))), 1, 2), 16, 10)
            .cast(LongType))
        .withColumn("w",
          when(col("b") < 94, 0L).when(col("b") < 188, 1L)
            .when(col("b") < 235, 2L).otherwise(3L))
      val means = resampled.groupBy(col("r"))
        .agg((sum(col("x") * col("w")).cast(DoubleType) /
          sum(col("w"))).as("mean_r"))
      val base = o.agg(count(lit(1)).as("n"),
        (sum(col("x")).cast(DoubleType) / count(lit(1))).as("mean"))
      means.agg(
          expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY mean_r)")
            .as("ci_lo"),
          expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY mean_r)")
            .as("ci_hi"))
        .crossJoin(broadcast(base))
        .select(col("n"), round(col("mean"), 2).as("mean"),
          round(col("ci_lo"), 2).as("ci_lo"),
          round(col("ci_hi"), 2).as("ci_hi"))
    },

    // Benford first-digit audit — the data-entry / fabrication screen
    // auditors run on money columns: observed leading-digit counts vs
    // the Benford expectation n·log10(1+1/d), with per-digit χ²
    // contributions. (TPC-ish uniform prices FAIL Benford loudly —
    // which is the point: the audit flags distributions that don't
    // arise from natural multiplicative processes.) Digit extraction
    // is string-based (no float log edge cases); counts exact.
    "q343_benford_audit" -> { (s, dir) =>
      val digits = Tables.df(s, dir, "orders")
        .select(substring(floor(col("o_totalprice")).cast(LongType)
          .cast(StringType), 1, 1).cast(IntegerType).as("d"))
        .groupBy(col("d")).agg(count(lit(1)).as("n_obs"))
      val tot = digits.agg(sum(col("n_obs")).as("n"))
      digits.crossJoin(broadcast(tot))
        .withColumn("exp_n",
          col("n") * log(10.0, lit(1.0) + lit(1.0) / col("d")))
        .select(col("d"), col("n_obs"), round(col("exp_n"), 2)
            .as("exp_n"),
          round(pow(col("n_obs") - col("exp_n"), 2) / col("exp_n"), 4)
            .as("chi2_part"))
        .orderBy(col("d"))
    },

    // Two-proportion z-test + sample-size calculator — the inference
    // layer on top of q324's A/B census: pooled-variance z statistic,
    // the |z| > 1.96 significance call, and the required per-arm n to
    // detect a 2-point lift at 80% power — the three numbers every
    // experiment review asks for. Counts exact; every statistic
    // derives from the same integers on both engines, so even the
    // ceil() in the power formula lands identically.
    "q355_ab_ztest" -> { (s, dir) =>
      val ev = Tables.df(s, dir, "events")
      val expo = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("exposure"))
      val fp = ev.filter(col("event_type") === "purchase")
        .join(expo, "user_id").filter(col("ts") > col("exposure"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("fp"))
      val per = expo.join(fp, Seq("user_id"), "left")
        .select(
          when(substring(md5(concat(lit("ab"),
            col("user_id").cast(StringType))), 1, 2) < "80", "A")
            .otherwise("B").as("variant"),
          (col("fp").isNotNull &&
            col("fp") <= col("exposure") + expr("INTERVAL 6 HOURS"))
            .as("conv"))
      val cells = per.groupBy(col("variant"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("conv"), 1L).otherwise(0L)).as("c"))
      val a = cells.filter(col("variant") === "A")
        .select(col("n").as("na"), col("c").as("ca"))
      val b = cells.filter(col("variant") === "B")
        .select(col("n").as("nb"), col("c").as("cb"))
      a.crossJoin(b)
        .withColumn("pa", col("ca").cast(DoubleType) / col("na"))
        .withColumn("pb", col("cb").cast(DoubleType) / col("nb"))
        .withColumn("pp",
          (col("ca") + col("cb")).cast(DoubleType) /
            (col("na") + col("nb")))
        .withColumn("z",
          (col("pa") - col("pb")) /
            sqrt(col("pp") * (lit(1.0) - col("pp")) *
              (lit(1.0) / col("na") + lit(1.0) / col("nb"))))
        .select(col("na"), col("nb"),
          round(col("pa"), 6).as("conv_a"),
          round(col("pb"), 6).as("conv_b"),
          round(col("z"), 4).as("z"),
          (abs(col("z")) > 1.96).as("significant"),
          ceil(lit(2.0) * col("pp") * (lit(1.0) - col("pp")) *
            lit((1.96 + 0.8416) * (1.96 + 0.8416)) / lit(0.0004))
            .cast(LongType).as("n_required"))
    },

    // Difference-in-differences — the causal-analytics workhorse for
    // "did the change move the metric beyond its trend": per-event
    // value means in the four (variant × pre/post) cells — post = at
    // or after the MEDIAN event date — with
    // DiD = (B_post−B_pre) − (A_post−A_pre).
    // Cell sums ride DECIMAL, each mean divides once, and the
    // estimate is three subtractions of deterministic doubles.
    "q356_diff_in_diff" -> { (s, dir) =>
      val ev = Tables.df(s, dir, "events")
      // cutoff = MEDIAN event date, so both periods are non-empty at
      // any fixture span (a fixed-interval cutoff empties 'pre' when
      // the data covers less than the interval)
      val withDays = ev.withColumn("days",
        datediff(col("ts").cast(DateType), to_date(lit("1970-01-01"))))
      val cutoff = withDays.agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY days)")
          .as("cut"))
      val cells = withDays.crossJoin(broadcast(cutoff))
        .select(
          when(substring(md5(concat(lit("ab"),
            col("user_id").cast(StringType))), 1, 2) < "80", "A")
            .otherwise("B").as("variant"),
          when(col("days") >= col("cut"), "post")
            .otherwise("pre").as("period"),
          col("value").cast(DecimalType(18, 2)).as("v"))
        .groupBy(col("variant"), col("period"))
        .agg(count(lit(1)).as("n"),
          (sum(col("v")).cast(DoubleType) / count(lit(1))).as("m"))
      def cell(v: String, p: String, nm: String) =
        cells.filter(col("variant") === v && col("period") === p)
          .select(col("n").as(s"n_$nm"), col("m").as(s"m_$nm"))
      cell("A", "pre", "a0").crossJoin(cell("A", "post", "a1"))
        .crossJoin(cell("B", "pre", "b0"))
        .crossJoin(cell("B", "post", "b1"))
        .select(col("n_a0"), col("n_a1"), col("n_b0"), col("n_b1"),
          round(col("m_a0"), 4).as("m_a_pre"),
          round(col("m_a1"), 4).as("m_a_post"),
          round(col("m_b0"), 4).as("m_b_pre"),
          round(col("m_b1"), 4).as("m_b_post"),
          round((col("m_b1") - col("m_b0")) -
            (col("m_a1") - col("m_a0")), 4).as("did"))
    },

    // Journey-predictability report: per-user transition ENTROPY over
    // consecutive event-type pairs, averaged into a small census.
    // Entropy −Σp·ln p is float-order-sensitive, so each user's term
    // list is summed after casting to DECIMAL(18,10) (the repo's
    // add-order-exactness convention); transitions per user are ≤25
    // distinct types. High-entropy users browse unpredictably —
    // the signal feeding personalization eligibility.
    "q357_path_entropy" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"),
        col("event_id"))
      val trans = Tables.df(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("user_id"), col("event_type"), col("nxt"))
        .agg(count(lit(1)).as("c"))
      val perUser = trans.groupBy(col("user_id"))
        .agg(sum(col("c")).as("n"))
      val ent = trans.join(perUser, "user_id")
        .select(col("user_id"),
          (-(col("c").cast(DoubleType) / col("n")) *
            log(col("c").cast(DoubleType) / col("n")))
            .cast(DecimalType(18, 10)).as("term"))
        .groupBy(col("user_id"))
        .agg(sum(col("term")).cast(DoubleType).as("h"))
      ent.agg(count(lit(1)).as("n_users"),
          round(min(col("h")), 6).as("h_min"),
          round(max(col("h")), 6).as("h_max"),
          expr("round(percentile_disc(0.5) WITHIN GROUP " +
            "(ORDER BY h), 6)").as("h_median"))
    },

    // Peak concurrency via the SWEEP LINE — the interval-analytics
    // kernel nothing else covers: sessions (q205's 8h-gap definition)
    // become +1/−1 boundary events, the ordered running sum is the
    // live-session count at every boundary, and its max is the
    // capacity answer "how many sessions were ever open at once".
    // Ends sort BEFORE starts at the same instant (a session ending
    // as another starts does not overlap it) via the (t, delta)
    // order. O(2·sessions) boundary rows, exact integers throughout.
    "q358_peak_concurrency" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val wSess = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val marked = Tables.df(s, dir, "events")
        .select(col("user_id"), col("ts"))
        .withColumn("prev", lag(col("ts"), 1).over(wSess))
        .withColumn("new_s",
          when(col("prev").isNull ||
            col("ts").cast(LongType) - col("prev").cast(LongType)
              > 8 * 3600, 1L).otherwise(0L))
        .withColumn("sid", sum(col("new_s")).over(
          wSess.rowsBetween(Window.unboundedPreceding, 0)))
      val sessions = marked.groupBy(col("user_id"), col("sid"))
        .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
      val bounds = sessions
        .select(col("t0").as("t"), lit(1L).as("delta"))
        .unionAll(sessions.select(col("t1").as("t"),
          lit(-1L).as("delta")))
      // distributed prefix sum, NOT Window.orderBy(t): the boundary
      // stream is session-grain (fact-sized) — a single-partition
      // window is a one-task straggler at 100×
      graft.operators.DistributedPrefix
        .prefixSum(bounds, Seq(col("t"), col("delta")), col("delta"),
          "live")
        .agg(count(lit(1)).as("n_boundaries"),
          (count(lit(1)) / 2).cast(LongType).as("n_sessions"),
          max(col("live")).as("peak_concurrency"),
          min_by(col("t"), struct(-col("live"), col("t")))
            .cast(StringType).as("peak_at"))
    },

    // Metrics-layer grain fan-out — the metrics-store pattern: ONE
    // pass emits the same revenue metric at month, quarter and year
    // grain via grouping sets (Expand replicates each row into its 3
    // grains — the q314 all-granularities trick pointed at a metric
    // catalog instead of sketches). The grain label makes the result
    // a well-typed metrics table, not a cube with nulls; exact
    // decimal sums per cell.
    "q383_metrics_grains" -> { (s, dir) =>
      val o = Tables.df(s, dir, "orders")
        .select(
          date_trunc("month", col("o_orderdate")).cast(DateType)
            .cast(StringType).as("m"),
          concat(year(col("o_orderdate")), lit("-Q"),
            quarter(col("o_orderdate"))).as("q"),
          year(col("o_orderdate")).cast(StringType).as("y"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("v"))
      o.groupBy(col("m"), col("q"), col("y"))
        .agg(count(lit(1)).as("pn"), sum(col("v")).as("pv"))
        .select(explode(array(
          struct(lit("month").as("grain"), col("m").as("period"),
            col("pn"), col("pv")),
          struct(lit("quarter").as("grain"), col("q").as("period"),
            col("pn"), col("pv")),
          struct(lit("year").as("grain"), col("y").as("period"),
            col("pn"), col("pv")))).as("e"))
        .select(col("e.grain").as("grain"), col("e.period").as("period"),
          col("e.pn").as("pn"), col("e.pv").as("pv"))
        .groupBy(col("grain"), col("period"))
        .agg(sum(col("pn")).as("n_orders"),
          sum(col("pv")).cast(DoubleType).as("revenue"))
        .orderBy(col("grain"), col("period"))
    },

    // Storage-tier simulation — the lifecycle-policy costing every
    // lakehouse team runs before enabling tiering: partitions older
    // than 90/365 days (from the data's own horizon) map to
    // warm/cold, and the report totals rows and estimated bytes
    // (q340's explicit width formula) per tier — the input to "what
    // does S3-IA actually save us". Exact integers end to end.
    "q384_storage_tiering" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
      val horizon = li.agg(max(col("l_shipdate")).as("maxd"))
      val bytesPerRow = lit(68) +
        octet_length(col("l_returnflag")) +
        octet_length(col("l_linestatus"))
      li.crossJoin(broadcast(horizon))
        .select(
          when(datediff(col("maxd").cast(DateType),
            col("l_shipdate").cast(DateType)) <= 90, "1_hot")
            .when(datediff(col("maxd").cast(DateType),
              col("l_shipdate").cast(DateType)) <= 365, "2_warm")
            .otherwise("3_cold").as("tier"),
          bytesPerRow.cast(LongType).as("b"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n_rows"), sum(col("b")).as("est_bytes"))
        .withColumn("share",
          round(col("est_bytes").cast(DoubleType) /
            sum(col("est_bytes")).over(
              org.apache.spark.sql.expressions.Window.partitionBy()),
            6))
        .orderBy(col("tier"))
    },

    // Dwell time per transition — the "how long do users hesitate
    // between steps" report that q246's counts and q373's χ² don't
    // answer: per (from, to) event pair, the median and p90 of the
    // inter-event gap in integer seconds (percentile_disc data
    // values — engine-stable). One LEAD pass, one census.
    "q381_transition_dwell" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"),
        col("event_id"))
      Tables.df(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .withColumn("gap",
          lead(col("ts").cast(LongType), 1).over(w) -
            col("ts").cast(LongType))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
        .agg(count(lit(1)).as("n"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap)")
            .as("p50_gap_s"),
          expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY gap)")
            .as("p90_gap_s"))
        .orderBy(col("src"), col("dst"))
    },

    // Markov steady-state of the journey chain — the long-run share
    // of attention each event type commands, read from 10 unrolled
    // power-iteration steps over the 5×5 transition matrix (fixed
    // steps = deterministic and SQL-unrollable, the q258/q315
    // convention). Transition probabilities are exact integer ratios;
    // each step's matrix–vector products cast their 5 addends to
    // DECIMAL(28,18) so the accumulation is add-order-exact — after
    // 10 steps the vector is stationary to ~1e-6 and both engines
    // carry the IDENTICAL decimals all the way.
    "q382_markov_steady" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"),
        col("event_id"))
      val trans = Tables.df(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
        .agg(count(lit(1)).as("c"))
      val rowT = trans.groupBy(col("src")).agg(sum(col("c")).as("rt"))
      val p = trans.join(rowT, "src")
        .select(col("src"), col("dst"),
          (col("c").cast(DoubleType) / col("rt")).as("p"))
        .localCheckpoint()
      val n0 = p.select(col("src").as("state")).distinct()
        .crossJoin(broadcast(
          p.select(col("src")).distinct().agg(count(lit(1)).as("k"))))
        .select(col("state"), (lit(1.0) / col("k")).as("pi"))
      val steady = (1 to 10).foldLeft(n0) { (cur, _) =>
        cur.join(p, col("state") === col("src"))
          .select(col("dst"),
            (col("pi") * col("p")).cast(DecimalType(28, 18)).as("m"))
          .groupBy(col("dst")).agg(sum(col("m")).cast(DoubleType)
            .as("pi"))
          .select(col("dst").as("state"), col("pi"))
      }
      steady.select(col("state"), round(col("pi"), 6).as("pi"))
        .orderBy(col("state"))
    },

    // Price–volume decomposition of the YoY revenue change — the
    // FP&A bridge ("how much of the Δ was price, how much volume"):
    // over the common part basket of 1996/1997, volume effect =
    // Δq·p₀ and price effect = q₁·Δp, summing EXACTLY to ΔRev. The
    // official per-part unit price is computed in HUNDREDTH-CENTS by
    // half-up integer division, so every later product is a pure
    // integer product and the bridge closes bit-exactly — double
    // round() disagrees across engines at .00005 ties, and an FP&A
    // bridge that doesn't reconcile is worse than none.
    "q379_price_volume_decomp" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
        .filter(year(col("l_shipdate")).isin(1996, 1997))
        .groupBy(col("l_partkey").as("part"),
          year(col("l_shipdate")).as("y"))
        .agg(sum(col("l_quantity")).cast(LongType).as("q"),
          (sum(col("l_extendedprice").cast(DecimalType(18, 2))) *
            10000).cast(LongType).as("vc"))
        .withColumn("p4", expr("(2 * vc + q) div (2 * q)"))
      val basket = li.filter(col("y") === 1996)
        .select(col("part"), col("q").as("q0"), col("p4").as("p0"))
        .join(li.filter(col("y") === 1997)
          .select(col("part"), col("q").as("q1"), col("p4").as("p1")),
          "part")
      basket.agg(count(lit(1)).as("n_parts"),
          sum(((col("q1") - col("q0")) * col("p0"))
            .cast(DecimalType(38, 0))).as("vol_eff"),
          sum((col("q1") * (col("p1") - col("p0")))
            .cast(DecimalType(38, 0))).as("price_eff"),
          sum((col("q1") * col("p1") - col("q0") * col("p0"))
            .cast(DecimalType(38, 0))).as("total_delta"))
        .select(col("n_parts"),
          (col("vol_eff").cast(DoubleType) / 10000.0)
            .as("volume_effect"),
          (col("price_eff").cast(DoubleType) / 10000.0)
            .as("price_effect"),
          (col("total_delta").cast(DoubleType) / 10000.0)
            .as("total_delta"))
    },

    // Acquisition-cohort quality drift — "are newer customers worse":
    // per first-order month, cohort size, first-order value (integer
    // cents, half-up mean — the q345 discipline) and the share who
    // ever ordered again. First order resolves as a min-struct per
    // customer (one order-grain pass); the census is O(months).
    "q380_cohort_quality" -> { (s, dir) =>
      val per = Tables.df(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(min(struct(col("o_orderdate"), col("o_orderkey"),
          col("o_totalprice"))).as("f"),
          count(lit(1)).as("n_orders"))
        .select(
          date_trunc("month", col("f.o_orderdate")).cast(DateType)
            .cast(StringType).as("cohort"),
          (col("f.o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType).as("first_cents"),
          (col("n_orders") > 1).as("repeater"))
      per.groupBy(col("cohort"))
        .agg(count(lit(1)).as("n_new"),
          sum(col("first_cents")).as("sc"),
          sum(when(col("repeater"), 1L).otherwise(0L)).as("n_repeat"))
        .select(col("cohort"), col("n_new"),
          (expr("(2 * sc + n_new) div (2 * n_new)") / 100.0)
            .as("avg_first_value"),
          round(col("n_repeat").cast(DoubleType) / col("n_new"), 6)
            .as("repeat_share"))
        .orderBy(col("cohort"))
    },

    // Churn-definition sensitivity — how much the "churned users"
    // number moves with the inactivity threshold (the 30/60/90-day
    // argument every retention review has): last-activity age per
    // user from ONE event scan, then all three thresholds as
    // conditional sums over the user-grain census — one pass, three
    // answers, exact integers throughout.
    "q378_churn_sensitivity" -> { (s, dir) =>
      val ev = Tables.df(s, dir, "events")
      val horizon = ev.agg(max(col("ts")).as("maxts"))
      val per = ev.groupBy(col("user_id"))
        .agg(max(col("ts")).as("last_ts"))
        .crossJoin(broadcast(horizon))
        .select(datediff(col("maxts").cast(DateType),
          col("last_ts").cast(DateType)).as("age"))
      per.agg(count(lit(1)).as("n_users"),
          sum(when(col("age") > 30, 1L).otherwise(0L)).as("churn30"),
          sum(when(col("age") > 60, 1L).otherwise(0L)).as("churn60"),
          sum(when(col("age") > 90, 1L).otherwise(0L)).as("churn90"))
        .select(col("n_users"), col("churn30"), col("churn60"),
          col("churn90"),
          round(col("churn30").cast(DoubleType) / col("n_users"), 6)
            .as("rate30"),
          round(col("churn90").cast(DoubleType) / col("n_users"), 6)
            .as("rate90"))
    },

    // χ² independence test on the journey transition matrix — the
    // statistical verdict on q246's descriptive report: are next
    // events INDEPENDENT of the current one? Expected cell counts are
    // row-total·col-total/n from exact integers, and each cell
    // contributes (obs−exp)²/exp. Cells with the largest
    // contributions are the "sticky" transitions a product team
    // investigates. One event scan → O(types²) census.
    "q373_transition_chi2" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"),
        col("event_id"))
      val obs = Tables.df(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("ts"),
          col("event_id"))
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
        .agg(count(lit(1)).as("obs"))
      val rowT = obs.groupBy(col("src")).agg(sum(col("obs")).as("rt"))
      val colT = obs.groupBy(col("dst")).agg(sum(col("obs")).as("ct"))
      val tot = obs.agg(sum(col("obs")).as("n"))
      obs.join(broadcast(rowT), "src").join(broadcast(colT), "dst")
        .crossJoin(broadcast(tot))
        .withColumn("exp_n",
          col("rt").cast(DoubleType) * col("ct") / col("n"))
        .select(col("src"), col("dst"), col("obs"),
          round(col("exp_n"), 2).as("exp_n"),
          round(pow(col("obs") - col("exp_n"), 2) / col("exp_n"), 4)
            .as("chi2_part"))
        .orderBy(col("src"), col("dst"))
    },

    // 2-D histogram (length × token-count grid over documents) — the
    // joint-distribution heatmap behind every "are these two quality
    // signals redundant" review; 1-D histograms (q289) can't show the
    // ridge. Fixed-width integer bucket arithmetic on both axes,
    // exact cell counts plus both marginals in one census.
    "q374_hist2d" -> { (s, dir) =>
      val d = Tables.df(s, dir, "documents")
        .select((col("n_chars") / lit(200)).cast(LongType).as("bx"),
          (size(split(col("text"), " ")) / lit(30)).cast(LongType)
            .as("by"))
      val cells = d.groupBy(col("bx"), col("by"))
        .agg(count(lit(1)).as("n"))
      val mx = d.groupBy(col("bx")).agg(count(lit(1)).as("row_total"))
      val my = d.groupBy(col("by")).agg(count(lit(1)).as("col_total"))
      cells.join(broadcast(mx), "bx").join(broadcast(my), "by")
        .select(col("bx"), col("by"), col("n"), col("row_total"),
          col("col_total"))
        .orderBy(col("bx"), col("by"))
    },

    // Join-key skew pre-flight — the report a 100 TB job reads BEFORE
    // choosing between plain shuffle, broadcast, and q38-style
    // salting: for each candidate join key, the share of rows carried
    // by the heaviest key and by the top-10 (a top-1 share near 1/p
    // partitions means one straggler task owns the stage). Each probe
    // is a grouped census + a top-k window on the key-grain table;
    // output is O(keys probed).
    "q371_skew_preflight" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      def probe(keyCol: String): DataFrame = {
        // NULL keys are excluded on BOTH engines: the oracle's
        // count(DISTINCT k) never counts NULL, so the engine must not
        // count a NULL-key group either (and a NULL join key hashes to
        // one partition anyway — it is not a "skewed key", it is rows
        // the join drops).
        val cnt = Tables.df(s, dir, "lineitem")
          .filter(col(keyCol).isNotNull)
          .groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("c"))
        // top-10 keys via orderBy().limit() → TakeOrderedAndProject
        // (distributed partial top-k) instead of the global-window
        // row_number this pre-flight exists to warn against; the
        // heaviest key's count is max(c) within the limited set
        // because c is the leading sort key
        val tot = cnt.agg(sum(col("c")).as("n"),
          count(lit(1)).as("n_keys"))
        cnt.orderBy(col("c").desc, col("k")).limit(10)
          .agg(max(col("c")).as("top1"),
            sum(col("c")).as("top10"))
          .crossJoin(broadcast(tot))
          .select(lit(keyCol).as("key"), col("n_keys"),
            round(col("top1").cast(DoubleType) / col("n"), 6)
              .as("top1_share"),
            round(col("top10").cast(DoubleType) / col("n"), 6)
              .as("top10_share"))
      }
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag")
        .map(probe).reduce(_ unionAll _)
        .orderBy(col("key"))
    },

    // Neyman allocation — optimal stratified sampling: slots go to
    // strata in proportion to n_h·σ_h (big AND variable strata need
    // more samples), with the largest-remainder integer finish (q361)
    // so the quotas sum to exactly 1000. σ comes from exact decimal
    // moments, so the per-stratum weight PRODUCTS are identical
    // doubles on both engines; the weight TOTAL is summed as a
    // decimal (not a double) because Spark's partial-aggregation
    // order is not fixed — a double tw could differ from DuckDB's
    // summation order at ulp level and flip floor(base) or the
    // largest-remainder ranking at a near-tie.
    "q372_neyman_allocation" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val st = Tables.df(s, dir, "orders")
        .select(col("o_orderpriority").as("stratum"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("x"))
        .groupBy(col("stratum"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sum((col("x") * col("x")).cast(DecimalType(38, 4)))
            .as("sxx"))
        .withColumn("sigma",
          sqrt(col("sxx").cast(DoubleType) / col("n") -
            (col("sx").cast(DoubleType) / col("n")) *
            (col("sx").cast(DoubleType) / col("n"))))
        .withColumn("wgt", col("n") * col("sigma"))
      val tot = st.agg(
        sum(col("wgt").cast(DecimalType(28, 10))).as("tw"))
      val based = st.crossJoin(broadcast(tot))
        .withColumn("exact_q",
          col("wgt") * 1000.0 / col("tw").cast(DoubleType))
        .withColumn("base", floor(col("exact_q")).cast(LongType))
        .withColumn("rem", col("exact_q") - col("base"))
      val leftover = based.agg((lit(1000L) - sum(col("base")))
        .as("lo"))
      val w = Window.orderBy(col("rem").desc, col("stratum"))
      based.crossJoin(broadcast(leftover))
        .withColumn("rk", row_number().over(w))
        .select(col("stratum"), col("n"),
          round(col("sigma"), 2).as("sigma"),
          (col("base") + when(col("rk") <= col("lo"), 1L)
            .otherwise(0L)).as("quota"))
        .orderBy(col("stratum"))
    },

    // Time-DECAYED popularity — recency-weighted ranking (what
    // trending lists actually use): each order contributes weight
    // 100/(100+age_days), a hyperbolic decay chosen deliberately over
    // exponential because the ratio of exact integers is one
    // correctly-rounded division — bit-identical on both engines
    // where exp() differs at ulp level (libm divergence, the decimal
    // cast would then flip). Weights cast to DECIMAL(18,10) before
    // the per-part sum; the report contrasts decayed rank vs plain
    // count rank to show what recency moved.
    "q370_decayed_popularity" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val horizon = Tables.df(s, dir, "orders")
        .agg(max(col("o_orderdate")).as("maxd"))
      val base = Tables.df(s, dir, "lineitem")
        .join(Tables.df(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .crossJoin(broadcast(horizon))
        .select(col("l_partkey").as("part"),
          datediff(col("maxd").cast(DateType),
            col("o_orderdate").cast(DateType)).as("age"))
        .withColumn("w",
          (lit(100.0) / (lit(100) + col("age")))
            .cast(DecimalType(18, 10)))
      val per = base.groupBy(col("part"))
        .agg(count(lit(1)).as("n"),
          sum(col("w")).as("dsum"))
      // both ranks are GLOBAL over the part-grain table (unbounded at
      // corpus scale) and rk_plain is needed for the top-10 decayed
      // parts' position in the FULL plain ranking, so a post-limit
      // window can't express it — both ride DistributedPrefix
      val withPlain = graft.operators.DistributedPrefix
        .globalRank(per, Seq(col("n").desc, col("part")), "rk_plain")
      graft.operators.DistributedPrefix
        .globalRank(withPlain,
          Seq(col("dsum").desc, col("part")), "rk_decayed")
        .filter(col("rk_decayed") <= 10)
        .select(col("rk_decayed"), col("part"), col("n"),
          round(col("dsum").cast(DoubleType), 4).as("decayed"),
          col("rk_plain"))
        .orderBy(col("rk_decayed"))
    },

    // Autocorrelation function (lags 1..12) of the monthly revenue
    // series — the periodicity diagnostic read before any seasonal
    // model: per lag, the Pearson correlation of the series with its
    // shifted self over the aligned pairs. Every moment (Σx, Σy, Σxy,
    // Σx², Σy²) is an exact integer-cents sum (decimal(38,0) — the
    // q327 overflow discipline), so each r_k is a pure function of
    // exact integers; the lag explode is a ×12 blowup of the
    // O(months) series.
    "q369_autocorrelation" -> { (s, dir) =>
      val monthly = Tables.df(s, dir, "orders")
        .groupBy((year(col("o_orderdate")) * 12 +
          month(col("o_orderdate"))).as("mi"))
        .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
          .cast(DecimalType(20, 0)).as("vc"))
      monthly.toDF("mi", "x")
        .join(broadcast(monthly.toDF("mj", "y")),
          col("mj") - col("mi") >= 1 && col("mj") - col("mi") <= 12)
        .withColumn("lag", col("mj") - col("mi"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("x").cast(DecimalType(38, 0))).as("sx"),
          sum(col("y").cast(DecimalType(38, 0))).as("sy"),
          sum((col("x") * col("y")).cast(DecimalType(38, 0)))
            .as("sxy"),
          sum((col("x") * col("x")).cast(DecimalType(38, 0)))
            .as("sxx"),
          sum((col("y") * col("y")).cast(DecimalType(38, 0)))
            .as("syy"))
        .select(col("lag"), col("n_pairs"),
          round((col("n_pairs") * col("sxy") - col("sx") * col("sy"))
            .cast(DoubleType) /
            (sqrt((col("n_pairs") * col("sxx") -
              col("sx") * col("sx")).cast(DoubleType)) *
             sqrt((col("n_pairs") * col("syy") -
               col("sy") * col("sy")).cast(DoubleType))), 4)
            .as("acf"))
        .orderBy(col("lag"))
    },

    // Catalog profiling sweep — the ANALYZE-style per-column report a
    // data catalog materializes: null count, exact distinct count and
    // row count for the key columns of every fixture table, in ONE
    // result. Each per-column probe is an independent aggregate
    // (partial map-side); the union is report-sized. The profiling
    // loop is DRIVEN BY A COLUMN LIST, not hand-unrolled — the same
    // code profiles a 500-table warehouse.
    "q365_profile_sweep" -> { (s, dir) =>
      val targets = Seq(
        ("orders", "o_custkey"), ("orders", "o_orderstatus"),
        ("lineitem", "l_partkey"), ("lineitem", "l_returnflag"),
        ("customer", "c_nationkey"), ("customer", "c_mktsegment"),
        ("supplier", "s_nationkey"), ("part", "p_type"),
        ("events", "event_type"), ("documents", "lang"))
      targets.map { case (t, c) =>
        Tables.df(s, dir, t).agg(
          lit(t).as("tbl"), lit(c).as("col"),
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col(c)).as("n_distinct"))
          .select(col("tbl"), col("col"), col("n_rows"),
            col("n_null"), col("n_distinct"))
      }.reduce(_ unionAll _)
        .orderBy(col("tbl"), col("col"))
    },

    // Candidate-key discovery — the profiling twin: for each proposed
    // key combo, how many rows share a duplicate key value. A combo
    // with zero duplicates is a verified candidate key; the report is
    // what schema-inference and CDC-merge tooling consult before
    // picking merge keys. Each probe is one grouped census counting
    // keys with multiplicity > 1 — map-side partial, O(combos) rows.
    "q366_key_discovery" -> { (s, dir) =>
      def probe(t: String, cols: Seq[String]): DataFrame = {
        val df = Tables.df(s, dir, t)
        df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("c"))
          .agg(lit(t).as("tbl"),
            lit(cols.mkString("+")).as("key_cols"),
            count(lit(1)).as("n_keys"),
            sum(when(col("c") > 1, col("c")).otherwise(0L))
              .as("n_dup_rows"))
          .select(col("tbl"), col("key_cols"), col("n_keys"),
            col("n_dup_rows"),
            (col("n_dup_rows") === 0).as("is_candidate_key"))
      }
      Seq(
        probe("orders", Seq("o_orderkey")),
        probe("orders", Seq("o_custkey")),
        probe("lineitem", Seq("l_orderkey", "l_linenumber")),
        probe("lineitem", Seq("l_orderkey")),
        probe("customer", Seq("c_custkey")),
        probe("events", Seq("event_id")),
        probe("events", Seq("user_id", "ts")),
        probe("documents", Seq("doc_id")))
        .reduce(_ unionAll _)
        .orderBy(col("tbl"), col("key_cols"))
    },

    // Leave-one-out smoothed target encoding — the categorical
    // feature-engineering op with LEAKAGE PROTECTION built in: each
    // row's encoding uses its group's target sum MINUS ITS OWN target
    // ((S−yᵢ+k·prior)/(n−1+k), k=10), so the feature never sees its
    // own label — the bug that silently inflates every offline metric
    // when plain target encoding leaks. Group sums ride DECIMAL, each
    // row's encoding divides once, and the report is the per-group
    // encoding envelope (min/avg/max).
    "q363_target_encoding" -> { (s, dir) =>
      val o = Tables.df(s, dir, "orders")
        .join(Tables.df(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("y"))
      val g = o.groupBy(col("seg"))
        .agg(sum(col("y")).as("sy"), count(lit(1)).as("n"))
      val prior = o.agg(
        (sum(col("y")).cast(DoubleType) / count(lit(1))).as("prior"))
      o.join(broadcast(g), "seg").crossJoin(broadcast(prior))
        .withColumn("enc",
          ((col("sy") - col("y")).cast(DoubleType) +
            lit(10.0) * col("prior")) /
            (col("n") - 1 + 10))
        .select(col("seg"), col("enc").cast(DecimalType(18, 6))
          .as("encd"))
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"),
          round(min(col("encd")).cast(DoubleType), 4).as("enc_min"),
          round((sum(col("encd")).cast(DoubleType) / count(lit(1))), 4)
            .as("enc_avg"),
          round(max(col("encd")).cast(DoubleType), 4).as("enc_max"))
        .orderBy(col("seg"))
    },

    // Calibration curve + ECE for the linear scorer — the reliability
    // check that separates a USEFUL probability from a mere ranking
    // score: scores bin into 10 fixed-width probability buckets,
    // each reports predicted-vs-observed positive rate, and ECE is
    // the count-weighted mean gap. Counts exact; per-bin means are
    // decimal-cast sums of deterministic doubles, so the gaps — and
    // their weighted aggregate — are add-order-independent.
    "q364_calibration_ece" -> { (s, dir) =>
      val weights = expr(
        "transform(sequence(0, 63), i -> ((i * 37) % 101 - 50) / 100.0)")
      val z = aggregate(
        zip_with(transform(col("embedding"),
          v => v.cast(DoubleType)), weights, (x, w) => x * w),
        lit(0.0), (a, x) => a + x)
      val scored = Tables.df(s, dir, "embeddings")
        .select((lit(1.0) / (lit(1.0) + exp(-z))).as("score"),
          (col("label") % 2 === 0).as("truth"))
        .withColumn("bin",
          least(lit(10L), (floor(col("score") * 10) + 1)
            .cast(LongType)))
      val per = scored.groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("truth"), 1L).otherwise(0L)).as("n_pos"),
          sum(col("score").cast(DecimalType(18, 8))).as("ssum"))
      val tot = per.agg(sum(col("n")).as("nt"))
      per.crossJoin(broadcast(tot))
        .select(col("bin"), col("n"),
          round(col("ssum").cast(DoubleType) / col("n"), 6)
            .as("pred_rate"),
          round(col("n_pos").cast(DoubleType) / col("n"), 6)
            .as("obs_rate"),
          round(abs(col("ssum").cast(DoubleType) / col("n") -
            col("n_pos").cast(DoubleType) / col("n")) *
            col("n") / col("nt"), 6).as("ece_part"))
        .orderBy(col("bin"))
    },

    // Largest-remainder apportionment — the exact-integer allocation
    // algorithm behind sampling quotas, budget splits and seat
    // assignment: distribute S=10000 slots across nations in
    // proportion to order counts such that the allocations SUM TO
    // EXACTLY S. Base shares are integer div, the leftover goes to
    // the largest remainders (exact integer n·S mod T — no float
    // share ever computed), ties on nation name. The window runs on
    // the O(nations) census.
    "q361_largest_remainder" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val cnt = Tables.df(s, dir, "orders")
        .join(Tables.df(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.df(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(count(lit(1)).as("n_orders"))
      val tot = cnt.agg(sum(col("n_orders")).as("t"),
        count(lit(1)).as("n_groups"))
      val w = Window.orderBy(col("rem").desc, col("nation"))
      val based = cnt.crossJoin(broadcast(tot))
        .withColumn("base", expr("(n_orders * 10000) div t"))
        .withColumn("rem", expr("(n_orders * 10000) % t"))
      val leftover = based.agg(
        (lit(10000L) - sum(col("base"))).as("lo"))
      based.crossJoin(broadcast(leftover))
        .withColumn("rk", row_number().over(w))
        .select(col("nation"), col("n_orders"),
          (col("base") + when(col("rk") <= col("lo"), 1L)
            .otherwise(0L)).as("alloc"))
        .orderBy(col("nation"))
    },

    // Interval coverage + time-weighted concurrency — the second
    // sweep-line report (q358 finds the peak; this integrates):
    // between consecutive boundaries the live count is constant, so
    // union-coverage seconds (live ≥ 1) and the occupancy integral
    // Σ live·dt are exact integer sums over boundary gaps — the
    // numbers behind "how many license-seconds did we consume" and
    // "what share of the clock had any activity".
    "q359_interval_coverage" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val wSess = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val marked = Tables.df(s, dir, "events")
        .select(col("user_id"), col("ts"))
        .withColumn("prev", lag(col("ts"), 1).over(wSess))
        .withColumn("new_s",
          when(col("prev").isNull ||
            col("ts").cast(LongType) - col("prev").cast(LongType)
              > 8 * 3600, 1L).otherwise(0L))
        .withColumn("sid", sum(col("new_s")).over(
          wSess.rowsBetween(Window.unboundedPreceding, 0)))
      val sessions = marked.groupBy(col("user_id"), col("sid"))
        .agg(min(col("ts")).cast(LongType).as("t0"),
          max(col("ts")).cast(LongType).as("t1"))
      val bounds = sessions.select(col("t0").as("t"), lit(1L).as("delta"))
        .unionAll(sessions.select(col("t1").as("t"),
          lit(-1L).as("delta")))
      // sweepLine = distributed prefix sum + cross-partition lead;
      // replaces the single-partition Window.orderBy(t) straggler
      val seg = graft.operators.DistributedPrefix
        .sweepLine(bounds, col("t"), col("delta"))
        .filter(col("t_next").isNotNull)
        .withColumn("dt", col("t_next") - col("t"))
      seg.agg(
          sum(when(col("live") >= 1, col("dt")).otherwise(0L))
            .as("union_seconds"),
          sum(col("live") * col("dt")).as("occupancy_seconds"),
          (max(col("t")) - min(col("t"))).as("span_seconds"))
        .select(col("union_seconds"), col("occupancy_seconds"),
          col("span_seconds"),
          round(col("occupancy_seconds").cast(DoubleType) /
            col("span_seconds"), 4).as("avg_concurrency"),
          round(col("union_seconds").cast(DoubleType) /
            col("span_seconds"), 4).as("busy_share"))
    },

    // Revenue concentration: Gini coefficient + top-decile share —
    // the inequality readout behind "do 10% of customers carry the
    // business". Spend rides integer CENTS; the Gini rank-weighted
    // sum Σ(rᵢ·xᵢ) is exact decimal (ranks are row_numbers with
    // custkey tiebreaks, so ties are deterministic), and the two
    // ratios divide once in double. Both global ranks run as
    // DistributedPrefix.globalRank — range-partitioned rank offsets,
    // never a single-partition row_number over the customer census.
    "q353_gini_concentration" -> { (s, dir) =>
      val per = Tables.df(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType)).as("xc"))
      val ranked0 = graft.operators.DistributedPrefix
        .globalRank(per, Seq(col("xc"), col("o_custkey")), "r")
      val ranked = graft.operators.DistributedPrefix
        .globalRank(ranked0, Seq(col("xc").desc, col("o_custkey")),
          "rd")
      val nAll = per.agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(nAll))
        .withColumn("topflag", col("rd") <= expr("greatest(1, n div 10)"))
        .agg(min(col("n")).as("n"),
          sum(col("xc").cast(DecimalType(38, 0))).as("tot"),
          sum((col("r") * col("xc")).cast(DecimalType(38, 0)))
            .as("rw"),
          sum(when(col("topflag"), col("xc")).otherwise(0L))
            .cast(DecimalType(38, 0)).as("topsum"))
        .select(col("n"),
          (col("tot").cast(DoubleType) / 100.0).as("total_spend"),
          round(lit(2.0) * col("rw").cast(DoubleType) /
            (col("n") * col("tot").cast(DoubleType)) -
            (col("n") + lit(1.0)) / col("n"), 6).as("gini"),
          round(col("topsum").cast(DoubleType) /
            col("tot").cast(DoubleType), 6).as("top10_share"))
    },

    // Price-index pair (Laspeyres / Paasche / Fisher) between two
    // years — the econometrics shape nothing else covers: per-part
    // unit prices (value/quantity) in each year over the common
    // basket, then base-weighted vs current-weighted index ratios.
    // Each per-part cross term p·q is ONE double product cast to
    // DECIMAL(18,4) before the basket sum (the revenue convention),
    // so the four sums are add-order-exact and the indices divide
    // once.
    "q354_price_index" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
        .filter(year(col("l_shipdate")).isin(1996, 1997))
        .groupBy(col("l_partkey").as("part"),
          year(col("l_shipdate")).as("y"))
        .agg(sum(col("l_quantity")).as("q"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("v"))
      val basket = li.filter(col("y") === 1996)
        .select(col("part"), col("q").as("q0"),
          (col("v").cast(DoubleType) / col("q")).as("p0"))
        .join(li.filter(col("y") === 1997)
          .select(col("part"), col("q").as("q1"),
            (col("v").cast(DoubleType) / col("q")).as("p1")),
          "part")
      basket.agg(count(lit(1)).as("n_parts"),
          sum((col("p1") * col("q0")).cast(DecimalType(18, 4)))
            .as("l_num"),
          sum((col("p0") * col("q0")).cast(DecimalType(18, 4)))
            .as("l_den"),
          sum((col("p1") * col("q1")).cast(DecimalType(18, 4)))
            .as("p_num"),
          sum((col("p0") * col("q1")).cast(DecimalType(18, 4)))
            .as("p_den"))
        .select(col("n_parts"),
          round(col("l_num").cast(DoubleType) /
            col("l_den").cast(DoubleType), 6).as("laspeyres"),
          round(col("p_num").cast(DoubleType) /
            col("p_den").cast(DoubleType), 6).as("paasche"),
          round(sqrt((col("l_num").cast(DoubleType) /
            col("l_den").cast(DoubleType)) *
            (col("p_num").cast(DoubleType) /
              col("p_den").cast(DoubleType))), 6).as("fisher"))
    },

    // Split-conformal prediction coverage — the distribution-free
    // error-bar check a deployed regressor ships with: residuals of a
    // FIXED model (ŷ = 0.8 + 0.0001·n_chars predicting the embedding
    // norm — conformal is agnostic to where the model came from) on a
    // deterministic md5 calibration half give the 90% residual
    // quantile q̂ (percentile_disc — a data value), and the eval half
    // reports the share of residuals ≤ q̂. Every residual is one
    // deterministic double expression; the quantile is exact; the
    // coverage census is integer counting.
    "q351_conformal_coverage" -> { (s, dir) =>
      val d = Tables.df(s, dir, "documents")
        .select(col("doc_id"), col("n_chars").cast(DoubleType).as("x"))
      val e = Tables.df(s, dir, "embeddings")
        .select(col("vec_id"),
          sqrt(aggregate(transform(col("embedding"),
            v => v.cast(DoubleType) * v.cast(DoubleType)),
            lit(0.0), (a, v) => a + v)).as("y"))
      val scored = d.join(e, col("doc_id") === col("vec_id"))
        .select(col("doc_id"),
          abs(col("y") - (lit(0.8) + lit(0.0001) * col("x")))
            .as("resid"),
          (substring(md5(concat(lit("conf"),
            col("doc_id").cast(StringType))), 1, 2) < "80").as("cal"))
      val qhat = scored.filter(col("cal"))
        .agg(expr("percentile_disc(0.9) WITHIN GROUP " +
          "(ORDER BY resid)").as("qhat"),
          count(lit(1)).as("n_cal"))
      scored.filter(!col("cal"))
        .crossJoin(broadcast(qhat))
        .agg(min(col("n_cal")).as("n_cal"),
          count(lit(1)).as("n_eval"),
          round(min(col("qhat")), 6).as("q90"),
          round(sum(when(col("resid") <= col("qhat"), 1L)
            .otherwise(0L)).cast(DoubleType) / count(lit(1)), 6)
            .as("coverage"))
    },

    // Binned Kolmogorov–Smirnov drift statistic between two order
    // slices — the distribution-drift test at warehouse scale: exact
    // per-bucket counts for both slices (50 stats-derived buckets),
    // cumulative shares, and the max CDF gap with its location. The
    // binned form is the one that scales (exact KS needs a global
    // sort; the 40-bucket census partial-aggregates map-side) and its
    // statistic is a documented lower bound on exact KS. All counts
    // exact; the gap is a difference of exact-ratio doubles.
    "q352_binned_ks" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val o = Tables.df(s, dir, "orders")
        .filter(col("o_orderstatus").isin("F", "O"))
      val b = o.agg(min(col("o_totalprice")), max(col("o_totalprice")))
        .head()
      val (lo, hi) = (b.getDouble(0), b.getDouble(1))
      // Bucket via the SAME explicit floor expression the oracle uses
      // (not the width_bucket builtin): two independently-derived
      // float expression trees can disagree by 1 ulp for a value
      // landing exactly on a bucket edge and flip the row's bin.
      val per = o.select(
          when(col("o_totalprice") < lo, lit(0L))
            .when(col("o_totalprice") >= hi + 1.0, lit(51L))
            .otherwise(lit(1L) + floor((col("o_totalprice") - lit(lo))
              * 50.0 / lit(hi + 1.0 - lo)).cast(LongType)).as("bkt"),
          col("o_orderstatus").as("st"))
        .groupBy(col("bkt"))
        .agg(sum(when(col("st") === "F", 1L).otherwise(0L)).as("nf"),
          sum(when(col("st") === "O", 1L).otherwise(0L)).as("no"))
      val w = Window.orderBy(col("bkt"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = per.agg(sum(col("nf")).as("tf"), sum(col("no")).as("to"))
      per.crossJoin(broadcast(tot))
        .withColumn("gap",
          abs(sum(col("nf")).over(w).cast(DoubleType) / col("tf") -
            sum(col("no")).over(w).cast(DoubleType) / col("to")))
        .agg(min(col("tf")).as("n_f"), min(col("to")).as("n_o"),
          round(max(col("gap")), 6).as("ks"),
          max_by(col("bkt"), struct(col("gap"), -col("bkt")))
            .as("ks_bucket"))
    },

    // Incremental-refresh equivalence — the correctness contract of
    // every materialized-view delta pipeline: the census computed as
    // BASE (even event ids) plus an additively-applied DELTA (odd
    // ids) through a full-outer merge, which must equal the direct
    // full recompute — and the oracle IS the direct recompute, so the
    // equivalence is cross-engine-gated, not asserted. Counts and
    // decimal sums are the additively-mergeable state (the same
    // algebra that makes q313's streaming MERGE batching-independent).
    "q349_incremental_refresh" -> { (s, dir) =>
      val ev = Tables.df(s, dir, "events")
        .select(col("event_type").as("et"), col("event_id"),
          col("value").cast(DecimalType(18, 2)).as("v"))
      def census(mod: Int) = ev.filter(col("event_id") % 2 === mod)
        .groupBy(col("et"))
        .agg(count(lit(1)).as(s"n_$mod"), sum(col("v")).as(s"sv_$mod"))
      census(0).join(census(1), Seq("et"), "fullouter")
        .select(col("et"),
          (coalesce(col("n_0"), lit(0L)) + coalesce(col("n_1"), lit(0L)))
            .as("n"),
          (coalesce(col("sv_0"), lit(0).cast(DecimalType(18, 2))) +
            coalesce(col("sv_1"), lit(0).cast(DecimalType(18, 2))))
            .cast(DoubleType).as("sum_v"))
        .orderBy(col("et"))
    },

    // Lambda serving view — the batch+speed union every near-realtime
    // dashboard runs: a pre-aggregated "nightly" part (events older
    // than the 7-day cutoff, already collapsed to census grain) UNIONs
    // with a raw "speed" tail aggregated on read, and the merge
    // re-groups on the same key. The oracle computes the census
    // directly, pinning lambda ≡ direct; n_batch/n_speed expose the
    // split so a cutoff bug is visible, not averaged away.
    "q350_lambda_serving" -> { (s, dir) =>
      val ev = Tables.df(s, dir, "events")
        .select(col("event_type").as("et"), col("ts"),
          col("value").cast(DecimalType(18, 2)).as("v"))
      val cutoff = ev.agg(
        (max(col("ts")).cast(DateType) - expr("INTERVAL 7 DAYS"))
          .as("cut"))
      val tagged = ev.crossJoin(broadcast(cutoff))
        .withColumn("is_batch", col("ts").cast(DateType) < col("cut"))
      val batch = tagged.filter(col("is_batch"))
        .groupBy(col("et"))
        .agg(count(lit(1)).as("pn"), sum(col("v")).as("pv"))
      val speed = tagged.filter(!col("is_batch"))
        .groupBy(col("et"))
        .agg(count(lit(1)).as("pn"), sum(col("v")).as("pv"))
      batch.withColumn("src", lit("batch"))
        .unionAll(speed.withColumn("src", lit("speed")))
        .groupBy(col("et"))
        .agg(sum(col("pn")).as("n"),
          sum(col("pv")).cast(DoubleType).as("sum_v"),
          sum(when(col("src") === "batch", col("pn")).otherwise(0L))
            .as("n_batch"),
          sum(when(col("src") === "speed", col("pn")).otherwise(0L))
            .as("n_speed"))
        .orderBy(col("et"))
    },

    // What-if scenario grid — k pricing scenarios evaluated in ONE
    // fact pass: explode a 5-row scenario table (discount caps) onto
    // the scan and aggregate per scenario, instead of running k
    // full-table jobs. Per-row recomputed revenue casts to DECIMAL
    // before the sum (the repo's revenue convention), so every
    // scenario total is exact; the ×k blowup carries two narrow
    // columns.
    "q347_scenario_grid" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
      val actual = li.agg(
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))).as("actual"))
      li.select(col("l_extendedprice").as("p"),
          col("l_discount").as("d"),
          explode(array(lit(0.0), lit(0.02), lit(0.04), lit(0.06),
            lit(0.08))).as("cap"))
        .groupBy(col("cap"))
        .agg(sum((col("p") * (lit(1.0) - least(col("d"), col("cap"))))
          .cast(DecimalType(18, 4))).as("rev"))
        .crossJoin(broadcast(actual))
        .select(col("cap"),
          col("rev").cast(DoubleType).as("revenue"),
          (col("rev") - col("actual")).cast(DoubleType).as("uplift"))
        .orderBy(col("cap"))
    },

    // Bayesian-damped popularity ranking — the cold-start recommender
    // baseline: per (segment, part), quantity-score damped toward the
    // global prior — (Σq + k·prior)/(n + k) with k=10 — so a part
    // with 2 big orders can't outrank a steady seller. Sums are exact
    // integers, the prior is one global division, the damped score
    // divides once per part; top-5 per segment via WindowGroupLimit
    // with partkey tiebreaks.
    "q348_damped_popularity" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val base = Tables.df(s, dir, "lineitem")
        .join(Tables.df(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.df(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          col("l_partkey").as("part"),
          col("l_quantity").cast(LongType).as("q"))
      val prior = base.agg(
        (sum(col("q")).cast(DoubleType) / count(lit(1))).as("prior"))
      val w = Window.partitionBy(col("segment"))
        .orderBy(col("damped").desc, col("part"))
      base.groupBy(col("segment"), col("part"))
        .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"))
        .crossJoin(broadcast(prior))
        .withColumn("damped",
          round((col("sq") + lit(10.0) * col("prior")) /
            (col("n") + 10), 6))
        .withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= 5)
        .select(col("segment"), col("rk"), col("part"), col("n"),
          col("sq"), col("damped"))
        .orderBy(col("segment"), col("rk"))
    },

    // RFM segmentation — the CRM workhorse: recency / frequency /
    // monetary quintile codes per customer, then the segment census.
    // Quintile boundaries are percentile_disc DATA VALUES from one
    // aggregate (the q310 broadcast-boundaries pattern — no global
    // ntile), scores count boundaries strictly below the metric, so
    // with integer days/counts and decimal spend the coding is
    // bit-deterministic. Output is O(5³) segments with exact counts.
    "q345_rfm_segmentation" -> { (s, dir) =>
      val o = Tables.df(s, dir, "orders")
      val horizon = o.agg(max(col("o_orderdate")).as("maxd"))
      val per = o.groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("lastd"),
          count(lit(1)).as("f"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("m"))
        .crossJoin(broadcast(horizon))
        .select(col("o_custkey"),
          datediff(col("maxd").cast(DateType),
            col("lastd").cast(DateType)).cast(LongType).as("r"),
          col("f"), col("m"))
      def bnds(c: String) = array((1 to 4).map(i =>
        expr(s"percentile_disc(0.${i * 2}) WITHIN GROUP " +
          s"(ORDER BY $c)")): _*).as(s"b_$c")
      val b = per.agg(bnds("r"), bnds("f"), bnds("m"))
      def score(c: String) =
        (size(filter(col(s"b_$c"), x => col(c) > x)) + 1)
      per.crossJoin(broadcast(b))
        .select(
          // recent customers have SMALL r → invert so 5 = best
          (lit(6) - score("r")).as("r_s"),
          score("f").as("f_s"), score("m").as("m_s"), col("m"))
        .groupBy(col("r_s"), col("f_s"), col("m_s"))
        .agg(count(lit(1)).as("n_cust"),
          sum((col("m") * 100).cast(LongType)).as("sc"))
        // avg in CENTS with half-up integer division — a double
        // divide-then-round flips at .xx5 boundaries between engines
        .select(col("r_s"), col("f_s"), col("m_s"), col("n_cust"),
          (expr("(2 * sc + n_cust) div (2 * n_cust)") / 100.0)
            .as("avg_spend"))
        .orderBy(col("r_s"), col("f_s"), col("m_s"))
    },

    // Burst detection over the event stream — ops-analytics alarms:
    // a minute whose event count exceeds 1.5× its trailing-60-
    // observed-minutes average (with ≥10 minutes of baseline). The comparison
    // is CROSS-MULTIPLIED integers (2·cnt·n_prev > 3·sum_prev) so no
    // float enters the flag at all. The ordered window runs on the
    // O(distinct minutes) series; at 100 TB the same shape partitions
    // by day with a carried-in baseline.
    "q346_burst_detection" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val perMin = Tables.df(s, dir, "events")
        .groupBy(date_trunc("minute", col("ts")).as("minute"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy(col("minute")).rowsBetween(-60, -1)
      perMin
        .withColumn("n_prev", count(lit(1)).over(w))
        .withColumn("sum_prev", sum(col("cnt")).over(w))
        .filter(col("n_prev") >= 10 &&
          lit(2) * col("cnt") * col("n_prev") > lit(3) * col("sum_prev"))
        .select(col("minute").cast(StringType).as("minute"),
          col("cnt"), col("n_prev"), col("sum_prev"))
        .orderBy(col("minute"))
    },

    // Kaplan–Meier survival with RIGHT-CENSORING — time-to-event
    // analytics (here: days from first signup to first purchase;
    // users who never purchase are censored at end-of-data, NOT
    // dropped — dropping them is the classic bias KM exists to fix).
    // The survival product Π(1 − dₜ/nₜ) runs as exp of an ordered
    // window sum of logs, so both engines accumulate in the same
    // sequence; risk sets come from cumulative censuses over the
    // O(distinct days) table, and the curve is reported for the
    // first 30 days.
    "q344_kaplan_meier" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.df(s, dir, "events")
      val horizon = ev.agg(max(col("ts")).as("maxts"))
      val su = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
      val pu = ev.filter(col("event_type") === "purchase")
        .join(su, "user_id")
        .filter(col("ts") > col("t0"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("tp"))
      val per = su.join(pu, Seq("user_id"), "left")
        .crossJoin(broadcast(horizon))
        .select(col("user_id"),
          when(col("tp").isNotNull,
            datediff(col("tp").cast(DateType), col("t0").cast(DateType)))
            .otherwise(datediff(col("maxts").cast(DateType),
              col("t0").cast(DateType))).cast(LongType).as("t"),
          col("tp").isNotNull.as("event"))
      val days = per.groupBy(col("t"))
        .agg(sum(when(col("event"), 1L).otherwise(0L)).as("d"),
          count(lit(1)).as("leaving"))
      val nTot = per.agg(count(lit(1)).as("n_users"))
      val wPrev = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, 0)
      days.crossJoin(broadcast(nTot))
        .withColumn("left_before",
          coalesce(sum(col("leaving")).over(wPrev), lit(0L)))
        .withColumn("n_risk", col("n_users") - col("left_before"))
        // d == n_risk (everyone remaining has the event) makes the KM
        // factor 0 — an absorbing state, handled as an explicit flag
        // instead of ln(0) (Spark nulls it, DuckDB errors).
        .withColumn("lt", when(col("d") < col("n_risk"),
          log(lit(1.0) - col("d").cast(DoubleType) / col("n_risk"))))
        .withColumn("zf", max(when(col("d") === col("n_risk"), 1L)
          .otherwise(0L)).over(wCum))
        .withColumn("surv", when(col("zf") === 1, lit(0.0))
          .otherwise(exp(sum(col("lt")).over(wCum))))
        .filter(col("d") > 0 && col("t") <= 30)
        .select(col("t"), col("n_risk"), col("d"),
          round(col("surv"), 6).as("survival"))
        .orderBy(col("t"))
    }
  )

  /** DuckDB side of q365/q366: generated per-probe UNION ALLs from
    * the same target lists the engine iterates. */
  private val q365OracleSql: String =
    Seq(
      ("orders", "o_custkey"), ("orders", "o_orderstatus"),
      ("lineitem", "l_partkey"), ("lineitem", "l_returnflag"),
      ("customer", "c_nationkey"), ("customer", "c_mktsegment"),
      ("supplier", "s_nationkey"), ("part", "p_type"),
      ("events", "event_type"), ("documents", "lang"))
      .map { case (t, c) =>
        s"""SELECT '$t' AS tbl, '$c' AS col, count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_null,
           |  count(DISTINCT $c) AS n_distinct FROM $t""".stripMargin
      }.mkString("\nUNION ALL\n") + "\nORDER BY tbl, col"

  private val q366OracleSql: String =
    Seq(
      ("orders", Seq("o_orderkey")), ("orders", Seq("o_custkey")),
      ("lineitem", Seq("l_orderkey", "l_linenumber")),
      ("lineitem", Seq("l_orderkey")),
      ("customer", Seq("c_custkey")), ("events", Seq("event_id")),
      ("events", Seq("user_id", "ts")),
      ("documents", Seq("doc_id")))
      .map { case (t, cols) =>
        s"""SELECT '$t' AS tbl, '${cols.mkString("+")}' AS key_cols,
           |  count(*) AS n_keys,
           |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END)
           |    AS BIGINT) AS n_dup_rows,
           |  sum(CASE WHEN c > 1 THEN c ELSE 0 END) = 0
           |    AS is_candidate_key
           |FROM (SELECT count(*) AS c FROM $t
           |      GROUP BY ${cols.mkString(", ")})""".stripMargin
      }.mkString("\nUNION ALL\n") + "\nORDER BY tbl, key_cols"

  /** DuckDB side of q382: the 10 power-iteration steps unrolled. */
  private val q382OracleSql: String = {
    val steps = (1 to 10).map { i =>
      s"""v$i AS (
         |  SELECT p.dst AS state,
         |    CAST(sum(CAST(v${i - 1}.pi * p.p AS DECIMAL(28,18)))
         |      AS DOUBLE) AS pi
         |  FROM v${i - 1} JOIN p ON v${i - 1}.state = p.src
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH tr AS (
       |  SELECT user_id, event_type,
       |    lead(event_type) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS nxt
       |  FROM events),
       |trans AS (
       |  SELECT event_type AS src, nxt AS dst, count(*) AS c
       |  FROM tr WHERE nxt IS NOT NULL GROUP BY 1, 2),
       |rt AS (SELECT src, sum(c) AS rt FROM trans GROUP BY 1),
       |p AS MATERIALIZED (
       |  SELECT trans.src, dst, c::DOUBLE / rt AS p
       |  FROM trans JOIN rt ON trans.src = rt.src),
       |v0 AS (
       |  SELECT src AS state,
       |    1.0 / (SELECT count(DISTINCT src) FROM p) AS pi
       |  FROM (SELECT DISTINCT src FROM p)),
       |$steps
       |SELECT state, round(pi, 6) AS pi FROM v10
       |ORDER BY state""".stripMargin
  }

  override def oracle: Map[String, String] = Map(
    "q383_metrics_grains" ->
      """WITH base AS (
        |  SELECT
        |    CAST(CAST(date_trunc('month', o_orderdate) AS DATE)
        |      AS VARCHAR) AS m,
        |    CAST(year(o_orderdate) AS VARCHAR) || '-Q' ||
        |      CAST(quarter(o_orderdate) AS VARCHAR) AS q,
        |    CAST(year(o_orderdate) AS VARCHAR) AS y,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS v
        |  FROM orders)
        |SELECT grain, period, count(*) AS n_orders,
        |  CAST(sum(v) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT 'month' AS grain, m AS period, v FROM base
        |  UNION ALL SELECT 'quarter', q, v FROM base
        |  UNION ALL SELECT 'year', y, v FROM base)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q384_storage_tiering" ->
      """WITH horizon AS (SELECT max(l_shipdate) AS maxd
        |  FROM lineitem),
        |tiers AS (
        |  SELECT CASE
        |      WHEN date_diff('day', CAST(l_shipdate AS DATE),
        |        CAST(maxd AS DATE)) <= 90 THEN '1_hot'
        |      WHEN date_diff('day', CAST(l_shipdate AS DATE),
        |        CAST(maxd AS DATE)) <= 365 THEN '2_warm'
        |      ELSE '3_cold' END AS tier,
        |    68 + strlen(l_returnflag) + strlen(l_linestatus) AS b
        |  FROM lineitem, horizon),
        |per AS (
        |  SELECT tier, count(*) AS n_rows,
        |    CAST(sum(b) AS BIGINT) AS est_bytes
        |  FROM tiers GROUP BY 1)
        |SELECT tier, n_rows, est_bytes,
        |  round(est_bytes::DOUBLE
        |    / (SELECT sum(est_bytes) FROM per), 6) AS share
        |FROM per ORDER BY tier""".stripMargin,
    "q381_transition_dwell" ->
      """WITH tr AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER w AS nxt,
        |    lead(date_diff('second',
        |      TIMESTAMP '1970-01-01 00:00:00', ts)) OVER w -
        |      date_diff('second',
        |        TIMESTAMP '1970-01-01 00:00:00', ts) AS gap
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_type AS src, nxt AS dst, count(*) AS n,
        |  CAST(quantile_disc(gap, 0.5) AS DOUBLE) AS p50_gap_s,
        |  CAST(quantile_disc(gap, 0.9) AS DOUBLE) AS p90_gap_s
        |FROM tr WHERE nxt IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q382_markov_steady" -> q382OracleSql,
    "q365_profile_sweep" -> q365OracleSql,
    "q366_key_discovery" -> q366OracleSql,
    "q379_price_volume_decomp" ->
      """WITH li AS (
        |  SELECT l_partkey AS part, year(l_shipdate) AS y,
        |    CAST(sum(l_quantity) AS BIGINT) AS q,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 10000
        |      AS BIGINT) AS vc
        |  FROM lineitem WHERE year(l_shipdate) IN (1996, 1997)
        |  GROUP BY 1, 2),
        |priced AS (
        |  SELECT part, y, q, (2 * vc + q) // (2 * q) AS p4 FROM li),
        |basket AS (
        |  SELECT a.part, a.q AS q0, a.p4 AS p0,
        |    b.q AS q1, b.p4 AS p1
        |  FROM (SELECT * FROM priced WHERE y = 1996) a
        |  JOIN (SELECT * FROM priced WHERE y = 1997) b
        |    ON a.part = b.part)
        |SELECT count(*) AS n_parts,
        |  CAST(sum(CAST((q1 - q0) * p0 AS HUGEINT)) AS DOUBLE)
        |    / 10000.0 AS volume_effect,
        |  CAST(sum(CAST(q1 * (p1 - p0) AS HUGEINT)) AS DOUBLE)
        |    / 10000.0 AS price_effect,
        |  CAST(sum(CAST(q1 * p1 - q0 * p0 AS HUGEINT)) AS DOUBLE)
        |    / 10000.0 AS total_delta
        |FROM basket""".stripMargin,
    "q380_cohort_quality" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderdate, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS rk,
        |    count(*) OVER (PARTITION BY o_custkey) AS n_orders
        |  FROM orders),
        |flat AS (
        |  SELECT
        |    CAST(CAST(date_trunc('month', o_orderdate) AS DATE)
        |      AS VARCHAR) AS cohort,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT) AS first_cents,
        |    (n_orders > 1) AS repeater
        |  FROM r WHERE rk = 1)
        |SELECT cohort, count(*) AS n_new,
        |  ((2 * sum(first_cents) + count(*)) // (2 * count(*)))
        |    / 100.0 AS avg_first_value,
        |  round(sum(CASE WHEN repeater THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*), 6) AS repeat_share
        |FROM flat GROUP BY 1 ORDER BY 1""".stripMargin,
    "q378_churn_sensitivity" ->
      """WITH horizon AS (SELECT max(ts) AS maxts FROM events),
        |per AS (
        |  SELECT date_diff('day', CAST(max(ts) AS DATE),
        |    CAST((SELECT maxts FROM horizon) AS DATE)) AS age
        |  FROM events GROUP BY user_id)
        |SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN age > 30 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS churn30,
        |  CAST(sum(CASE WHEN age > 60 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS churn60,
        |  CAST(sum(CASE WHEN age > 90 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS churn90,
        |  round(sum(CASE WHEN age > 30 THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*), 6) AS rate30,
        |  round(sum(CASE WHEN age > 90 THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*), 6) AS rate90
        |FROM per""".stripMargin,
    "q373_transition_chi2" ->
      """WITH tr AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |obs AS (
        |  SELECT event_type AS src, nxt AS dst, count(*) AS obs
        |  FROM tr WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |rt AS (SELECT src, sum(obs) AS rt FROM obs GROUP BY 1),
        |ct AS (SELECT dst, sum(obs) AS ct FROM obs GROUP BY 1),
        |n AS (SELECT sum(obs) AS n FROM obs)
        |SELECT obs.src, obs.dst, obs,
        |  round(rt::DOUBLE * ct / n, 2) AS exp_n,
        |  round(pow(obs - rt::DOUBLE * ct / n, 2)
        |    / (rt::DOUBLE * ct / n), 4) AS chi2_part
        |FROM obs
        |JOIN rt ON obs.src = rt.src
        |JOIN ct ON obs.dst = ct.dst, n
        |ORDER BY obs.src, obs.dst""".stripMargin,
    "q374_hist2d" ->
      """WITH d AS (
        |  SELECT n_chars // 200 AS bx,
        |    len(string_split(text, ' ')) // 30 AS by
        |  FROM documents),
        |cells AS (
        |  SELECT bx, by, count(*) AS n FROM d GROUP BY 1, 2),
        |mx AS (SELECT bx, count(*) AS row_total FROM d GROUP BY 1),
        |my AS (SELECT by, count(*) AS col_total FROM d GROUP BY 1)
        |SELECT cells.bx, cells.by, n, row_total, col_total
        |FROM cells
        |JOIN mx ON cells.bx = mx.bx
        |JOIN my ON cells.by = my.by
        |ORDER BY cells.bx, cells.by""".stripMargin,
    "q371_skew_preflight" ->
      (Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag")
        .map { k =>
          s"""SELECT '$k' AS key,
             |  (SELECT count(DISTINCT $k) FROM lineitem) AS n_keys,
             |  round(max(c)::DOUBLE
             |    / (SELECT count($k) FROM lineitem), 6) AS top1_share,
             |  round(sum(c)::DOUBLE
             |    / (SELECT count($k) FROM lineitem), 6) AS top10_share
             |FROM (
             |  SELECT c FROM (
             |    SELECT $k AS kk, count(*) AS c,
             |      row_number() OVER (ORDER BY count(*) DESC, $k)
             |        AS rk
             |    FROM lineitem WHERE $k IS NOT NULL GROUP BY $k)
             |  WHERE rk <= 10)""".stripMargin
        }.mkString("\nUNION ALL\n") + "\nORDER BY key"),
    "q372_neyman_allocation" ->
      """WITH st AS (
        |  SELECT o_orderpriority AS stratum, count(*) AS n,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS sx,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) *
        |      CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(38,4)))
        |      AS sxx
        |  FROM orders GROUP BY 1),
        |en AS (
        |  SELECT stratum, n,
        |    sqrt(CAST(sxx AS DOUBLE) / n -
        |      (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
        |      AS sigma
        |  FROM st),
        |wgt AS (SELECT stratum, n, sigma, n * sigma AS wgt FROM en),
        |tot AS (SELECT sum(CAST(wgt AS DECIMAL(28,10))) AS tw
        |        FROM wgt),
        |based AS (
        |  SELECT stratum, n, sigma,
        |    wgt * 1000.0 / CAST(tw AS DOUBLE) AS exact_q,
        |    CAST(floor(wgt * 1000.0 / CAST(tw AS DOUBLE)) AS BIGINT)
        |      AS base,
        |    wgt * 1000.0 / CAST(tw AS DOUBLE) -
        |      floor(wgt * 1000.0 / CAST(tw AS DOUBLE)) AS rem
        |  FROM wgt, tot),
        |lo AS (SELECT 1000 - sum(base) AS lo FROM based),
        |ranked AS (
        |  SELECT stratum, n, sigma, base,
        |    row_number() OVER (ORDER BY rem DESC, stratum) AS rk
        |  FROM based)
        |SELECT stratum, n, round(sigma, 2) AS sigma,
        |  base + CASE WHEN rk <= lo THEN 1 ELSE 0 END AS quota
        |FROM ranked, lo ORDER BY stratum""".stripMargin,
    "q370_decayed_popularity" ->
      """WITH horizon AS (SELECT max(o_orderdate) AS maxd FROM orders),
        |base AS (
        |  SELECT l_partkey AS part,
        |    CAST(100.0 / (100 + date_diff('day',
        |      CAST(o_orderdate AS DATE), CAST(maxd AS DATE)))
        |      AS DECIMAL(18,10)) AS w
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey, horizon),
        |per AS (
        |  SELECT part, count(*) AS n, sum(w) AS dsum
        |  FROM base GROUP BY 1),
        |ranked AS (
        |  SELECT part, n, dsum,
        |    row_number() OVER (ORDER BY dsum DESC, part)
        |      AS rk_decayed,
        |    row_number() OVER (ORDER BY n DESC, part) AS rk_plain
        |  FROM per)
        |SELECT CAST(rk_decayed AS BIGINT) AS rk_decayed, part, n,
        |  round(CAST(dsum AS DOUBLE), 4) AS decayed,
        |  CAST(rk_plain AS BIGINT) AS rk_plain
        |FROM ranked WHERE rk_decayed <= 10
        |ORDER BY rk_decayed""".stripMargin,
    "q369_autocorrelation" ->
      """WITH monthly AS (
        |  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mi,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |      AS HUGEINT) AS vc
        |  FROM orders GROUP BY 1),
        |pairs AS (
        |  SELECT b.mi - a.mi AS lag, a.vc AS x, b.vc AS y
        |  FROM monthly a JOIN monthly b
        |    ON b.mi - a.mi BETWEEN 1 AND 12),
        |m AS (
        |  SELECT lag, count(*) AS n_pairs,
        |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
        |    sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM pairs GROUP BY 1)
        |SELECT lag, n_pairs,
        |  round(CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))), 4)
        |    AS acf
        |FROM m ORDER BY lag""".stripMargin,
    "q363_target_encoding" ->
      """WITH o AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |g AS (SELECT seg, sum(y) AS sy, count(*) AS n
        |      FROM o GROUP BY 1),
        |prior AS (
        |  SELECT CAST(sum(y) AS DOUBLE) / count(*) AS prior FROM o),
        |enc AS (
        |  SELECT o.seg,
        |    CAST((CAST(sy - y AS DOUBLE) + 10.0 * prior)
        |      / (n - 1 + 10) AS DECIMAL(18,6)) AS encd
        |  FROM o JOIN g ON o.seg = g.seg, prior)
        |SELECT seg, count(*) AS n,
        |  round(CAST(min(encd) AS DOUBLE), 4) AS enc_min,
        |  round(CAST(sum(encd) AS DOUBLE) / count(*), 4) AS enc_avg,
        |  round(CAST(max(encd) AS DOUBLE), 4) AS enc_max
        |FROM enc GROUP BY 1 ORDER BY 1""".stripMargin,
    "q364_calibration_ece" ->
      """WITH scored AS (
        |  SELECT
        |    1.0 / (1.0 + exp(-list_sum(list_transform(
        |      generate_series(0, 63),
        |      i -> embedding[i + 1] * (((i * 37) % 101 - 50) / 100.0)))))
        |      AS score,
        |    (label % 2 = 0) AS truth
        |  FROM embeddings),
        |binned AS (
        |  SELECT least(10, CAST(floor(score * 10) AS BIGINT) + 1)
        |      AS bin,
        |    score, truth
        |  FROM scored),
        |per AS (
        |  SELECT bin, count(*) AS n,
        |    sum(CASE WHEN truth THEN 1 ELSE 0 END) AS n_pos,
        |    sum(CAST(score AS DECIMAL(18,8))) AS ssum
        |  FROM binned GROUP BY 1),
        |tot AS (SELECT sum(n) AS nt FROM per)
        |SELECT bin, n,
        |  round(CAST(ssum AS DOUBLE) / n, 6) AS pred_rate,
        |  round(n_pos::DOUBLE / n, 6) AS obs_rate,
        |  round(abs(CAST(ssum AS DOUBLE) / n - n_pos::DOUBLE / n)
        |    * n / nt, 6) AS ece_part
        |FROM per, tot ORDER BY bin""".stripMargin,
    "q361_largest_remainder" ->
      """WITH cnt AS (
        |  SELECT n_name AS nation, count(*) AS n_orders
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1),
        |tot AS (SELECT sum(n_orders) AS t FROM cnt),
        |based AS (
        |  SELECT nation, n_orders,
        |    (n_orders * 10000) // t AS base,
        |    (n_orders * 10000) % t AS rem
        |  FROM cnt, tot),
        |lo AS (SELECT 10000 - sum(base) AS lo FROM based),
        |ranked AS (
        |  SELECT nation, n_orders, base,
        |    row_number() OVER (ORDER BY rem DESC, nation) AS rk
        |  FROM based)
        |SELECT nation, n_orders,
        |  CAST(base + CASE WHEN rk <= lo THEN 1 ELSE 0 END
        |    AS BIGINT) AS alloc
        |FROM ranked, lo ORDER BY nation""".stripMargin,
    "q359_interval_coverage" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
        |      AS te,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR date_diff('second', lag(ts) OVER w, ts) > 28800
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sids AS (
        |  SELECT user_id, te,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS sid
        |  FROM marked),
        |sessions AS (
        |  SELECT user_id, sid, min(te) AS t0, max(te) AS t1
        |  FROM sids GROUP BY 1, 2),
        |bounds AS (
        |  SELECT t0 AS t, 1 AS delta FROM sessions
        |  UNION ALL SELECT t1, -1 FROM sessions),
        |sweep AS (
        |  SELECT t, delta,
        |    sum(delta) OVER (ORDER BY t, delta ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS live,
        |    lead(t) OVER (ORDER BY t, delta) AS t_next
        |  FROM bounds),
        |seg AS (
        |  SELECT live, t, t_next - t AS dt FROM sweep
        |  WHERE t_next IS NOT NULL)
        |SELECT
        |  CAST(sum(CASE WHEN live >= 1 THEN dt ELSE 0 END)
        |    AS BIGINT) AS union_seconds,
        |  CAST(sum(live * dt) AS BIGINT) AS occupancy_seconds,
        |  max(t) - min(t) AS span_seconds,
        |  round(sum(live * dt)::DOUBLE / (max(t) - min(t)), 4)
        |    AS avg_concurrency,
        |  round(sum(CASE WHEN live >= 1 THEN dt ELSE 0 END)::DOUBLE
        |    / (max(t) - min(t)), 4) AS busy_share
        |FROM seg""".stripMargin,
    "q357_path_entropy" ->
      """WITH tr AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |cnts AS (
        |  SELECT user_id, event_type, nxt, count(*) AS c
        |  FROM tr WHERE nxt IS NOT NULL GROUP BY 1, 2, 3),
        |pu AS (SELECT user_id, sum(c) AS n FROM cnts GROUP BY 1),
        |ent AS (
        |  SELECT c.user_id,
        |    CAST(sum(CAST(-(c.c::DOUBLE / n) * ln(c.c::DOUBLE / n)
        |      AS DECIMAL(18,10))) AS DOUBLE) AS h
        |  FROM cnts c JOIN pu ON c.user_id = pu.user_id
        |  GROUP BY 1)
        |SELECT count(*) AS n_users, round(min(h), 6) AS h_min,
        |  round(max(h), 6) AS h_max,
        |  round(quantile_disc(h, 0.5), 6) AS h_median
        |FROM ent""".stripMargin,
    "q358_peak_concurrency" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR date_diff('second', lag(ts) OVER w, ts) > 28800
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sids AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS sid
        |  FROM marked),
        |sessions AS (
        |  SELECT user_id, sid, min(ts) AS t0, max(ts) AS t1
        |  FROM sids GROUP BY 1, 2),
        |bounds AS (
        |  SELECT t0 AS t, 1 AS delta FROM sessions
        |  UNION ALL SELECT t1, -1 FROM sessions),
        |sweep AS (
        |  SELECT t, delta,
        |    sum(delta) OVER (ORDER BY t, delta ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) AS live
        |  FROM bounds)
        |SELECT count(*) AS n_boundaries,
        |  CAST(count(*) / 2 AS BIGINT) AS n_sessions,
        |  CAST(max(live) AS BIGINT) AS peak_concurrency,
        |  CAST(min(CASE WHEN live = (SELECT max(live) FROM sweep)
        |    THEN t END) AS VARCHAR) AS peak_at
        |FROM sweep""".stripMargin,
    "q355_ab_ztest" ->
      """WITH expo AS (
        |  SELECT user_id, min(ts) AS exposure FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |fp AS (
        |  SELECT e.user_id, min(ts) AS fp FROM events e
        |  JOIN expo ON e.user_id = expo.user_id
        |  WHERE event_type = 'purchase' AND ts > exposure GROUP BY 1),
        |per AS (
        |  SELECT CASE WHEN substr(md5(
        |      'ab' || CAST(expo.user_id AS VARCHAR)), 1, 2) < '80'
        |      THEN 'A' ELSE 'B' END AS variant,
        |    (fp.fp IS NOT NULL
        |      AND fp.fp <= exposure + INTERVAL 6 HOUR) AS conv
        |  FROM expo LEFT JOIN fp ON expo.user_id = fp.user_id),
        |cells AS (
        |  SELECT variant, count(*) AS n,
        |    sum(CASE WHEN conv THEN 1 ELSE 0 END) AS c
        |  FROM per GROUP BY 1),
        |j AS (
        |  SELECT a.n AS na, a.c AS ca, b.n AS nb, b.c AS cb,
        |    a.c::DOUBLE / a.n AS pa, b.c::DOUBLE / b.n AS pb,
        |    (a.c + b.c)::DOUBLE / (a.n + b.n) AS pp
        |  FROM (SELECT * FROM cells WHERE variant = 'A') a,
        |       (SELECT * FROM cells WHERE variant = 'B') b)
        |SELECT na, nb, round(pa, 6) AS conv_a, round(pb, 6) AS conv_b,
        |  round((pa - pb) / sqrt(pp * (1.0 - pp)
        |    * (1.0 / na + 1.0 / nb)), 4) AS z,
        |  abs((pa - pb) / sqrt(pp * (1.0 - pp)
        |    * (1.0 / na + 1.0 / nb))) > 1.96 AS significant,
        |  CAST(ceil(2.0 * pp * (1.0 - pp)
        |    * ((1.96 + 0.8416) * (1.96 + 0.8416)) / 0.0004)
        |    AS BIGINT) AS n_required
        |FROM j""".stripMargin,
    "q356_diff_in_diff" ->
      """WITH d AS (
        |  SELECT user_id, value,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |      AS days
        |  FROM events),
        |cutoff AS (SELECT quantile_disc(days, 0.5) AS cut FROM d),
        |cells AS (
        |  SELECT
        |    CASE WHEN substr(md5('ab' || CAST(user_id AS VARCHAR)),
        |      1, 2) < '80' THEN 'A' ELSE 'B' END AS variant,
        |    CASE WHEN days >= cut THEN 'post'
        |      ELSE 'pre' END AS period,
        |    count(*) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |      / count(*) AS m
        |  FROM d, cutoff GROUP BY 1, 2)
        |SELECT a0.n AS n_a0, a1.n AS n_a1, b0.n AS n_b0,
        |  b1.n AS n_b1,
        |  round(a0.m, 4) AS m_a_pre, round(a1.m, 4) AS m_a_post,
        |  round(b0.m, 4) AS m_b_pre, round(b1.m, 4) AS m_b_post,
        |  round((b1.m - b0.m) - (a1.m - a0.m), 4) AS did
        |FROM (SELECT * FROM cells WHERE variant = 'A'
        |      AND period = 'pre') a0,
        |  (SELECT * FROM cells WHERE variant = 'A'
        |   AND period = 'post') a1,
        |  (SELECT * FROM cells WHERE variant = 'B'
        |   AND period = 'pre') b0,
        |  (SELECT * FROM cells WHERE variant = 'B'
        |   AND period = 'post') b1""".stripMargin,
    "q353_gini_concentration" ->
      """WITH per AS (
        |  SELECT o_custkey,
        |    sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS xc
        |  FROM orders GROUP BY 1),
        |ranked AS (
        |  SELECT xc,
        |    row_number() OVER (ORDER BY xc, o_custkey) AS r,
        |    row_number() OVER (ORDER BY xc DESC, o_custkey) AS rd
        |  FROM per),
        |n AS (SELECT count(*) AS n FROM per)
        |SELECT n,
        |  CAST(sum(CAST(xc AS HUGEINT)) AS DOUBLE) / 100.0
        |    AS total_spend,
        |  round(2.0 * CAST(sum(CAST(r AS HUGEINT) * xc) AS DOUBLE)
        |    / (n * CAST(sum(CAST(xc AS HUGEINT)) AS DOUBLE))
        |    - (n + 1.0) / n, 6) AS gini,
        |  round(CAST(sum(CASE WHEN rd <= greatest(1, n // 10)
        |      THEN CAST(xc AS HUGEINT) ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(CAST(xc AS HUGEINT)) AS DOUBLE), 6)
        |    AS top10_share
        |FROM ranked, n GROUP BY n""".stripMargin,
    "q354_price_index" ->
      """WITH li AS (
        |  SELECT l_partkey AS part, year(l_shipdate) AS y,
        |    sum(l_quantity) AS q,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
        |  FROM lineitem WHERE year(l_shipdate) IN (1996, 1997)
        |  GROUP BY 1, 2),
        |basket AS (
        |  SELECT a.part, a.q AS q0, CAST(a.v AS DOUBLE) / a.q AS p0,
        |    b.q AS q1, CAST(b.v AS DOUBLE) / b.q AS p1
        |  FROM (SELECT * FROM li WHERE y = 1996) a
        |  JOIN (SELECT * FROM li WHERE y = 1997) b
        |    ON a.part = b.part),
        |sums AS (
        |  SELECT count(*) AS n_parts,
        |    sum(CAST(p1 * q0 AS DECIMAL(18,4))) AS l_num,
        |    sum(CAST(p0 * q0 AS DECIMAL(18,4))) AS l_den,
        |    sum(CAST(p1 * q1 AS DECIMAL(18,4))) AS p_num,
        |    sum(CAST(p0 * q1 AS DECIMAL(18,4))) AS p_den
        |  FROM basket)
        |SELECT n_parts,
        |  round(CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE), 6)
        |    AS laspeyres,
        |  round(CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE), 6)
        |    AS paasche,
        |  round(sqrt((CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE))
        |    * (CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE))), 6)
        |    AS fisher
        |FROM sums""".stripMargin,
    "q351_conformal_coverage" ->
      """WITH scored AS (
        |  SELECT doc_id,
        |    abs(sqrt(list_sum(list_transform(embedding::DOUBLE[],
        |      v -> v * v))) - (0.8 + 0.0001 * CAST(n_chars AS DOUBLE)))
        |      AS resid,
        |    substr(md5('conf' || CAST(doc_id AS VARCHAR)), 1, 2) < '80'
        |      AS cal
        |  FROM documents JOIN embeddings ON doc_id = vec_id),
        |q AS (
        |  SELECT quantile_disc(resid, 0.9) AS qhat,
        |    count(*) AS n_cal
        |  FROM scored WHERE cal)
        |SELECT n_cal, count(*) AS n_eval,
        |  round(qhat, 6) AS q90,
        |  round(sum(CASE WHEN resid <= qhat THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*), 6) AS coverage
        |FROM scored, q WHERE NOT cal
        |GROUP BY n_cal, qhat""".stripMargin,
    "q352_binned_ks" ->
      """WITH o AS (
        |  SELECT o_totalprice AS p, o_orderstatus AS st FROM orders
        |  WHERE o_orderstatus IN ('F', 'O')),
        |bounds AS (SELECT min(p) AS lo, max(p) AS hi FROM o),
        |per AS (
        |  SELECT CASE WHEN p < lo THEN 0
        |      WHEN p >= hi + 1.0 THEN 51
        |      ELSE 1 + CAST(floor((p - lo) * 50
        |        / (hi + 1.0 - lo)) AS BIGINT) END AS bkt,
        |    sum(CASE WHEN st = 'F' THEN 1 ELSE 0 END) AS nf,
        |    sum(CASE WHEN st = 'O' THEN 1 ELSE 0 END) AS no
        |  FROM o, bounds GROUP BY 1),
        |tot AS (SELECT sum(nf) AS tf, sum(no) AS t_o FROM per),
        |cum AS (
        |  SELECT bkt,
        |    abs(sum(nf) OVER (ORDER BY bkt ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW)::DOUBLE / tf -
        |      sum(no) OVER (ORDER BY bkt ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW)::DOUBLE / t_o) AS gap,
        |    tf, t_o
        |  FROM per, tot)
        |SELECT CAST(min(tf) AS BIGINT) AS n_f,
        |  CAST(min(t_o) AS BIGINT) AS n_o,
        |  round(max(gap), 6) AS ks,
        |  min(CASE WHEN gap = (SELECT max(gap) FROM cum)
        |    THEN bkt END) AS ks_bucket
        |FROM cum""".stripMargin,
    "q349_incremental_refresh" ->
      """SELECT event_type AS et, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q350_lambda_serving" ->
      """WITH cutoff AS (
        |  SELECT CAST(max(ts) AS DATE) - INTERVAL 7 DAY AS cut
        |  FROM events)
        |SELECT event_type AS et, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v,
        |  CAST(sum(CASE WHEN CAST(ts AS DATE) < cut THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_batch,
        |  CAST(sum(CASE WHEN CAST(ts AS DATE) >= cut THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_speed
        |FROM events, cutoff GROUP BY 1 ORDER BY 1""".stripMargin,
    "q347_scenario_grid" ->
      """WITH actual AS (
        |  SELECT sum(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,4))) AS actual
        |  FROM lineitem),
        |grid AS (
        |  SELECT cap,
        |    sum(CAST(l_extendedprice *
        |      (1.0 - least(l_discount, cap)) AS DECIMAL(18,4))) AS rev
        |  FROM lineitem,
        |    unnest([0.0, 0.02, 0.04, 0.06, 0.08]) AS t(cap)
        |  GROUP BY 1)
        |SELECT cap, CAST(rev AS DOUBLE) AS revenue,
        |  CAST(rev - actual AS DOUBLE) AS uplift
        |FROM grid, actual ORDER BY cap""".stripMargin,
    "q348_damped_popularity" ->
      """WITH base AS (
        |  SELECT c_mktsegment AS segment, l_partkey AS part,
        |    CAST(l_quantity AS BIGINT) AS q
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey),
        |prior AS (
        |  SELECT sum(q)::DOUBLE / count(*) AS prior FROM base),
        |scored AS (
        |  SELECT segment, part, n, sq,
        |    round((sq + 10.0 * prior) / (n + 10), 6) AS damped
        |  FROM (SELECT segment, part, count(*) AS n,
        |          CAST(sum(q) AS BIGINT) AS sq
        |        FROM base GROUP BY 1, 2), prior),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY segment
        |    ORDER BY damped DESC, part) AS rk
        |  FROM scored)
        |SELECT segment, CAST(rk AS BIGINT) AS rk, part, n, sq, damped
        |FROM ranked WHERE rk <= 5
        |ORDER BY segment, rk""".stripMargin,
    "q345_rfm_segmentation" ->
      """WITH horizon AS (SELECT max(o_orderdate) AS maxd FROM orders),
        |per AS (
        |  SELECT o_custkey,
        |    date_diff('day', CAST(lastd AS DATE), CAST(maxd AS DATE))
        |      AS r,
        |    f, m
        |  FROM (SELECT o_custkey, max(o_orderdate) AS lastd,
        |          count(*) AS f,
        |          sum(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |        FROM orders GROUP BY 1), horizon),
        |b AS (
        |  SELECT [quantile_disc(r, 0.2), quantile_disc(r, 0.4),
        |          quantile_disc(r, 0.6), quantile_disc(r, 0.8)] AS br,
        |    [quantile_disc(f, 0.2), quantile_disc(f, 0.4),
        |     quantile_disc(f, 0.6), quantile_disc(f, 0.8)] AS bf,
        |    [quantile_disc(m, 0.2), quantile_disc(m, 0.4),
        |     quantile_disc(m, 0.6), quantile_disc(m, 0.8)] AS bm
        |  FROM per),
        |coded AS (
        |  SELECT
        |    6 - (len(list_filter(br, x -> r > x)) + 1) AS r_s,
        |    len(list_filter(bf, x -> f > x)) + 1 AS f_s,
        |    len(list_filter(bm, x -> m > x)) + 1 AS m_s,
        |    m
        |  FROM per, b)
        |SELECT r_s, f_s, m_s, n_cust,
        |  ((2 * sc + n_cust) // (2 * n_cust)) / 100.0 AS avg_spend
        |FROM (
        |  SELECT r_s, f_s, m_s, count(*) AS n_cust,
        |    sum(CAST(m * 100 AS BIGINT)) AS sc
        |  FROM coded GROUP BY 1, 2, 3)
        |ORDER BY 1, 2, 3""".stripMargin,
    "q346_burst_detection" ->
      """WITH perMin AS (
        |  SELECT date_trunc('minute', ts) AS minute,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1),
        |w AS (
        |  SELECT minute, cnt,
        |    count(*) OVER (ORDER BY minute
        |      ROWS BETWEEN 60 PRECEDING AND 1 PRECEDING) AS n_prev,
        |    CAST(sum(cnt) OVER (ORDER BY minute
        |      ROWS BETWEEN 60 PRECEDING AND 1 PRECEDING)
        |      AS BIGINT) AS sum_prev
        |  FROM perMin)
        |SELECT CAST(minute AS VARCHAR) AS minute, cnt, n_prev,
        |  sum_prev
        |FROM w
        |WHERE n_prev >= 10 AND 2 * cnt * n_prev > 3 * sum_prev
        |ORDER BY minute""".stripMargin,
    "q342_bootstrap_ci" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS x
        |  FROM orders),
        |re AS (
        |  SELECT r, x,
        |    CASE WHEN b < 94 THEN 0 WHEN b < 188 THEN 1
        |      WHEN b < 235 THEN 2 ELSE 3 END AS w
        |  FROM (
        |    SELECT x, r,
        |      (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16 +
        |      (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) AS b
        |    FROM (
        |      SELECT x, r, md5('boot' || CAST(r AS VARCHAR) || '_'
        |        || CAST(k AS VARCHAR)) AS h
        |      FROM o, unnest(generate_series(1, 20)) AS t(r)))),
        |means AS (
        |  SELECT r, CAST(sum(x * w) AS DOUBLE) / sum(w) AS mean_r
        |  FROM re GROUP BY 1),
        |base AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(x) AS DOUBLE) / count(*) AS mean FROM o)
        |SELECT n, round(mean, 2) AS mean,
        |  round(quantile_disc(mean_r, 0.05), 2) AS ci_lo,
        |  round(quantile_disc(mean_r, 0.95), 2) AS ci_hi
        |FROM means, base GROUP BY n, mean""".stripMargin,
    "q343_benford_audit" ->
      """WITH digits AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS INTEGER) AS d,
        |    count(*) AS n_obs
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT sum(n_obs) AS n FROM digits)
        |SELECT d, n_obs,
        |  round(n * log10(1.0 + 1.0 / d), 2) AS exp_n,
        |  round(pow(n_obs - n * log10(1.0 + 1.0 / d), 2)
        |    / (n * log10(1.0 + 1.0 / d)), 4) AS chi2_part
        |FROM digits, tot ORDER BY d""".stripMargin,
    "q344_kaplan_meier" ->
      """WITH horizon AS (SELECT max(ts) AS maxts FROM events),
        |su AS (
        |  SELECT user_id, min(ts) AS t0 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |pu AS (
        |  SELECT e.user_id, min(ts) AS tp FROM events e
        |  JOIN su ON e.user_id = su.user_id
        |  WHERE event_type = 'purchase' AND ts > t0 GROUP BY 1),
        |per AS (
        |  SELECT su.user_id,
        |    CASE WHEN tp IS NOT NULL
        |      THEN date_diff('day', CAST(t0 AS DATE), CAST(tp AS DATE))
        |      ELSE date_diff('day', CAST(t0 AS DATE),
        |        CAST(maxts AS DATE)) END AS t,
        |    (tp IS NOT NULL) AS event
        |  FROM su LEFT JOIN pu ON su.user_id = pu.user_id, horizon),
        |days AS (
        |  SELECT t,
        |    CAST(sum(CASE WHEN event THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |    count(*) AS leaving
        |  FROM per GROUP BY 1),
        |n AS (SELECT count(*) AS n_users FROM per),
        |risk AS (
        |  SELECT t, d,
        |    CAST(n_users - coalesce(sum(leaving) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n_risk
        |  FROM days, n),
        |curve AS (
        |  SELECT t, d, n_risk,
        |    CASE WHEN max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
        |        OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |          AND CURRENT ROW) = 1 THEN 0.0
        |      ELSE exp(sum(CASE WHEN d < n_risk
        |          THEN ln(1.0 - d::DOUBLE / n_risk) END)
        |        OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
        |          AND CURRENT ROW)) END AS surv
        |  FROM risk)
        |SELECT t, n_risk, d, round(surv, 6) AS survival
        |FROM curve WHERE d > 0 AND t <= 30
        |ORDER BY t""".stripMargin
  )
}
