package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second analytics module: interval-overlap joins, two-fact cumulative
  * comparison (TPC-DS Q51 topology), multi-band census (TPC-DS Q88
  * topology), and batch sessionization — the event-analytics shapes the
  * reference's TPC-DS corpus exercises beyond plain star joins.
  *
  * Scale conventions shared with Analytics.scala: exact-decimal money
  * math (×10000 longs, divided once at the end), broadcast dims, and
  * every self-/theta-join re-expressed so the fact never feeds a
  * nested-loop pair.
  */
object Analytics2 extends QueryModule {

  private val D4 = DecimalType(18, 4)

  /** 2h in microseconds — q202's bin width (= the longer interval). */
  private val BinUs = 7200000000L

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // INTERVAL-OVERLAP join — both sides are intervals, the harder
    // cousin of q108's point-in-interval bin join. Purchases open a 2h
    // exposure window, errors a 1h incident window; report how many
    // error windows overlap each purchase window (no equi key at all,
    // so the naive plan is an O(n·m) nested loop). Scale technique:
    // quantize time into bins of the longer interval width; each
    // interval explodes to the ≤2 bins it touches, pairs equi-join on
    // the bin, and the canonical-bin predicate (bin == the LATER of the
    // two start bins) keeps exactly one copy of each overlapping pair
    // without a distinct — the dedup is free, inside the join. The
    // shuffle carries (id, start, bin) only and the join is a plain
    // hash join, so the plan survives 100× data where a BNLJ would
    // not. Zero-overlap purchases are restored by a left join at the
    // end (cheap: purchase-id grain).
    "q202_interval_overlap" -> { (s, dir) =>
      val ev = Tables.df(s, dir, "events")
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), unix_micros(col("ts")).as("pa"))
        .withColumn("pe", col("pa") + lit(7200000000L))
      val errs = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("e_id"), unix_micros(col("ts")).as("eb"))
        .withColumn("ee", col("eb") + lit(3600000000L))
      val pBins = purch.withColumn("bin",
        explode(sequence(expr(s"pa div $BinUs"), expr(s"(pe - 1) div $BinUs"))))
      val eBins = errs.withColumn("bin",
        explode(sequence(expr(s"eb div $BinUs"), expr(s"(ee - 1) div $BinUs"))))
      val pairs = pBins.join(eBins,
        pBins("bin") === eBins("bin") &&
          col("pa") < col("ee") && col("eb") < col("pe") &&
          eBins("bin") === greatest(
            expr(s"pa div $BinUs"), expr(s"eb div $BinUs")))
      val counts = pairs.groupBy(col("p_id")).agg(count(lit(1)).as("n_err"))
      purch.select(col("p_id")).join(counts, Seq("p_id"), "left")
        .select(col("p_id").as("event_id"),
          coalesce(col("n_err"), lit(0L)).as("n_err"))
        .orderBy(col("event_id"))
    },

    // TPC-DS Q51 topology: cumulative comparison of TWO DIFFERENT
    // facts. Channel 1 = order intake per customer nation per month
    // (orders → customer → nation); channel 2 = shipped supply per
    // supplier nation per month (lineitem → supplier → nation). The
    // channels FULL OUTER join at (nation, month) grain — genuinely
    // needed here because a nation can have intake months with no
    // shipments and vice versa — then one window pass computes both
    // running totals and keeps the months where cumulative intake has
    // pulled ahead of cumulative supply. Both facts shuffle once at
    // their natural aggregate grain; the join and window run on
    // (nation × month) rows, thousands at any scale.
    "q203_cumulative_fullouter" -> { (s, dir) =>
      val intake = Tables.df(s, dir, "orders")
        .join(broadcast(Tables.df(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.df(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("i_n"),
          date_format(col("o_orderdate"), "yyyy-MM").as("i_mo"))
        .agg((sum(col("o_totalprice").cast(D4)) * 10000)
          .cast(LongType).as("intake_i"))
      val supply = Tables.df(s, dir, "lineitem")
        .join(broadcast(Tables.df(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.df(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("s_n"),
          date_format(col("l_shipdate"), "yyyy-MM").as("s_mo"))
        .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(D4)) * 10000).cast(LongType).as("supply_i"))
      val w = Window.partitionBy(col("n_name")).orderBy(col("mo"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      intake.join(supply,
          col("i_n") === col("s_n") && col("i_mo") === col("s_mo"),
          "full_outer")
        .select(coalesce(col("i_n"), col("s_n")).as("n_name"),
          coalesce(col("i_mo"), col("s_mo")).as("mo"),
          coalesce(col("intake_i"), lit(0L)).as("intake_i"),
          coalesce(col("supply_i"), lit(0L)).as("supply_i"))
        .withColumn("cum_intake_i", sum(col("intake_i")).over(w))
        .withColumn("cum_supply_i", sum(col("supply_i")).over(w))
        .filter(col("cum_intake_i") > col("cum_supply_i"))
        .select(col("n_name"), col("mo"),
          (col("cum_intake_i").cast(DoubleType) / 10000).as("cum_intake"),
          (col("cum_supply_i").cast(DoubleType) / 10000).as("cum_supply"))
        .orderBy(col("n_name"), col("mo"))
    },

    // TPC-DS Q88 topology: a census of N independent COUNT(*) scalar
    // subqueries over the same fact with different band predicates
    // (Q88 does 8 half-hour store-traffic bands), cross-joined into one
    // row. The literal formulation scans the fact 8 times; the engine
    // collapses all 8 into ONE pass of conditional aggregation — one
    // scan, one map-side-combined agg, a single-row result. The oracle
    // runs the literal 8-subquery SQL, so the rewrite is checked
    // against the un-rewritten semantics.
    "q204_band_census" -> { (s, dir) =>
      def band(lo: Int, hi: Int): Column =
        sum(when(col("l_quantity").between(lo, hi), lit(1L))
          .otherwise(lit(0L)))
      Tables.df(s, dir, "lineitem")
        .filter((col("l_returnflag") === "R" && col("l_discount") <= 0.06) ||
          (col("l_returnflag") =!= "R" && col("l_tax") > 0.02))
        .agg(
          band(1, 6).as("b1"), band(7, 12).as("b2"),
          band(13, 18).as("b3"), band(19, 24).as("b4"),
          band(25, 30).as("b5"), band(31, 36).as("b6"),
          band(37, 42).as("b7"), band(43, 48).as("b8"))
    },

    // Batch sessionization — the funnel-analytics primitive (and the
    // batch twin of q130's streaming session_window): per-user event
    // streams split into sessions wherever the inter-event gap exceeds
    // 8h, then per-session shape stats. One hash shuffle on user_id
    // feeds BOTH window passes and the final aggregate (all three are
    // user_id-keyed, so Catalyst reuses the single exchange), and
    // state per key is one row — at 100 TB this is the one-shuffle
    // layout a sessionizer needs. Ordering inside a user is (ts,
    // event_id) — a total order, so lag/cumsum are deterministic; the
    // gap itself compares ts only, so equal-ts ties cannot flip
    // session boundaries.
    "q205_sessionize" -> { (s, dir) =>
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val gapUs = 8L * 3600L * 1000000L
      Tables.df(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("new_sess",
          when(col("us") - lag(col("us"), 1).over(byUser) <= gapUs, lit(0L))
            .otherwise(lit(1L)))
        .withColumn("sess_seq", sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_seq"))
        .agg(count(lit(1)).as("n_events"),
          expr("(max(us) - min(us)) div 1000000").as("dur_sec"),
          sum(when(col("event_type") === "purchase", lit(1L))
            .otherwise(lit(0L))).as("n_purchases"))
        .orderBy(col("user_id"), col("sess_seq"))
    },

    // Time-series gap filling — the dashboard/forecasting prerequisite:
    // a dense (nation × month) spine with missing months carried
    // forward from the last observed value. The spine is built IN-PLAN
    // (single-row min/max aggregate → sequence() explode → cross join
    // with the 25-row nation dim), so no driver collect and no
    // hand-materialized calendar table; the carry-forward is
    // last-non-null over one nation-keyed window pass. At scale the
    // spine is dims × months (thousands of rows) regardless of fact
    // size — the fact collapses to its monthly aggregate first.
    "q209_gap_fill" -> { (s, dir) =>
      val actual = Tables.df(s, dir, "orders")
        .join(broadcast(Tables.df(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.df(s, dir, "nation")
            .select(col("n_nationkey"), col("n_name").as("a_n"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("a_n"), date_format(col("o_orderdate"), "yyyy-MM")
          .as("a_mo"))
        .agg((sum(col("o_totalprice").cast(D4)) * 10000)
          .cast(LongType).as("rev_i"))
      val months = Tables.df(s, dir, "orders")
        .agg(date_trunc("month", min(col("o_orderdate")))
            .cast(DateType).as("lo"),
          date_trunc("month", max(col("o_orderdate")))
            .cast(DateType).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 month"))).as("m"))
        .select(date_format(col("m"), "yyyy-MM").as("mo"))
      val spine = Tables.df(s, dir, "nation").select(col("n_name"))
        .crossJoin(broadcast(months))
      val w = Window.partitionBy(col("n_name")).orderBy(col("mo"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(actual,
          col("n_name") === col("a_n") && col("mo") === col("a_mo"),
          "left")
        .select(col("n_name"), col("mo"), col("rev_i"))
        .withColumn("fill_i", last(col("rev_i"), ignoreNulls = true).over(w))
        .select(col("n_name"), col("mo"),
          (col("fill_i").cast(DoubleType) / 10000).as("rev"),
          col("rev_i").isNull.as("is_filled"))
        .orderBy(col("n_name"), col("mo"))
    },

    // Weekly cohort retention — the product-analytics matrix: users
    // grouped by their first-activity week, then for each (cohort,
    // weeks-since) cell the count of cohort members still active. Two
    // grouped passes over events (first-touch per user, then distinct
    // user-week activity) joined at user grain; the output is
    // O(weeks²) cells regardless of event volume. Week arithmetic is
    // exact integer days/7, so both engines agree bit-for-bit.
    "q210_cohort_retention" -> { (s, dir) =>
      val ev = Tables.df(s, dir, "events")
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast(DateType).as("wk"))
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_wk"))
      val active = ev.distinct()
      val cells = active.join(cohort, Seq("user_id"))
        .select(col("user_id"), col("cohort_wk"),
          (datediff(col("wk"), col("cohort_wk")) / 7).cast(LongType)
            .as("k"))
        .groupBy(col("cohort_wk"), col("k"))
        .agg(countDistinct(col("user_id")).as("n_active"))
      val sizes = cohort.groupBy(col("cohort_wk"))
        .agg(count(lit(1)).as("cohort_size"))
      cells.join(broadcast(sizes), Seq("cohort_wk"))
        .select(col("cohort_wk"), col("k"), col("n_active"),
          col("cohort_size"))
        .orderBy(col("cohort_wk"), col("k"))
    },

    // TPC-DS Q39 topology: statistical anomaly detection — per
    // (supplier, month) quantity dispersion, keep high-variance cells
    // (coefficient of variation >= 0.5), pair CONSECUTIVE months that
    // both qualify. The repo's exact-arithmetic convention extended to
    // second moments: variance never goes through float aggregation
    // (stddev_samp's merge-order-dependent low bits); instead n, Σx,
    // Σx² accumulate as exact longs and the cov test cross-multiplies
    // to integers — cov >= 1/2  ⟺  4n(nΣx² − (Σx)²) >= (n−1)(Σx)².
    // The reported cov is one IEEE division + sqrt of those exact
    // integers, bit-identical on both engines. The qualifying frame
    // builds ONCE and self-joins through exchange reuse
    // (plan-asserted), so the fact is scanned and aggregated a single
    // time.
    "q212_cov_anomaly" -> { (s, dir) =>
      val st = Tables.df(s, dir, "lineitem")
        .select(col("l_suppkey").as("sk"),
          (year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
            .cast(LongType).as("mi"),
          col("l_quantity").cast(LongType).as("q"))
        .groupBy(col("sk"), col("mi"))
        .agg(count(lit(1)).as("n"), sum(col("q")).as("sx"),
          sum(col("q") * col("q")).as("sxx"))
        .filter(col("n") >= 2 &&
          lit(4L) * col("n") *
            (col("n") * col("sxx") - col("sx") * col("sx")) >=
            (col("n") - 1) * col("sx") * col("sx"))
        .withColumn("cov", round(sqrt(
          (col("n") * (col("n") * col("sxx") - col("sx") * col("sx")))
            .cast(DoubleType) /
            ((col("n") - 1) * col("sx") * col("sx")).cast(DoubleType)), 6))
      val a = st.select(col("sk").as("a_sk"), col("mi").as("a_mi"),
        col("cov").as("cov1"))
      val b = st.select(col("sk").as("b_sk"), col("mi").as("b_mi"),
        col("cov").as("cov2"))
      a.join(b, col("a_sk") === col("b_sk") &&
          col("b_mi") === col("a_mi") + 1)
        .select(col("a_sk").as("suppkey"), col("a_mi").as("mi"),
          col("cov1"), col("cov2"))
        .orderBy(col("suppkey"), col("mi"))
    },

    // INTERSECT ALL / EXCEPT ALL — the BAG set operations (q8 covers
    // distinct EXCEPT): multiplicities matter, so the engine must keep
    // min(count_l, count_r) copies per value for INTERSECT ALL and
    // count_l − count_r copies for EXCEPT ALL. Spark plans both as a
    // grouped count + generate replicate (no row-by-row matching);
    // the census output keeps the result small and totally ordered.
    "q213_setops_all" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
      def side(flag: String) = li.filter(col("l_returnflag") === flag)
        .select(col("l_quantity").cast(LongType).as("q"))
      val ia = side("R").intersectAll(side("A"))
        .groupBy(col("q")).agg(count(lit(1)).as("n"))
        .select(lit("intersect_all").as("op"), col("q"), col("n"))
      val ea = side("R").exceptAll(side("A"))
        .groupBy(col("q")).agg(count(lit(1)).as("n"))
        .select(lit("except_all").as("op"), col("q"), col("n"))
      ia.unionAll(ea).orderBy(col("op"), col("q"))
    }
  )

  override def oracle: Map[String, String] = Map(
    "q202_interval_overlap" ->
      """SELECT p.event_id, count(er.event_id) AS n_err
        |FROM events p LEFT JOIN events er
        |  ON er.event_type = 'error'
        | AND p.ts < er.ts + INTERVAL 1 HOUR
        | AND er.ts < p.ts + INTERVAL 2 HOUR
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin,
    "q203_cumulative_fullouter" ->
      """WITH intake AS (
        |  SELECT n_name AS i_n, strftime(o_orderdate, '%Y-%m') AS i_mo,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 10000
        |      AS BIGINT) AS intake_i
        |  FROM orders
        |   JOIN customer ON o_custkey = c_custkey
        |   JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |supply AS (
        |  SELECT n_name AS s_n, strftime(l_shipdate, '%Y-%m') AS s_mo,
        |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |      AS DECIMAL(18,4))) * 10000 AS BIGINT) AS supply_i
        |  FROM lineitem
        |   JOIN supplier ON l_suppkey = s_suppkey
        |   JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT coalesce(i_n, s_n) AS n_name, coalesce(i_mo, s_mo) AS mo,
        |    coalesce(intake_i, 0) AS intake_i,
        |    coalesce(supply_i, 0) AS supply_i
        |  FROM intake FULL OUTER JOIN supply
        |    ON i_n = s_n AND i_mo = s_mo),
        |c AS (
        |  SELECT n_name, mo,
        |    sum(intake_i) OVER w AS cum_intake_i,
        |    sum(supply_i) OVER w AS cum_supply_i
        |  FROM j
        |  WINDOW w AS (PARTITION BY n_name ORDER BY mo
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT n_name, mo,
        |  CAST(cum_intake_i AS DOUBLE) / 10000 AS cum_intake,
        |  CAST(cum_supply_i AS DOUBLE) / 10000 AS cum_supply
        |FROM c WHERE cum_intake_i > cum_supply_i
        |ORDER BY n_name, mo""".stripMargin,
    "q204_band_census" ->
      """SELECT * FROM
        |(SELECT count(*) AS b1 FROM lineitem
        |  WHERE ((l_returnflag = 'R' AND l_discount <= 0.06)
        |     OR (l_returnflag <> 'R' AND l_tax > 0.02))
        |    AND l_quantity BETWEEN 1 AND 6) t1,
        |(SELECT count(*) AS b2 FROM lineitem
        |  WHERE ((l_returnflag = 'R' AND l_discount <= 0.06)
        |     OR (l_returnflag <> 'R' AND l_tax > 0.02))
        |    AND l_quantity BETWEEN 7 AND 12) t2,
        |(SELECT count(*) AS b3 FROM lineitem
        |  WHERE ((l_returnflag = 'R' AND l_discount <= 0.06)
        |     OR (l_returnflag <> 'R' AND l_tax > 0.02))
        |    AND l_quantity BETWEEN 13 AND 18) t3,
        |(SELECT count(*) AS b4 FROM lineitem
        |  WHERE ((l_returnflag = 'R' AND l_discount <= 0.06)
        |     OR (l_returnflag <> 'R' AND l_tax > 0.02))
        |    AND l_quantity BETWEEN 19 AND 24) t4,
        |(SELECT count(*) AS b5 FROM lineitem
        |  WHERE ((l_returnflag = 'R' AND l_discount <= 0.06)
        |     OR (l_returnflag <> 'R' AND l_tax > 0.02))
        |    AND l_quantity BETWEEN 25 AND 30) t5,
        |(SELECT count(*) AS b6 FROM lineitem
        |  WHERE ((l_returnflag = 'R' AND l_discount <= 0.06)
        |     OR (l_returnflag <> 'R' AND l_tax > 0.02))
        |    AND l_quantity BETWEEN 31 AND 36) t6,
        |(SELECT count(*) AS b7 FROM lineitem
        |  WHERE ((l_returnflag = 'R' AND l_discount <= 0.06)
        |     OR (l_returnflag <> 'R' AND l_tax > 0.02))
        |    AND l_quantity BETWEEN 37 AND 42) t7,
        |(SELECT count(*) AS b8 FROM lineitem
        |  WHERE ((l_returnflag = 'R' AND l_discount <= 0.06)
        |     OR (l_returnflag <> 'R' AND l_tax > 0.02))
        |    AND l_quantity BETWEEN 43 AND 48) t8""".stripMargin,
    "q213_setops_all" ->
      """WITH ia AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS q FROM lineitem
        |    WHERE l_returnflag = 'R'
        |  INTERSECT ALL
        |  SELECT CAST(l_quantity AS BIGINT) FROM lineitem
        |    WHERE l_returnflag = 'A'),
        |ea AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS q FROM lineitem
        |    WHERE l_returnflag = 'R'
        |  EXCEPT ALL
        |  SELECT CAST(l_quantity AS BIGINT) FROM lineitem
        |    WHERE l_returnflag = 'A')
        |SELECT 'intersect_all' AS op, q, count(*) AS n FROM ia GROUP BY q
        |UNION ALL
        |SELECT 'except_all' AS op, q, count(*) AS n FROM ea GROUP BY q
        |ORDER BY op, q""".stripMargin,
    "q212_cov_anomaly" ->
      """WITH s AS (
        |  SELECT l_suppkey AS sk,
        |    CAST(year(l_shipdate)*12 + month(l_shipdate) AS BIGINT) AS mi,
        |    count(*) AS n,
        |    sum(CAST(l_quantity AS BIGINT)) AS sx,
        |    sum(CAST(l_quantity AS BIGINT)*CAST(l_quantity AS BIGINT))
        |      AS sxx
        |  FROM lineitem GROUP BY 1, 2),
        |q AS (
        |  SELECT sk, mi,
        |    round(sqrt(CAST(n*(n*sxx - sx*sx) AS DOUBLE)
        |      / CAST((n-1)*sx*sx AS DOUBLE)), 6) AS cov
        |  FROM s
        |  WHERE n >= 2 AND 4*n*(n*sxx - sx*sx) >= (n-1)*sx*sx)
        |SELECT a.sk AS suppkey, a.mi AS mi, a.cov AS cov1, b.cov AS cov2
        |FROM q a JOIN q b ON a.sk = b.sk AND b.mi = a.mi + 1
        |ORDER BY suppkey, mi""".stripMargin,
    "q209_gap_fill" ->
      """WITH actual AS (
        |  SELECT n_name AS a_n, strftime(o_orderdate, '%Y-%m') AS a_mo,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 10000
        |      AS BIGINT) AS rev_i
        |  FROM orders
        |   JOIN customer ON o_custkey = c_custkey
        |   JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |span AS (
        |  SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) AS lo,
        |         CAST(date_trunc('month', max(o_orderdate)) AS DATE) AS hi
        |  FROM orders),
        |months AS (
        |  SELECT strftime(unnest(generate_series(lo, hi,
        |    INTERVAL 1 MONTH)), '%Y-%m') AS mo FROM span),
        |spine AS (SELECT n_name, mo FROM nation, months),
        |j AS (
        |  SELECT s.n_name, s.mo, a.rev_i
        |  FROM spine s LEFT JOIN actual a
        |    ON s.n_name = a.a_n AND s.mo = a.a_mo),
        |f AS (
        |  SELECT n_name, mo, rev_i,
        |    last_value(rev_i IGNORE NULLS) OVER (
        |      PARTITION BY n_name ORDER BY mo
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill_i
        |  FROM j)
        |SELECT n_name, mo, CAST(fill_i AS DOUBLE) / 10000 AS rev,
        |  rev_i IS NULL AS is_filled
        |FROM f ORDER BY n_name, mo""".stripMargin,
    "q210_cohort_retention" ->
      """WITH e AS (
        |  SELECT user_id,
        |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
        |  FROM events),
        |cohort AS (
        |  SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id),
        |active AS (SELECT DISTINCT user_id, wk FROM e),
        |cells AS (
        |  SELECT cohort_wk,
        |    CAST(date_diff('day', cohort_wk, wk) / 7 AS BIGINT) AS k,
        |    count(DISTINCT a.user_id) AS n_active
        |  FROM active a JOIN cohort c ON a.user_id = c.user_id
        |  GROUP BY 1, 2),
        |sizes AS (
        |  SELECT cohort_wk, count(*) AS cohort_size
        |  FROM cohort GROUP BY 1)
        |SELECT c.cohort_wk, c.k, c.n_active, s.cohort_size
        |FROM cells c JOIN sizes s ON c.cohort_wk = s.cohort_wk
        |ORDER BY c.cohort_wk, c.k""".stripMargin,
    "q205_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, event_type, us,
        |    CASE WHEN us - lag(us) OVER
        |        (PARTITION BY user_id ORDER BY us, event_id)
        |      <= 28800000000 THEN 0 ELSE 1 END AS new_sess
        |  FROM e),
        |sess AS (
        |  SELECT user_id, event_type, us,
        |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_seq
        |  FROM flagged)
        |SELECT user_id, sess_seq, count(*) AS n_events,
        |  (max(us) - min(us)) // 1000000 AS dur_sec,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_purchases
        |FROM sess GROUP BY user_id, sess_seq
        |ORDER BY user_id, sess_seq""".stripMargin
  )
}
