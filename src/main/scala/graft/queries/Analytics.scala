package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Classic TPC-H-shaped analytic queries adapted to the fixture schema —
  * the multi-join plans the reference's TPC-DS corpus exercises (SURVEY
  * §5.2): selective-dim broadcast + fact join + grouped revenue + top-k.
  * Also the only consumers of the `supplier` dim, completing table
  * coverage. All revenue math uses the exact-decimal convention.
  */
object Analytics extends QueryModule {

  private val D4 = DecimalType(18, 4)
  private def rev: Column =
    sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(D4))
      .cast(DoubleType)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q3 shape: shipping-priority top-10.
    "q100_shipping_priority" -> { (s, dir) =>
      val cust = Tables.df(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.df(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      val li = Tables.df(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01").cast(TimestampType))
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate").cast(DateType)
          .as("odate"))
        .agg(rev.as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // TPC-H Q5 shape: local-supplier volume per nation within a region
    // (6-way join; customer and supplier must share the nation).
    "q101_local_supplier_volume" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
      val ord = Tables.df(s, dir, "orders")
      val cust = Tables.df(s, dir, "customer")
      val supp = Tables.df(s, dir, "supplier")
      val nat = Tables.df(s, dir, "nation")
      val reg = Tables.df(s, dir, "region").filter(col("r_name") === "ASIA")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey") &&
          cust("c_nationkey") === supp("s_nationkey"))
        .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(rev.as("revenue"), count(lit(1)).as("n"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q10 shape: returned-item reporting, top-20 customers.
    "q102_returned_items" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
      val ord = Tables.df(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      val cust = Tables.df(s, dir, "customer")
      val nat = Tables.df(s, dir, "nation")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(rev.as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // TPC-H Q8 shape: national market share — the share of a chosen
    // supplier-nation in a region's yearly revenue for one part type.
    // The optimizer stressor here is nation playing TWO roles (customer
    // side scopes the region, supplier side defines the share) — the
    // dim is joined twice under different keys, and all five dims
    // broadcast while the fact chain (lineitem ⋈ orders) is the only
    // shuffle. Share math: exact-decimal conditional revenue over exact
    // total, divided once as doubles.
    "q137_market_share" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
      val ord = Tables.df(s, dir, "orders")
      val cust = Tables.df(s, dir, "customer")
      val supp = Tables.df(s, dir, "supplier")
      val part = Tables.df(s, dir, "part")
        .filter(col("p_type") === "PROMO")
      val natC = Tables.df(s, dir, "nation")
        .select(col("n_nationkey").as("cn_key"),
          col("n_regionkey").as("cn_region"))
      val natS = Tables.df(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("sn_name"))
      val reg = Tables.df(s, dir, "region").filter(col("r_name") === "ASIA")
      val volume = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast(D4)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(natC), cust("c_nationkey") === natC("cn_key"))
        .join(broadcast(reg), natC("cn_region") === reg("r_regionkey"))
        .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
        .join(broadcast(natS), supp("s_nationkey") === natS("sn_key"))
        .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
        .agg(
          (sum(when(col("sn_name") === "NATION_1", volume)
            .otherwise(lit(0).cast(D4))).cast(DoubleType) /
            sum(volume).cast(DoubleType)).as("mkt_share_raw"),
          sum(volume).cast(DoubleType).as("total_volume"))
        .select(col("o_year"), round(col("mkt_share_raw"), 6)
          .as("mkt_share"), col("total_volume"))
        .orderBy(col("o_year"))
    },

    // TPC-H Q9 shape: product-type profit by supplier nation and year
    // (no partsupp table in the fixture, so profit = discounted revenue
    // less a 10%-of-retail cost stand-in — same join topology: fact
    // chain + part/supplier/nation dims, grouped on (nation, year)).
    "q138_product_profit" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
      val ord = Tables.df(s, dir, "orders")
      val supp = Tables.df(s, dir, "supplier")
      val part = Tables.df(s, dir, "part")
        .filter(col("p_name").contains("widget"))
      val nat = Tables.df(s, dir, "nation")
      val amount = (col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
        col("p_retailprice") * lit(0.1) * col("l_quantity")).cast(D4)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
        .join(broadcast(nat), supp("s_nationkey") === nat("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast(LongType).as("o_year"))
        .agg(sum(amount).cast(DoubleType).as("profit"),
          count(lit(1)).as("n"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // Batch session windows (session_window is one grouping construct
    // across batch AND streaming — the streaming side is q87): per-user
    // 30-minute-gap sessions over events, each with its span and value
    // total. Gap semantics: a session's window is [first_ts,
    // last_ts + gap); an event exactly `gap` after its predecessor
    // starts a NEW session (end bound exclusive). Scale: one shuffle on
    // user_id, sessions assembled by a sort within each partition.
    "q123_session_window" -> { (s, dir) =>
      val D2 = DecimalType(18, 2)
      Tables.df(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes").as("sw"),
          col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(D2)).cast(DoubleType).as("sum_v"))
        .select(col("user_id"), unix_micros(col("sw.start")).as("s_start"),
          unix_micros(col("sw.end")).as("s_end"), col("n"), col("sum_v"))
        .orderBy(col("user_id"), col("s_start"))
    },

    // Robust/boolean aggregate family: exact interpolated median,
    // conditional counting, boolean all/any, and Pearson correlation —
    // the correlation via exact DECIMAL power sums (the q28 variance
    // trick extended to cross moments), so both engines derive the
    // identical double from identical exact sums regardless of
    // summation order.
    "q124_robust_aggs" -> { (s, dir) =>
      val D4 = DecimalType(27, 4)
      Tables.df(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          median(col("l_quantity")).as("med_qty"),
          count_if(col("l_discount") > 0.05).as("n_disc"),
          bool_and(col("l_quantity") > 0).as("all_pos"),
          bool_or(col("l_discount") > 0.09).as("any_deep"),
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast(D4)).as("sx"),
          sum(col("l_extendedprice").cast(D4)).as("sy"),
          sum((col("l_quantity") * col("l_quantity")).cast(D4)).as("sxx"),
          sum((col("l_extendedprice") * col("l_extendedprice")).cast(D4))
            .as("syy"),
          sum((col("l_quantity") * col("l_extendedprice")).cast(D4))
            .as("sxy"))
        .select(col("l_returnflag") +: col("med_qty") +: col("n_disc") +:
          col("all_pos") +: col("any_deep") +:
          Seq("n", "sx", "sy", "sxx", "syy", "sxy")
            .map(c => col(c).cast(DoubleType).as(c + "_d")): _*)
        // moments are exact decimals cast to double: the formula below is
        // pure scalar IEEE arithmetic — identical on any engine
        .select(col("l_returnflag"), col("med_qty"), col("n_disc"),
          col("all_pos"), col("any_deep"),
          round((col("n_d") * col("sxy_d") - col("sx_d") * col("sy_d"))
            / sqrt((col("n_d") * col("sxx_d") - col("sx_d") * col("sx_d")) *
              (col("n_d") * col("syy_d") - col("sy_d") * col("sy_d"))), 6)
            .as("corr_qp"))
        .orderBy(col("l_returnflag"))
    },

    // TPC-DS Q67 shape: top-k over a ROLLUP — quantity totals rolled up
    // over (returnflag, linestatus, ship month), then ranked WITHIN each
    // returnflag slice across all rollup levels, keep the top 5. The
    // scale contract: the Expand-fed partial aggregation shrinks the
    // fact before its one shuffle, and the rank filter plans a
    // WindowGroupLimit (map-side top-k per slice). Fully deterministic
    // rank: ties broken on the remaining group keys.
    "q151_rollup_window_topk" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val grouped = Tables.df(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"),
          month(col("l_shipdate")).cast(LongType).as("ship_m"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_qty"),
          grouping_id().cast(LongType).as("gid"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("status"),
          coalesce(col("ship_m"), lit(-1L)).as("ship_m"),
          col("sum_qty"), col("gid"))
      val w = Window.partitionBy(col("flag"))
        .orderBy(col("sum_qty").desc, col("gid"), col("status"),
          col("ship_m"))
      grouped.withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= 5)
        .orderBy(col("flag"), col("rk"))
    },

    // TPC-DS Q51 shape: window-over-union cumulative compare — daily
    // cumulative revenue of the returned ('R') vs accepted ('A') flows,
    // joined on the day, keeping days where the returned cumulative
    // overtakes the accepted. The join is DECLARED full-outer (Q51's
    // shape) but the `cum_r > cum_a` filter is null-rejecting on both
    // sides, so Catalyst correctly executes an INNER join. The two
    // sides are near-identical in size (daily aggregates of two flag
    // slices), which left AQE's broadcast-side choice a coin flip —
    // the explicit broadcast() hint on the accepted side pins it, and
    // is scale-safe: a daily aggregate is bounded by calendar days
    // (~thousands of rows at ANY corpus size). Each side is one
    // partial-agged shuffle on the day; the running sums are one
    // window pass each (single ordered partition per side is the Q51
    // contract — the real query partitions by item, here the fixture
    // has one series).
    "q152_cumulative_compare" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val D2 = DecimalType(18, 2)
      def daily(flag: String, out: String) =
        Tables.df(s, dir, "lineitem")
          .filter(col("l_returnflag") === flag)
          .groupBy(col("l_shipdate").cast(DateType).as("d"))
          .agg(sum(col("l_quantity").cast(D2)).as("q"))
          .withColumn(out,
            sum(col("q")).over(Window.orderBy(col("d"))).cast(DoubleType))
          .select(col("d").as(s"d_$out"), col(out))
      val r = daily("R", "cum_r")
      val a = daily("A", "cum_a")
      r.join(broadcast(a), r("d_cum_r") === a("d_cum_a"), "full_outer")
        .select(coalesce(col("d_cum_r"), col("d_cum_a")).as("d"),
          col("cum_r"), col("cum_a"))
        .filter(col("cum_r") > col("cum_a"))
        .orderBy(col("d"))
    },

    // TPC-DS Q5 shape: multi-channel UNION ALL → ROLLUP — three order
    // "channels" (status classes) each pre-shaped with a channel tag,
    // unioned, then rolled up over (channel, priority) with exact-
    // decimal money. One Expand + one shuffle over the union; each
    // channel's scan stays filter-pushed.
    "q153_channel_rollup" -> { (s, dir) =>
      val D2 = DecimalType(18, 2)
      val ord = Tables.df(s, dir, "orders")
      def channel(status: String, name: String) =
        ord.filter(col("o_orderstatus") === status)
          .select(lit(name).as("channel"),
            col("o_orderpriority").as("priority"),
            col("o_totalprice").cast(D2).as("amt"))
      channel("O", "open")
        .unionAll(channel("F", "fulfilled"))
        .unionAll(channel("P", "pending"))
        .rollup(col("channel"), col("priority"))
        .agg(sum(col("amt")).cast(DoubleType).as("sales"),
          count(lit(1)).as("n"),
          grouping_id().cast(LongType).as("gid"))
        .select(coalesce(col("channel"), lit("ALL")).as("channel"),
          coalesce(col("priority"), lit("ALL")).as("priority"),
          col("sales"), col("n"), col("gid"))
        .orderBy(col("gid"), col("channel"), col("priority"))
    },

    // TPC-DS Q14 shape: INTERSECT-heavy cross-channel match — parts
    // sold through ALL THREE order-status "channels", then revenue by
    // brand restricted to those parts (the oracle keeps the literal
    // INTERSECT SQL; Spark computes the same sets as flag conjunctions
    // on one part-grain census — see the r20 note below).
    "q154_channel_intersect" -> { (s, dir) =>
      // r20 optimization: the literal Q14 shape scanned the fact once
      // per channel for the INTERSECT build sets (3 scans + 3 DISTINCT
      // shuffles + 2 semi-joins, each semi build side broadcast-hinted
      // because ReplaceIntersectWithSemiJoin drops operand hints and
      // AQE's runtime conversion raced on these near-equal sets) and a
      // 4th time for the revenue agg.
      // Channel membership is a per-PART predicate, so ONE part-grain
      // census computes all three channel flags AND the exact-decimal
      // revenue/count partials in a single fact scan + a single partkey
      // shuffle; INTERSECT becomes a flag conjunction on the census row
      // and the brand agg re-sums the (order-insensitive) decimal
      // partials — bit-identical revenue, one fact pass instead of
      // four. The orders side joins hint-free: AQE broadcasts it at
      // this scale, a co-partitioned shuffle join serves 100 TB (the
      // old per-channel broadcast of filtered ORDER KEYS was itself
      // fact-sized at scale — this also removes that liability).
      val ostat = Tables.df(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"))
      val perPart = Tables.df(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"),
          col("l_extendedprice"), col("l_discount"))
        .join(ostat, col("l_orderkey") === col("o_orderkey"), "left")
        .groupBy(col("l_partkey"))
        .agg(
          max(when(col("o_orderstatus") === "O", 1)).as("in_o"),
          max(when(col("o_orderstatus") === "F", 1)).as("in_f"),
          max(when(col("o_orderstatus") === "P", 1)).as("in_p"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(D4)).as("rev_part"),
          count(lit(1)).as("n_part"))
        .filter(col("in_o") === 1 && col("in_f") === 1 &&
          col("in_p") === 1)
      perPart.join(broadcast(Tables.df(s, dir, "part")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("rev_part")).cast(DoubleType).as("revenue"),
          sum(col("n_part")).as("n_items"))
        .orderBy(col("p_brand"))
    },

    // TPC-DS Q88 shape: multi-CASE single-scan aggregates — eight
    // time-band click counts that the naive Q88 formulation writes as
    // eight independent full-table subqueries, fused into ONE scan with
    // conditional aggregates. The plan is a single filter-pushed scan
    // + one partial agg collapsing to a single row; at 100 TB that is
    // an 8× scan saving over the literal translation.
    "q155_hour_band_counts" -> { (s, dir) =>
      val h = hour(col("ts"))
      def band(lo: Int, hi: Int) =
        count(when(h.between(lo, hi), 1)).as(s"h${lo}_$hi")
      Tables.df(s, dir, "events")
        .filter(col("event_type") === "click")
        .agg(band(0, 2), band(3, 5), band(6, 8), band(9, 11),
          band(12, 14), band(15, 17), band(18, 20), band(21, 23),
          count(lit(1)).as("n_clicks"))
    },

    // TPC-DS Q64 shape: multi-join chain with a REPEATED dimension —
    // nation joined twice in different roles (customer's vs
    // supplier's), cross-border flows only, revenue by (cust_nation,
    // supp_nation, year). One fact scan, every dim broadcast (nation
    // twice under different projections), exactly one shuffle (the
    // final group-by) — the Q64 trap of shuffling the fact once per
    // dim role never appears.
    "q156_crossborder_flows" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
      val ord = Tables.df(s, dir, "orders")
      val cust = Tables.df(s, dir, "customer")
      val supp = Tables.df(s, dir, "supplier")
      val nat = Tables.df(s, dir, "nation")
      val cn = nat.select(col("n_nationkey").as("c_nk"),
        col("n_name").as("cust_nation"))
      val sn = nat.select(col("n_nationkey").as("s_nk"),
        col("n_name").as("supp_nation"))
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
        .join(broadcast(cn), col("c_nationkey") === col("c_nk"))
        .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
        .filter(col("cust_nation") =!= col("supp_nation"))
        .groupBy(col("cust_nation"), col("supp_nation"),
          year(col("o_orderdate")).cast(LongType).as("o_year"))
        .agg(rev.as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("cust_nation"), col("supp_nation"), col("o_year"))
    },

    // TPC-H Q21 shape: EXISTS + NOT EXISTS correlated self-subqueries —
    // suppliers whose returned line was the ONLY return in a
    // multi-supplier order. Spark-first: the correlated EXISTS becomes
    // a left-SEMI self-join and the NOT EXISTS a left-ANTI self-join,
    // both with the non-equi (different supplier) conjunct — the
    // decorrelation TPC-H Q21 forces every engine to get right. Scale:
    // all three legs are DISTINCT-reduced narrow (orderkey, suppkey)
    // pairs co-clustered on orderkey (fact-sized but 16 bytes/row);
    // semi/anti build sides are fixed (right) so there is no AQE side
    // flip; the supplier dim broadcasts.
    "q157_sole_returned_supplier" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
      def pairs(name: String) = li
        .select(col("l_orderkey").as(s"ok_$name"),
          col("l_suppkey").as(s"sk_$name"))
      val l1 = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val lAll = pairs("all").distinct()
      val lRet = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("ok_ret"),
          col("l_suppkey").as("sk_ret")).distinct()
      l1.join(lAll, col("ok") === col("ok_all") &&
          col("sk") =!= col("sk_all"), "left_semi")
        .join(lRet, col("ok") === col("ok_ret") &&
          col("sk") =!= col("sk_ret"), "left_anti")
        .join(broadcast(Tables.df(s, dir, "supplier")),
          col("sk") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    },

    // TPC-DS Q13 shape: a DISJUNCTION of conjunctive bands mixing dim
    // and fact columns — the multi-OR predicate every BI tool emits.
    // ONE fact scan (the naive per-band formulation scans it once per
    // band): dims broadcast, the OR evaluated post-join, ungrouped
    // exact-decimal aggregates collapse to a single row. Only the
    // IsNotNull guards push to parquet (the bands reference joined
    // columns), which is the correct contract for this shape.
    "q167_banded_profile" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
      val ord = Tables.df(s, dir, "orders")
      val cust = Tables.df(s, dir, "customer")
      def band(seg: String, qLo: Int, qHi: Int, dLo: Double, dHi: Double) =
        col("c_mktsegment") === seg &&
          col("l_quantity").between(qLo, qHi) &&
          col("l_discount").between(dLo, dHi)
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .filter(band("BUILDING", 1, 15, 0.00, 0.04) ||
          band("AUTOMOBILE", 16, 30, 0.02, 0.06) ||
          band("MACHINERY", 31, 50, 0.04, 0.10))
        .agg(count(lit(1)).as("n_rows"),
          // avg computed as exact-decimal sum ÷ count (both engines do
          // the identical IEEE division; their avg(DECIMAL) built-ins
          // round at different scales)
          round((sum(col("l_quantity").cast(DecimalType(18, 2)))
            .cast(DoubleType) / count(lit(1))), 6).as("avg_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("sum_price"))
    },

    // TPC-DS Q34/Q73 shape: frequent big-basket buyers — orders with
    // 6-7 line items (a HAVING over the per-order count), joined back
    // through orders to customers who placed at least two such orders.
    // Scale contract: the basket census is a partial-agged count on the
    // already-clustered order key, the HAVING prunes BEFORE the join,
    // and only (custkey, basket-count) survives to the second agg.
    "q168_frequent_baskets" -> { (s, dir) =>
      val baskets = Tables.df(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"))
        .filter(col("n_items").between(6, 7))
      baskets
        .join(Tables.df(s, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_baskets"))
        .filter(col("n_baskets") >= 2)
        .join(broadcast(Tables.df(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("n_baskets"))
        .orderBy(col("n_baskets").desc, col("c_custkey"))
    },

    // TPC-DS Q95 shape: semi-join CHAIN on a self-joined fact —
    // orders confirmed by a SECOND supplier (EXISTS a lineitem of the
    // same order from a different supplier) with NO returned item
    // (NOT EXISTS). Scale contract: both existence probes are
    // left-semi/left-anti joins keyed on the SAME l_orderkey the fact
    // is already clustered on (one shuffle family, no re-keying), the
    // self-join dedupes to order grain BEFORE touching orders, and
    // nothing wider than (orderkey) crosses a shuffle.
    "q175_semi_chain" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
      val multiSupp = li.select(col("l_orderkey"), col("l_suppkey"))
        .join(li.select(col("l_orderkey").as("b_ok"),
            col("l_suppkey").as("b_sk")),
          col("l_orderkey") === col("b_ok") &&
            col("l_suppkey") =!= col("b_sk"), "left_semi")
        .select(col("l_orderkey")).distinct()
      val returned = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("r_ok")).distinct()
      Tables.df(s, dir, "orders")
        .join(multiSupp, col("o_orderkey") === col("l_orderkey"),
          "left_semi")
        .join(returned, col("o_orderkey") === col("r_ok"), "left_anti")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(D4)).cast(DoubleType)
            .as("total_price"))
    },

    // TPC-DS Q23 shape: multi-CTE reuse feeding two channels — a
    // "frequent parts" set and a "best customers" set (spend above 2×
    // the mean — the threshold expression has the same shape on the
    // oracle side, so the IEEE arithmetic is bit-identical), each
    // consumed by BOTH
    // channel branches of a union. The two set frames are single
    // DataFrame objects referenced twice, so their exchange subtrees
    // are identical and ReuseExchange materializes each once — the
    // DataFrame-native equivalent of Q23's WITH clauses. No global
    // sort/window anywhere: the customer threshold is a broadcast
    // scalar, scale-safe at any corpus size.
    "q176_cte_reuse" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
      val ord = Tables.df(s, dir, "orders")
      val freqParts = li.groupBy(col("l_partkey"))
        .agg(countDistinct(col("l_orderkey")).as("n_ord"))
        .filter(col("n_ord") >= 5).select(col("l_partkey"))
      val spend = ord.groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(D4)).as("spend"))
      val totals = spend.agg(
        sum(col("spend")).as("tot"), count(lit(1)).as("n_cust"))
      val bestCust = spend.crossJoin(broadcast(totals))
        // both engines evaluate the identical double expression tree
        // over identical exact-decimal sums — bit-identical selection
        .filter(col("spend").cast(DoubleType) >
          lit(2.0) * (col("tot").cast(DoubleType) / col("n_cust")))
        .select(col("o_custkey").as("bc_ck"))
      def channel(status: String) =
        li.join(ord.filter(col("o_orderstatus") === status)
            .select(col("o_orderkey"), col("o_custkey"),
              col("o_orderstatus")),
          col("l_orderkey") === col("o_orderkey"))
          .join(freqParts, Seq("l_partkey"), "left_semi")
          .join(bestCust, col("o_custkey") === col("bc_ck"), "left_semi")
          // groupBy (not a global agg): an empty channel contributes
          // ZERO rows, same as the oracle's GROUP BY
          .groupBy(col("o_orderstatus").as("channel"))
          .agg(rev.as("revenue"), count(lit(1)).as("n_items"))
      channel("O").unionByName(channel("F")).orderBy(col("channel"))
    },

    // TPC-DS Q49 shape: union of PER-CHANNEL rankings — worst return
    // ratio per part within each order-priority "channel", top-10 per
    // channel by (ratio desc, part). The rank-filter window plans as
    // WindowGroupLimit, so each map task keeps ≤10 rows per channel
    // before the shuffle (state O(channels × 10), never O(parts));
    // the ratio is long/long double division (bit-identical across
    // engines) rounded once at the edge.
    "q177_channel_rankings" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("channel"))
        .orderBy(col("ratio_raw").desc, col("l_partkey"))
      Tables.df(s, dir, "lineitem")
        .join(Tables.df(s, dir, "orders")
            .select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority").as("channel"), col("l_partkey"))
        .agg(
          sum(when(col("l_returnflag") === "R", col("l_quantity"))
            .otherwise(lit(0))).cast(LongType).as("ret_qty"),
          sum(col("l_quantity")).cast(LongType).as("tot_qty"))
        .withColumn("ratio_raw",
          col("ret_qty").cast(DoubleType) / col("tot_qty"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("channel"), col("l_partkey"),
          col("ret_qty"), col("tot_qty"),
          round(col("ratio_raw"), 6).as("return_ratio"),
          col("rk").cast(LongType).as("rk"))
        .orderBy(col("channel"), col("rk"))
    },

    // TPC-DS Q31 shape: year-over-year SHARE — each nation's slice of
    // yearly order revenue vs its slice the year before. Two window
    // passes over the (nation, year) aggregate (year-total sum, then
    // per-nation lag), both on the tiny grouped frame — the fact is
    // touched once. share/prev are exact-decimal sums divided once at
    // the edge and rounded.
    "q178_yoy_share" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val wYear = Window.partitionBy(col("yr"))
      val wNation = Window.partitionBy(col("n_name")).orderBy(col("yr"))
      Tables.df(s, dir, "orders")
        .join(broadcast(Tables.df(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.df(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"),
          year(col("o_orderdate")).cast(LongType).as("yr"))
        .agg(sum(col("o_totalprice").cast(D4)).as("nrev"))
        .withColumn("share_raw",
          col("nrev").cast(DoubleType) /
            sum(col("nrev")).over(wYear).cast(DoubleType))
        .withColumn("prev_raw", lag(col("share_raw"), 1).over(wNation))
        .filter(col("prev_raw").isNotNull)
        .select(col("n_name"), col("yr"),
          round(col("share_raw"), 6).as("share"),
          round(col("prev_raw"), 6).as("prev_share"),
          (col("share_raw") > col("prev_raw")).as("grew"))
        .orderBy(col("n_name"), col("yr"))
    },

    // TPC-DS Q47/Q57 shape: MOVING-AVERAGE anomaly months — each
    // nation's monthly revenue vs the centered 3-month moving average
    // (ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), keeping months that
    // exceed the frame mean by >10%. All selection arithmetic is exact
    // integer money (decimal sum × 10000 → BIGINT, cross-multiplied
    // comparison) so the filter is bit-identical across engines; the
    // fact is shuffled once to (nation, month) grain and the window
    // runs on the tiny grouped frame. Dims broadcast.
    "q193_moving_avg" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("n_name")).orderBy(col("mo"))
        .rowsBetween(-1, 1)
      Tables.df(s, dir, "orders")
        .join(broadcast(Tables.df(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.df(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), date_format(col("o_orderdate"), "yyyy-MM")
          .as("mo"))
        .agg((sum(col("o_totalprice").cast(D4)) * 10000)
          .cast(LongType).as("mrev_i"))
        .withColumn("frame_sum_i", sum(col("mrev_i")).over(w))
        .withColumn("frame_n", count(lit(1)).over(w))
        // mrev > 1.1 × (frame_sum / frame_n), cross-multiplied in longs
        .filter(col("mrev_i") * col("frame_n") * 10 >
          col("frame_sum_i") * 11)
        .select(col("n_name"), col("mo"),
          (col("mrev_i").cast(DoubleType) / 10000).as("mrev"),
          round(col("frame_sum_i").cast(DoubleType) / 10000 /
            col("frame_n"), 6).as("mavg3"))
        .orderBy(col("n_name"), col("mo"))
    },

    // TPC-DS Q4/Q11 shape: multi-year self-join on the customer-year
    // aggregate — customers whose spend grew >25% year over year.
    // The yearly CTE is built once (one fact shuffle to (custkey, yr)
    // grain), self-joined on custkey with yr offset — both sides share
    // the custkey clustering, so the join re-uses one shuffle family.
    // Growth selection is exact integer money (spend2 × 4 > spend1 × 5);
    // the customer dim broadcasts for the name.
    "q194_yoy_growth" -> { (s, dir) =>
      val spend = Tables.df(s, dir, "orders")
        .groupBy(col("o_custkey"),
          year(col("o_orderdate")).cast(LongType).as("yr"))
        .agg((sum(col("o_totalprice").cast(D4)) * 10000)
          .cast(LongType).as("spend_i"))
      val grown = spend.as("y1")
        .join(spend.as("y2"),
          col("y1.o_custkey") === col("y2.o_custkey") &&
            col("y2.yr") === col("y1.yr") + 1)
        .filter(col("y2.spend_i") * 4 > col("y1.spend_i") * 5)
      grown
        .join(broadcast(Tables.df(s, dir, "customer")
            .select(col("c_custkey"), col("c_name"))),
          col("y1.o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"),
          col("y1.yr").as("yr1"), col("y2.yr").as("yr2"),
          (col("y1.spend_i").cast(DoubleType) / 10000).as("spend1"),
          (col("y2.spend_i").cast(DoubleType) / 10000).as("spend2"),
          round(col("y2.spend_i").cast(DoubleType) /
            col("y1.spend_i"), 6).as("growth"))
        .orderBy(col("c_custkey"), col("yr1"))
    },

    // TPC-DS Q78 shape: cross-channel FULL OUTER on aggregated facts
    // with the null-channel filter — customers active in exactly ONE
    // order-status channel ('O' open vs 'F' finished). Both channel
    // frames aggregate to customer grain BEFORE the join (the full
    // outer joins two small aggregates, never fact×fact), and the
    // null-side filter is the point of the full join: an inner join
    // would drop exactly the rows this report wants.
    "q195_channel_fullouter" -> { (s, dir) =>
      val ord = Tables.df(s, dir, "orders")
      def chan(status: String, ck: String, rev: String, n: String) = ord
        .filter(col("o_orderstatus") === status)
        .groupBy(col("o_custkey").as(ck))
        .agg((sum(col("o_totalprice").cast(D4)) * 10000)
          .cast(LongType).as(rev), count(lit(1)).as(n))
      chan("O", "o_ck", "o_rev_i", "n_o")
        .join(chan("F", "f_ck", "f_rev_i", "n_f"),
          col("o_ck") === col("f_ck"), "full_outer")
        .filter(col("o_rev_i").isNull || col("f_rev_i").isNull)
        .select(
          coalesce(col("o_ck"), col("f_ck")).as("custkey"),
          when(col("o_rev_i").isNull, "F-only").otherwise("O-only")
            .as("channel"),
          (coalesce(col("o_rev_i"), col("f_rev_i")).cast(DoubleType)
            / 10000).as("revenue"),
          coalesce(col("n_o"), col("n_f")).as("n_orders"))
        .orderBy(col("custkey"))
    },

    // Correlated LATERAL subquery with ORDER BY + LIMIT — the SQL
    // surface BI tools and migrated Postgres workloads emit for
    // "top-3 line items per order". The danger shape is per-outer-row
    // re-execution (a nested loop running the inner query once per
    // order); Spark must DECORRELATE it into a rank-filter window over
    // one pass of the fact + one equi-join, which PlanSpec asserts
    // (Window present, no nested-loop/cartesian). Known residual:
    // Spark preserves the lateral's inner ORDER BY as a global range
    // exchange it does not actually need for the top-3 semantics —
    // the engine's native scale formulation of the same report is
    // q30/q177's WindowGroupLimit path; this row pins the SQL surface
    // against the same oracle.
    "q199_lateral_topk" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderkey, l.pk, l.price
        FROM orders JOIN LATERAL (
          SELECT l_partkey AS pk, l_extendedprice AS price
          FROM lineitem WHERE l_orderkey = o_orderkey
          ORDER BY l_extendedprice DESC, l_partkey LIMIT 3) l
        WHERE o_orderstatus = 'F'
        ORDER BY o_orderkey, price DESC, pk""")
    },

    // TPC-H Q21 shape: suppliers who kept multi-supplier orders
    // waiting — the supplier's line shipped late (>60 days after the
    // order date) while EVERY other supplier on the same order shipped
    // on time. The textbook plan is a fact self-join PAIR (EXISTS
    // other-supplier line, NOT EXISTS other-supplier late line); here
    // both existence probes collapse into one grouped pass: per
    // (orderkey, suppkey) a was-late flag, per orderkey the supplier
    // and late-supplier counts, then waiting = late ∧ n_supp ≥ 2 ∧
    // n_late = 1 (the sole late supplier on a shared order). The fact
    // shuffles once on the orderkey grain it is already keyed by and
    // the per-order frame joins back on that same key family; the
    // supplier dim broadcasts for names. The oracle runs the literal
    // EXISTS / NOT EXISTS formulation, so the rewrite is checked
    // against the spec, not against itself.
    "q200_waiting_suppliers" -> { (s, dir) =>
      val lines = Tables.df(s, dir, "lineitem")
        .join(Tables.df(s, dir, "orders")
            .filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(
          datediff(col("l_shipdate"), col("o_orderdate")) > 60,
          lit(1)).otherwise(lit(0))).as("late"))
      val perOrder = lines.groupBy(col("l_orderkey").as("ok"))
        .agg(count(lit(1)).as("n_supp"), sum(col("late")).as("n_late"))
      lines.filter(col("late") === 1)
        .join(perOrder, col("l_orderkey") === col("ok"))
        .filter(col("n_supp") >= 2 && col("n_late") === 1)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(Tables.df(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
    },

    // TPC-DS Q35/Q69 shape: census over EXISTENCE flags — customers
    // bucketed by which behaviors they exhibit (any open order, any
    // finished order, any big-ticket order) counted per nation. Each
    // correlated EXISTS probe of the literal query collapses into a
    // conditional max inside one grouped pass over the fact, so there
    // are no per-row subquery executions and no self-joins: fact →
    // customer-grain flag frame (one shuffle), dims broadcast, final
    // census is a tiny (nation × flag-combo) aggregate.
    "q201_customer_segments" -> { (s, dir) =>
      val flags = Tables.df(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          max(when(col("o_orderstatus") === "O", lit(1))
            .otherwise(lit(0))).as("has_open"),
          max(when(col("o_orderstatus") === "F", lit(1))
            .otherwise(lit(0))).as("has_finished"),
          max(when(col("o_totalprice") > 200000, lit(1))
            .otherwise(lit(0))).as("has_big"))
      flags
        .join(broadcast(Tables.df(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.df(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("has_open"),
          col("has_finished"), col("has_big"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("n_name"), col("has_open"),
          col("has_finished"), col("has_big"))
    }
  )

  private val revSql =
    "CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)"

  override def oracle: Map[String, String] = Map(
    "q137_market_share" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  round(
        |    CAST(sum(CASE WHEN n2.n_name = 'NATION_1'
        |      THEN CAST(l_extendedprice * (1.0 - l_discount)
        |        AS DECIMAL(18,4))
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |    / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |        AS DECIMAL(18,4))) AS DOUBLE), 6) AS mkt_share,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS total_volume
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN part ON l_partkey = p_partkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation n1 ON c_nationkey = n1.n_nationkey
        | JOIN region ON n1.n_regionkey = r_regionkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE p_type = 'PROMO' AND r_name = 'ASIA'
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q138_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT)
        |    AS o_year,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |    - p_retailprice * 0.1 * l_quantity AS DECIMAL(18,4)))
        |    AS DOUBLE) AS profit,
        |  count(*) AS n
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN part ON l_partkey = p_partkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        |WHERE contains(p_name, 'widget')
        |GROUP BY n_name, o_year ORDER BY n_name, o_year DESC""".stripMargin,
    "q100_shipping_priority" ->
      s"""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS odate,
         | $revSql AS revenue
         |FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY o_orderkey, odate
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q101_local_supplier_volume" ->
      s"""SELECT n_name, $revSql AS revenue, count(*) AS n
         |FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         | JOIN supplier ON l_suppkey = s_suppkey
         |   AND c_nationkey = s_nationkey
         | JOIN nation ON s_nationkey = n_nationkey
         | JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q102_returned_items" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name, $revSql AS revenue
         |FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         | JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q123_session_window" ->
      """WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |             value FROM events),
        |g AS (SELECT user_id, us, value,
        |        CASE WHEN lag(us) OVER w IS NULL
        |               OR us - lag(us) OVER w >= 30*60*1000000
        |             THEN 1 ELSE 0 END AS brk
        |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |        ROWS UNBOUNDED PRECEDING) AS sid FROM g)
        |SELECT user_id, min(us) AS s_start,
        |  max(us) + 30*60*1000000 AS s_end, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM s GROUP BY user_id, sid ORDER BY user_id, s_start""".stripMargin,
    "q124_robust_aggs" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    median(l_quantity) AS med_qty,
        |    CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_disc,
        |    bool_and(l_quantity > 0) AS all_pos,
        |    bool_or(l_discount > 0.09) AS any_deep,
        |    CAST(count(*) AS DOUBLE) AS n_d,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sx_d,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE)
        |      AS sy_d,
        |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(27,4)))
        |      AS DOUBLE) AS sxx_d,
        |    CAST(sum(CAST(l_extendedprice * l_extendedprice
        |      AS DECIMAL(27,4))) AS DOUBLE) AS syy_d,
        |    CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(27,4)))
        |      AS DOUBLE) AS sxy_d
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, med_qty, n_disc, all_pos, any_deep,
        |  round((n_d * sxy_d - sx_d * sy_d)
        |    / sqrt((n_d * sxx_d - sx_d * sx_d)
        |         * (n_d * syy_d - sy_d * sy_d)), 6) AS corr_qp
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q151_rollup_window_topk" ->
      """WITH grouped AS (
        |  SELECT coalesce(l_returnflag, 'ALL') AS flag,
        |    coalesce(l_linestatus, 'ALL') AS status,
        |    coalesce(CAST(month(l_shipdate) AS BIGINT), -1) AS ship_m,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      AS sum_qty,
        |    CAST(GROUPING(l_returnflag) * 4 + GROUPING(l_linestatus) * 2
        |      + GROUPING(month(l_shipdate)) AS BIGINT) AS gid
        |  FROM lineitem
        |  GROUP BY ROLLUP (l_returnflag, l_linestatus, month(l_shipdate)))
        |SELECT flag, status, ship_m, sum_qty, gid, rk FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY flag
        |    ORDER BY sum_qty DESC, gid, status, ship_m) AS BIGINT) AS rk
        |  FROM grouped)
        |WHERE rk <= 5 ORDER BY flag, rk""".stripMargin,
    "q152_cumulative_compare" ->
      """WITH r AS (
        |  SELECT CAST(l_shipdate AS DATE) AS d,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS q
        |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
        |rc AS (SELECT d AS d_r,
        |  CAST(sum(q) OVER (ORDER BY d) AS DOUBLE) AS cum_r FROM r),
        |a AS (
        |  SELECT CAST(l_shipdate AS DATE) AS d,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS q
        |  FROM lineitem WHERE l_returnflag = 'A' GROUP BY 1),
        |ac AS (SELECT d AS d_a,
        |  CAST(sum(q) OVER (ORDER BY d) AS DOUBLE) AS cum_a FROM a)
        |SELECT coalesce(d_r, d_a) AS d, cum_r, cum_a
        |FROM rc FULL OUTER JOIN ac ON d_r = d_a
        |WHERE cum_r > cum_a ORDER BY d""".stripMargin,
    "q153_channel_rollup" ->
      """WITH u AS (
        |  SELECT 'open' AS channel, o_orderpriority AS priority,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS amt
        |  FROM orders WHERE o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT 'fulfilled', o_orderpriority,
        |    CAST(o_totalprice AS DECIMAL(18,2))
        |  FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT 'pending', o_orderpriority,
        |    CAST(o_totalprice AS DECIMAL(18,2))
        |  FROM orders WHERE o_orderstatus = 'P')
        |SELECT coalesce(channel, 'ALL') AS channel,
        |  coalesce(priority, 'ALL') AS priority,
        |  CAST(sum(amt) AS DOUBLE) AS sales, count(*) AS n,
        |  CAST(GROUPING(channel) * 2 + GROUPING(priority) AS BIGINT) AS gid
        |FROM u GROUP BY ROLLUP (channel, priority)
        |ORDER BY gid, channel, priority""".stripMargin,
    "q154_channel_intersect" ->
      s"""WITH common AS (
         |  SELECT DISTINCT l_partkey FROM lineitem
         |    JOIN orders ON l_orderkey = o_orderkey
         |    WHERE o_orderstatus = 'O'
         |  INTERSECT
         |  SELECT DISTINCT l_partkey FROM lineitem
         |    JOIN orders ON l_orderkey = o_orderkey
         |    WHERE o_orderstatus = 'F'
         |  INTERSECT
         |  SELECT DISTINCT l_partkey FROM lineitem
         |    JOIN orders ON l_orderkey = o_orderkey
         |    WHERE o_orderstatus = 'P')
         |SELECT p_brand, $revSql AS revenue, count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_partkey IN (SELECT l_partkey FROM common)
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q155_hour_band_counts" ->
      """SELECT
        |  count(*) FILTER (hour(ts) BETWEEN 0 AND 2) AS h0_2,
        |  count(*) FILTER (hour(ts) BETWEEN 3 AND 5) AS h3_5,
        |  count(*) FILTER (hour(ts) BETWEEN 6 AND 8) AS h6_8,
        |  count(*) FILTER (hour(ts) BETWEEN 9 AND 11) AS h9_11,
        |  count(*) FILTER (hour(ts) BETWEEN 12 AND 14) AS h12_14,
        |  count(*) FILTER (hour(ts) BETWEEN 15 AND 17) AS h15_17,
        |  count(*) FILTER (hour(ts) BETWEEN 18 AND 20) AS h18_20,
        |  count(*) FILTER (hour(ts) BETWEEN 21 AND 23) AS h21_23,
        |  count(*) AS n_clicks
        |FROM events WHERE event_type = 'click'""".stripMargin,
    "q156_crossborder_flows" ->
      s"""SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
         |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  $revSql AS revenue, count(*) AS n_items
         |FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         | JOIN supplier ON l_suppkey = s_suppkey
         | JOIN nation cn ON c_nationkey = cn.n_nationkey
         | JOIN nation sn ON s_nationkey = sn.n_nationkey
         |WHERE cn.n_name != sn.n_name
         |GROUP BY cn.n_name, sn.n_name, year(o_orderdate)
         |ORDER BY cust_nation, supp_nation, o_year""".stripMargin,
    "q157_sole_returned_supplier" ->
      """WITH l1 AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
        |            FROM lineitem WHERE l_returnflag = 'R')
        |SELECT s_name, count(*) AS numwait
        |FROM l1 JOIN supplier ON sk = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.ok
        |                AND l2.l_suppkey != l1.sk)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.ok
        |                    AND l3.l_suppkey != l1.sk
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin,
    "q167_banded_profile" ->
      """SELECT count(*) AS n_rows,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(*), 6) AS avg_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE (c_mktsegment = 'BUILDING'
        |    AND l_quantity BETWEEN 1 AND 15
        |    AND l_discount BETWEEN 0.00 AND 0.04)
        |  OR (c_mktsegment = 'AUTOMOBILE'
        |    AND l_quantity BETWEEN 16 AND 30
        |    AND l_discount BETWEEN 0.02 AND 0.06)
        |  OR (c_mktsegment = 'MACHINERY'
        |    AND l_quantity BETWEEN 31 AND 50
        |    AND l_discount BETWEEN 0.04 AND 0.10)""".stripMargin,
    "q168_frequent_baskets" ->
      """SELECT c_custkey, c_name, n_baskets FROM (
        |  SELECT o_custkey, count(*) AS n_baskets FROM (
        |    SELECT l_orderkey FROM lineitem
        |    GROUP BY l_orderkey HAVING count(*) BETWEEN 6 AND 7) b
        |  JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY o_custkey HAVING count(*) >= 2) f
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY n_baskets DESC, c_custkey""".stripMargin,
    "q175_semi_chain" ->
      """SELECT count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS total_price
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
        |  WHERE a.l_orderkey = o.o_orderkey)
        |AND NOT EXISTS (SELECT 1 FROM lineitem r
        |  WHERE r.l_orderkey = o.o_orderkey
        |    AND r.l_returnflag = 'R')""".stripMargin,
    "q176_cte_reuse" ->
      s"""WITH freq AS (SELECT l_partkey FROM lineitem
         |  GROUP BY l_partkey HAVING count(DISTINCT l_orderkey) >= 5),
         |spend AS (SELECT o_custkey,
         |    sum(CAST(o_totalprice AS DECIMAL(18,4))) AS spend
         |  FROM orders GROUP BY o_custkey),
         |tot AS (SELECT sum(spend) AS tot, count(*) AS n_cust FROM spend),
         |best AS (SELECT o_custkey FROM spend, tot
         |  WHERE CAST(spend AS DOUBLE)
         |      > 2.0 * (CAST(tot AS DOUBLE) / n_cust))
         |SELECT o.o_orderstatus AS channel, $revSql AS revenue,
         |  count(*) AS n_items
         |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |WHERE o.o_orderstatus IN ('O', 'F')
         |  AND EXISTS (SELECT 1 FROM freq f
         |              WHERE f.l_partkey = l.l_partkey)
         |  AND EXISTS (SELECT 1 FROM best b
         |              WHERE b.o_custkey = o.o_custkey)
         |GROUP BY o.o_orderstatus
         |ORDER BY channel""".stripMargin,
    "q177_channel_rankings" ->
      """WITH g AS (
        |  SELECT o.o_orderpriority AS channel, l.l_partkey,
        |    CAST(sum(CASE WHEN l.l_returnflag = 'R' THEN l.l_quantity
        |             ELSE 0 END) AS BIGINT) AS ret_qty,
        |    CAST(sum(l.l_quantity) AS BIGINT) AS tot_qty
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2),
        |r AS (SELECT channel, l_partkey, ret_qty, tot_qty,
        |    CAST(ret_qty AS DOUBLE) / tot_qty AS ratio_raw,
        |    row_number() OVER (PARTITION BY channel
        |      ORDER BY CAST(ret_qty AS DOUBLE) / tot_qty DESC,
        |        l_partkey) AS rk
        |  FROM g)
        |SELECT channel, l_partkey, ret_qty, tot_qty,
        |  round(ratio_raw, 6) AS return_ratio, rk
        |FROM r WHERE rk <= 10 ORDER BY channel, rk""".stripMargin,
    "q178_yoy_share" ->
      """WITH g AS (
        |  SELECT n.n_name, year(o.o_orderdate) AS yr,
        |    sum(CAST(o.o_totalprice AS DECIMAL(18,4))) AS nrev
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1, 2),
        |s AS (SELECT n_name, yr,
        |    CAST(nrev AS DOUBLE)
        |      / CAST(sum(nrev) OVER (PARTITION BY yr) AS DOUBLE)
        |      AS share_raw
        |  FROM g),
        |d AS (SELECT n_name, yr, share_raw,
        |    lag(share_raw, 1) OVER (PARTITION BY n_name ORDER BY yr)
        |      AS prev_raw
        |  FROM s)
        |SELECT n_name, yr, round(share_raw, 6) AS share,
        |  round(prev_raw, 6) AS prev_share, share_raw > prev_raw AS grew
        |FROM d WHERE prev_raw IS NOT NULL
        |ORDER BY n_name, yr""".stripMargin,
    "q193_moving_avg" ->
      """WITH m AS (
        |  SELECT n_name, strftime(o_orderdate, '%Y-%m') AS mo,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 10000
        |      AS BIGINT) AS mrev_i
        |  FROM orders
        |   JOIN customer ON o_custkey = c_custkey
        |   JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, mo),
        |w AS (
        |  SELECT n_name, mo, mrev_i,
        |    sum(mrev_i) OVER fr AS frame_sum_i,
        |    count(*) OVER fr AS frame_n
        |  FROM m
        |  WINDOW fr AS (PARTITION BY n_name ORDER BY mo
        |    ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING))
        |SELECT n_name, mo, CAST(mrev_i AS DOUBLE) / 10000 AS mrev,
        |  round(CAST(frame_sum_i AS DOUBLE) / 10000 / frame_n, 6)
        |    AS mavg3
        |FROM w WHERE mrev_i * frame_n * 10 > frame_sum_i * 11
        |ORDER BY n_name, mo""".stripMargin,
    "q194_yoy_growth" ->
      """WITH spend AS (
        |  SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 10000
        |      AS BIGINT) AS spend_i
        |  FROM orders GROUP BY o_custkey, yr)
        |SELECT c_custkey, c_name, y1.yr AS yr1, y2.yr AS yr2,
        |  CAST(y1.spend_i AS DOUBLE) / 10000 AS spend1,
        |  CAST(y2.spend_i AS DOUBLE) / 10000 AS spend2,
        |  round(CAST(y2.spend_i AS DOUBLE) / y1.spend_i, 6) AS growth
        |FROM spend y1 JOIN spend y2
        |  ON y1.o_custkey = y2.o_custkey AND y2.yr = y1.yr + 1
        | JOIN customer ON y1.o_custkey = c_custkey
        |WHERE y2.spend_i * 4 > y1.spend_i * 5
        |ORDER BY c_custkey, yr1""".stripMargin,
    "q195_channel_fullouter" ->
      """WITH o AS (
        |  SELECT o_custkey AS ck,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 10000
        |      AS BIGINT) AS rev_i, count(*) AS n
        |  FROM orders WHERE o_orderstatus = 'O' GROUP BY ck),
        |f AS (
        |  SELECT o_custkey AS ck,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 10000
        |      AS BIGINT) AS rev_i, count(*) AS n
        |  FROM orders WHERE o_orderstatus = 'F' GROUP BY ck)
        |SELECT coalesce(o.ck, f.ck) AS custkey,
        |  CASE WHEN o.rev_i IS NULL THEN 'F-only' ELSE 'O-only' END
        |    AS channel,
        |  CAST(coalesce(o.rev_i, f.rev_i) AS DOUBLE) / 10000 AS revenue,
        |  coalesce(o.n, f.n) AS n_orders
        |FROM o FULL OUTER JOIN f ON o.ck = f.ck
        |WHERE o.rev_i IS NULL OR f.rev_i IS NULL
        |ORDER BY custkey""".stripMargin,
    "q199_lateral_topk" ->
      """SELECT o_orderkey, l.pk, l.price
        |FROM orders JOIN LATERAL (
        |  SELECT l_partkey AS pk, l_extendedprice AS price
        |  FROM lineitem WHERE l_orderkey = o_orderkey
        |  ORDER BY l_extendedprice DESC, l_partkey LIMIT 3) l ON true
        |WHERE o_orderstatus = 'F'
        |ORDER BY o_orderkey, price DESC, pk""".stripMargin,
    "q200_waiting_suppliers" ->
      """WITH l AS (
        |  SELECT l_orderkey, l_suppkey,
        |    (CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)) > 60
        |      AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |l1 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM l WHERE late)
        |SELECT s_suppkey, s_name, count(*) AS numwait
        |FROM l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM l l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM l l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_suppkey""".stripMargin,
    "q201_customer_segments" ->
      """WITH f AS (
        |  SELECT o_custkey,
        |    max(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
        |      AS has_open,
        |    max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS has_finished,
        |    max(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END)
        |      AS has_big
        |  FROM orders GROUP BY o_custkey)
        |SELECT n_name, has_open, has_finished, has_big,
        |  count(*) AS n_customers
        |FROM f JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin
  )
}
