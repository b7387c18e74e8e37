package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation coverage (SURVEY §2.3 + Expand §2.1 row 12): min/max/sum/
  * avg/count, min_by/max_by (deterministic FIRST analogue), count distinct,
  * collect_list/collect_set, FILTER clause, rollup/cube/grouping sets,
  * moment statistics via exact decimal sums.
  *
  * Reference agg inventory: auron.proto:143-157 (AggFunction) with kernels
  * under native-engine/datafusion-ext-plans/src/agg/. Partial→final split
  * and spillable hash aggregation are Spark built-ins we inherit.
  */
object Aggregates extends QueryModule {

  private val D2 = DecimalType(18, 2)
  private val D4 = DecimalType(18, 4)
  private def dsum(c: Column, t: DecimalType = D2) = sum(c.cast(t)).cast(DoubleType)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // min/max over numerics + timestamps, min_by/max_by with a unique
    // ordering key ((l_orderkey, l_linenumber) is unique; linenumber <= 7).
    "q21_agg_minmax" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
      val uniq = col("l_orderkey") * 10 + col("l_linenumber")
      li.groupBy(col("l_returnflag"))
        .agg(
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          min(col("l_shipdate").cast(DateType)).as("min_ship"),
          max(col("l_shipdate").cast(DateType)).as("max_ship"),
          min_by(col("l_partkey"), uniq).as("first_part"),
          max_by(col("l_partkey"), uniq).as("last_part"))
        .orderBy(col("l_returnflag"))
    },

    // COUNT / COUNT(col) / COUNT(DISTINCT ...) — distinct lowers to the
    // two-phase Expand rewrite (SURVEY §2.3 last row).
    "q22_count_distinct" -> { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("l_partkey")).as("n_part_nonnull"),
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(col("l_returnflag"), col("l_linenumber"))
            .as("n_flag_line"))
        .orderBy(col("l_linestatus"))
    },

    // collect_list / collect_set, canonicalized (sorted, string-joined) so
    // the unordered aggregation state compares deterministically.
    "q23_collect" -> { (s, dir) =>
      Tables.df(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          array_join(array_sort(collect_set(col("o_orderpriority"))), ",")
            .as("priorities"),
          array_join(array_sort(collect_list(substring(
            col("o_orderpriority"), 1, 1))), "").as("prio_digits"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    },

    // FILTER clause on aggregates (reference: agg_ctx.rs:114-120 applies
    // filters in the partial phase only — semantics identical to Spark's).
    "q24_agg_filter" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT l_returnflag,
          |  count(*) FILTER (WHERE l_quantity > 25.0) AS n_big,
          |  count(*) FILTER (WHERE l_discount >= 0.05) AS n_disc,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
          |       FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS sum_f
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // ROLLUP — physical Expand operator (SURVEY §2.1 row 12); group cols
    // coalesced so the oracle compare never sees NULL group keys.
    "q25_rollup" -> { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
          grouping_id().cast(LongType).as("gid"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("sum_qty"), col("n"), col("gid"))
        .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
    },

    // CUBE.
    "q26_cube" -> { (s, dir) =>
      Tables.df(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("sum_price"),
          grouping_id().cast(LongType).as("gid"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
          col("n"), col("sum_price"), col("gid"))
        .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))
    },

    // Explicit GROUPING SETS via SQL.
    "q27_grouping_sets" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
          |       coalesce(l_linestatus, 'ALL') AS l_linestatus,
          |       count(*) AS n
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    },

    // Moment statistics from exact decimal sums: variance/stddev computed
    // with the same IEEE expression on both sides -> bit-identical doubles
    // (avoids engine-specific Welford accumulation orders).
    "q28_stats" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("s1"),
          dsum(col("l_quantity") * col("l_quantity"), D4).as("s2"))
        .select(col("l_returnflag"), col("n"),
          (col("s1") / col("n")).as("mean_qty"),
          ((col("s2") - col("s1") * col("s1") / col("n"))
            / (col("n") - lit(1))).as("var_qty"))
        .orderBy(col("l_returnflag"))
    },

    // Exact interpolated percentiles (Spark `percentile` == DuckDB
    // quantile_cont: both use the (n-1)p convention over sorted values;
    // inputs are exact 2dp doubles so interpolation is IEEE-identical).
    "q66_percentile" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT l_returnflag,
          |  percentile(l_quantity, 0.25) AS p25,
          |  percentile(l_quantity, 0.5) AS p50,
          |  percentile(l_quantity, 0.75) AS p75,
          |  percentile(l_quantity, 0.99) AS p99
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    },

    // Approximate distinct (HLL++) checked against exact via an
    // error-bound boolean: the estimator differs per engine, so emit
    // `approx_ok = |approx-exact|/exact <= 0.1` and let the oracle
    // supply the same exact side + TRUE — a hash-matchable row.
    "q67_approx_distinct" -> { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts"))
            <= col("exact_parts") * lit(0.1)).as("approx_ok"))
        .orderBy(col("l_returnflag"))
    },

    // Bitwise aggregates (bit_and/bit_or/bit_xor) + scalar bit ops
    // (shifts, popcount). All codegen'd fixed-width integer kernels —
    // partial/final aggregation applies like any other agg, so one
    // shuffle of 5 groups regardless of input size.
    "q112_bitwise" -> { (s, dir) =>
      Tables.df(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("bit_and(o_orderkey)").as("band"),
          expr("bit_or(o_orderkey)").as("bor"),
          expr("bit_xor(o_orderkey)").as("bxor"),
          sum(expr("bit_count(o_orderkey)").cast(LongType)).as("popcnt"),
          expr("bit_xor(shiftleft(o_orderkey, 2) | 5)").as("shift_xor"))
        .orderBy(col("o_orderpriority"))
    },

    // Conditional aggregation (CASE WHEN inside SUM) — manual pivot.
    "q29_agg_conditional" -> { (s, dir) =>
      Tables.df(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"),
          dsum(when(col("o_orderstatus") === "F", col("o_totalprice"))
            .otherwise(lit(0.0))).as("sum_f_price"))
        .orderBy(col("o_orderpriority"))
    }
  )

  override def oracle: Map[String, String] = Map(
    "q21_agg_minmax" ->
      """SELECT l_returnflag,
        | min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        | CAST(min(l_shipdate) AS DATE) AS min_ship,
        | CAST(max(l_shipdate) AS DATE) AS max_ship,
        | min_by(l_partkey, l_orderkey * 10 + l_linenumber) AS first_part,
        | max_by(l_partkey, l_orderkey * 10 + l_linenumber) AS last_part
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q22_count_distinct" ->
      """SELECT l_linestatus, count(*) AS n_rows,
        | count(l_partkey) AS n_part_nonnull,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps,
        | count(DISTINCT (l_returnflag, l_linenumber)) AS n_flag_line
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q23_collect" ->
      """SELECT o_orderstatus,
        | array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
        |   AS priorities,
        | array_to_string(list_sort(list(substring(o_orderpriority, 1, 1))),
        |   '') AS prio_digits,
        | count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q24_agg_filter" ->
      """SELECT l_returnflag,
        | count(*) FILTER (WHERE l_quantity > 25.0) AS n_big,
        | count(*) FILTER (WHERE l_discount >= 0.05) AS n_disc,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |      FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS sum_f
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q25_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        | coalesce(l_linestatus, 'ALL') AS l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | count(*) AS n,
        | CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "q26_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        | coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        | count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        | CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin,
    "q27_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        | coalesce(l_linestatus, 'ALL') AS l_linestatus,
        | count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q28_stats" ->
      """SELECT l_returnflag, n, s1 / n AS mean_qty,
        | (s2 - s1 * s1 / n) / (n - 1) AS var_qty
        |FROM (SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |  CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS s2
        |  FROM lineitem GROUP BY l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,
    "q67_approx_distinct" ->
      """SELECT l_returnflag,
        | count(DISTINCT l_partkey) AS exact_parts,
        | TRUE AS approx_ok
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q66_percentile" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.25) AS p25,
        | quantile_cont(l_quantity, 0.5) AS p50,
        | quantile_cont(l_quantity, 0.75) AS p75,
        | quantile_cont(l_quantity, 0.99) AS p99
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q29_agg_conditional" ->
      """SELECT o_orderpriority,
        | CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        | CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        | CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
        | CAST(sum(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice
        |                    ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE)
        |   AS sum_f_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q112_bitwise" ->
      """SELECT o_orderpriority,
        | bit_and(o_orderkey) AS band,
        | bit_or(o_orderkey) AS bor,
        | bit_xor(o_orderkey) AS bxor,
        | CAST(sum(bit_count(o_orderkey)) AS BIGINT) AS popcnt,
        | bit_xor((o_orderkey << 2) | 5) AS shift_xor
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )
}
