package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational operators: scan, project, filter, sort, limit/offset,
  * union, distinct, intersect/except (SURVEY §2.1 rows 1,3,4,5,6,15,16,17).
  *
  * Determinism conventions (driver hashes Spark output vs a DuckDB oracle):
  *  - double aggregates go through DECIMAL casts (exact, order-independent
  *    summation) and come back out as DOUBLE, identically on both sides;
  *  - every query is totally ordered (ORDER BY on a key) so row order can
  *    never differ;
  *  - column names are aliased identically on both sides.
  */
object Relational extends QueryModule {

  private val D2 = DecimalType(18, 2)
  private val D4 = DecimalType(18, 4)
  private val D6 = DecimalType(18, 6)

  /** Exact decimal sum of a double expression, emitted as double. */
  private def dsum(c: org.apache.spark.sql.Column, t: DecimalType = D2) =
    sum(c.cast(t)).cast(DoubleType)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // GROUP BY ALL / ORDER BY ALL (Spark 4 SQL surface — DuckDB's own
    // dialect convenience, now portable): every non-aggregate select
    // item groups implicitly and the full select list orders the
    // result. Same physical plan as writing the lists out; the row is
    // SQL-surface parity.
    "q268_group_by_all" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""SELECT l_returnflag, l_linestatus, count(*) AS n,
              |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
              |    AS sum_qty
              |FROM lineitem
              |GROUP BY ALL ORDER BY ALL""".stripMargin)
    },

    // IDENTIFIER() + named parameter markers (Spark 4): templated
    // table/column references and :param binding — the SAFE dynamic-SQL
    // surface (string-splicing table names is the injection bug this
    // exists to kill). The oracle runs the resolved query literally.
    "q269_identifier_params" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT o_orderpriority, count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS total
          |FROM IDENTIFIER(:tbl)
          |WHERE o_orderstatus = :status
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
        Map("tbl" -> "orders", "status" -> "F"))
    },

    // TPC-H Q1: scan → filter (parquet-pushed) → partial+final hash agg →
    // sort. The flagship: exercises pushdown, whole-stage codegen, and
    // map-side partial aggregation — the shape that scales to 100 TB.
    "q1_agg" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), D4)
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax")), D6).as("sum_charge"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Projection + filter: both pushed into the parquet scan (PushedFilters
    // + pruned ReadSchema — verified via explain in RelationalSpec).
    "q2_filter_project" -> { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .filter(col("l_quantity") > 45.0 && col("l_discount") >= 0.05)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // Top-K: orderBy+limit plans TakeOrderedAndProject (partial per-partition
    // top-k, no full sort — O(k) memory per partition at any scale).
    "q3_topk" -> { (s, dir) =>
      Tables.df(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .limit(25)
    },

    // Global limit + offset over a total order.
    "q4_limit_offset" -> { (s, dir) =>
      Tables.df(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
        .offset(50).limit(100)
    },

    // UNION ALL of two projections, re-aggregated (deterministic + small).
    "q5_union_all" -> { (s, dir) =>
      val a = Tables.df(s, dir, "orders")
        .select(col("o_custkey").as("custkey"))
      val b = Tables.df(s, dir, "customer")
        .select(col("c_custkey").as("custkey"))
      a.union(b).groupBy(col("custkey"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("custkey"))
    },

    // DISTINCT (lowers to an aggregate, SURVEY §2.1 note).
    "q6_distinct" -> { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // INTERSECT — Spark lowers to left-semi join (SURVEY §2.1 "not
    // converted" note: set-ops never appear physically; semis do).
    "q7_intersect" -> { (s, dir) =>
      val cust = Tables.df(s, dir, "customer").select(col("c_custkey"))
      val ord = Tables.df(s, dir, "orders")
        .select(col("o_custkey").as("c_custkey"))
      cust.intersect(ord).orderBy(col("c_custkey"))
    },

    // unionByName: schema-aligned union (column order differs; one side
    // is missing a column, filled with NULL via allowMissingColumns).
    "q9_union_by_name" -> { (s, dir) =>
      val a = Tables.df(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus"))
      val b = Tables.df(s, dir, "orders")
        .filter(col("o_totalprice") > 300000.0)
        .select(col("o_totalprice"), col("o_orderkey")) // reordered, short
      a.unionByName(b, allowMissingColumns = true)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("sum_price"))
        .select(coalesce(col("o_orderstatus"), lit("(null)"))
          .as("o_orderstatus"), col("n"), col("sum_price"))
        .orderBy(col("o_orderstatus"))
    },

    // EXCEPT — lowers to left-anti join. Filtered right side so the
    // difference is non-empty at every scale factor.
    "q8_except" -> { (s, dir) =>
      val cust = Tables.df(s, dir, "customer").select(col("c_custkey"))
      val bigSpenders = Tables.df(s, dir, "orders")
        .filter(col("o_totalprice") > 300000.0)
        .select(col("o_custkey").as("c_custkey"))
      cust.except(bigSpenders).orderBy(col("c_custkey"))
    }
  )

  override def oracle: Map[String, String] = Map(
    "q268_group_by_all" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_qty
        |FROM lineitem GROUP BY ALL ORDER BY ALL""".stripMargin,
    "q269_identifier_params" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem WHERE l_quantity > 45.0 AND l_discount >= 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q3_topk" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,
    "q4_limit_offset" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |ORDER BY o_orderkey LIMIT 100 OFFSET 50""".stripMargin,
    "q5_union_all" ->
      """SELECT custkey, count(*) AS n FROM (
        |  SELECT o_custkey AS custkey FROM orders
        |  UNION ALL
        |  SELECT c_custkey AS custkey FROM customer
        |) GROUP BY custkey ORDER BY custkey""".stripMargin,
    "q6_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q7_intersect" ->
      """SELECT c_custkey FROM customer
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin,
    "q9_union_by_name" ->
      """SELECT coalesce(o_orderstatus, '(null)') AS o_orderstatus,
        | count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |   AS sum_price
        |FROM (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, NULL AS o_orderstatus
        |  FROM orders WHERE o_totalprice > 300000.0
        |) GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    "q8_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000.0
        |ORDER BY c_custkey""".stripMargin
  )
}
