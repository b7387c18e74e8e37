package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Decimal/interval type coverage (SURVEY §1.2) and bucketed co-located
  * joins (§2.1 row 18 / §7.2 step 8): bucketing pre-shuffles data once at
  * write time so every subsequent equi-join on the bucket key runs with
  * NO exchange — at 100 TB this turns the nightly fact-fact join from the
  * dominant shuffle into a local merge (BucketedJoinSpec asserts the
  * exchange-free plan).
  */
object Storage extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact decimal arithmetic: +, -, * on DECIMAL stay exact; emitted as
    // doubles. (Division/overflow semantics differ between engines'
    // decimal rules, so division happens in double on both sides.)
    "q58_decimal" -> { (s, dir) =>
      val dp = col("l_extendedprice").cast(DecimalType(12, 2))
      val dq = col("l_quantity").cast(DecimalType(12, 2))
      val dd = col("l_discount").cast(DecimalType(4, 2))
      Tables.df(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 200)
        .select(col("l_orderkey"), col("l_linenumber"),
          (dp + dq).cast(DoubleType).as("dec_add"),
          (dp - dq).cast(DoubleType).as("dec_sub"),
          (dp * dd).cast(DoubleType).as("dec_mul"),
          (dp.cast(DoubleType) / dq.cast(DoubleType)).as("dbl_div"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // Interval arithmetic on dates and timestamps.
    "q59_intervals" -> { (s, dir) =>
      Tables.df(s, dir, "orders")
        .select(col("o_orderkey"),
          (col("o_orderdate") + expr("INTERVAL 3 DAYS")).cast(DateType)
            .as("plus3d"),
          (col("o_orderdate") - expr("INTERVAL 12 HOURS")).cast(DateType)
            .as("minus12h"),
          add_months(col("o_orderdate").cast(DateType), 2).as("plus2m"))
        .orderBy(col("o_orderkey"))
    },

    // Bucketed tables + co-located join: both sides bucketed (8 buckets)
    // and sorted on the join key at write time; the join then needs no
    // shuffle at read time.
    "q64_bucketed_join" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      val ord = Tables.df(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      li.write.mode("overwrite")
        .option("path", "/tmp/graft_warehouse/li_b")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_li_b")
      ord.write.mode("overwrite")
        .option("path", "/tmp/graft_warehouse/ord_b")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_ord_b")
      // merge hint: at bench scale the small side would auto-broadcast,
      // hiding the point — at 100 TB neither side broadcasts and SMJ over
      // co-located buckets (no exchange) is exactly the plan you want.
      val bl = s.table("graft_li_b").hint("merge")
      val bo = s.table("graft_ord_b")
      bl.join(bo, bl("l_orderkey") === bo("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2)))
          .cast(DoubleType).as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }
  )

  override def oracle: Map[String, String] = Map(
    "q58_decimal" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |   + CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS dec_add,
        | CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |   - CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS dec_sub,
        | CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |   * CAST(l_discount AS DECIMAL(4,2)) AS DOUBLE) AS dec_mul,
        | CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE)
        |   / CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS dbl_div
        |FROM lineitem WHERE l_orderkey <= 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q59_intervals" ->
      """SELECT o_orderkey,
        | CAST(o_orderdate + INTERVAL 3 DAY AS DATE) AS plus3d,
        | CAST(o_orderdate - INTERVAL 12 HOUR AS DATE) AS minus12h,
        | CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE)
        |   AS plus2m
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q64_bucketed_join" ->
      """SELECT o_orderpriority,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        | count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )
}
