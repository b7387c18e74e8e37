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
    }
  )

  private val revSql =
    "CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)"

  override def oracle: Map[String, String] = Map(
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
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin
  )
}
