package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Join coverage (SURVEY §2.2): every join type × algorithm the reference
  * supports — inner/left/right/full/semi/anti/existence, shuffle-hash vs
  * broadcast vs nested-loop, null-safe equality, cross — expressed
  * Spark-first so Catalyst + AQE pick the physical strategy.
  *
  * Reference join inventory: /root/reference/native-engine/
  * datafusion-ext-plans/src/joins/join_utils.rs:21-29 (types) and
  * auron.proto:515-523; algorithms SMJ/SHJ/BHJ/BNLJ per SURVEY §2.2.
  *
  * Scale notes: dims (region/nation/customer at bench SF) are broadcast —
  * no shuffle of the fact side; big-big joins shuffle on the join key and
  * aggregate map-side first where possible. All outputs are small
  * aggregates or key lists, never row explosions.
  */
object Joins extends QueryModule {

  private val D4 = DecimalType(18, 4)
  private def revenue(c: Column = col("l_extendedprice"),
                      d: Column = col("l_discount")) =
    sum((c * (lit(1.0) - d)).cast(D4)).cast(DoubleType)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Big-big equi-join (shuffle on l_orderkey/o_orderkey), map-side
    // partial agg after the join keyed on a low-cardinality column.
    "q10_join_inner" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
      val ord = Tables.df(s, dir, "orders")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(revenue().as("revenue"), count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    },

    // 5-way star join: fact lineitem + broadcast dims (orders->customer->
    // nation->region). At 100 TB the dims still broadcast; only the fact
    // shuffles for the final agg.
    "q11_join_star" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
      val ord = Tables.df(s, dir, "orders")
      val cust = Tables.df(s, dir, "customer")
      val nat = Tables.df(s, dir, "nation")
      val reg = Tables.df(s, dir, "region")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(revenue().as("revenue"), count(lit(1)).as("n"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // LEFT OUTER + re-agg: TPC-H Q13 shape (orders-per-customer histogram
    // including zero-order customers).
    "q12_join_left" -> { (s, dir) =>
      val cust = Tables.df(s, dir, "customer")
      val ord = Tables.df(s, dir, "orders")
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy(col("n_orders"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("n_orders"))
    },

    // RIGHT OUTER with a compound join condition (equi key + pushed-down
    // range predicate inside the ON clause).
    "q13_join_right" -> { (s, dir) =>
      val ord = Tables.df(s, dir, "orders")
      val cust = Tables.df(s, dir, "customer")
      ord.join(cust,
          ord("o_custkey") === cust("c_custkey") &&
            ord("o_totalprice") > 300000.0, "right")
        .groupBy(col("c_mktsegment"))
        .agg(count(col("o_orderkey")).as("n_big_orders"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("c_mktsegment"))
    },

    // FULL OUTER on deliberately partial key sets; classify match side.
    "q14_join_full" -> { (s, dir) =>
      val rich = Tables.df(s, dir, "customer")
        .filter(col("c_acctbal") > 5000.0)
        .select(col("c_custkey").as("k")).distinct()
      val big = Tables.df(s, dir, "orders")
        .filter(col("o_totalprice") > 300000.0)
        .select(col("o_custkey").as("k2")).distinct()
      rich.join(big, rich("k") === big("k2"), "full")
        .select(when(col("k").isNull, "right_only")
          .when(col("k2").isNull, "left_only")
          .otherwise("both").as("side"))
        .groupBy(col("side")).agg(count(lit(1)).as("n"))
        .orderBy(col("side"))
    },

    // LEFT SEMI (EXISTS): customers with at least one urgent order.
    "q15_join_semi" -> { (s, dir) =>
      val cust = Tables.df(s, dir, "customer")
      val urgent = Tables.df(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      cust.join(urgent, cust("c_custkey") === urgent("o_custkey"),
          "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },

    // LEFT ANTI (NOT EXISTS).
    "q16_join_anti" -> { (s, dir) =>
      val cust = Tables.df(s, dir, "customer")
      val urgent = Tables.df(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      cust.join(urgent, cust("c_custkey") === urgent("o_custkey"),
          "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },

    // Non-equi join -> BroadcastNestedLoopJoin: band join against a tiny
    // in-memory dim (reference: BNLJ via broadcast_join without keys,
    // AuronConverters.scala:249-250,773-811).
    "q17_join_nonequi" -> { (s, dir) =>
      import s.implicits._
      val part = Tables.df(s, dir, "part")
      val bands = Seq(
        (900.0, 907.0, "low"), (907.0, 914.0, "mid"),
        (914.0, 920.0, "high"))
        .toDF("lo", "hi", "band")
      part.join(broadcast(bands),
          part("p_retailprice") >= bands("lo") &&
            part("p_retailprice") < bands("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          sum(col("p_retailprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("sum_price"))
        .orderBy(col("band"))
    },

    // Null-safe equality (<=>, IS NOT DISTINCT FROM): nulls introduced via
    // NULLIF compare equal to each other.
    "q18_join_nullsafe" -> { (s, dir) =>
      val cust = Tables.df(s, dir, "customer")
        .withColumn("seg_n", nullif(col("c_mktsegment"), lit("BUILDING")))
      val segs = cust.select(col("seg_n").as("seg")).distinct()
      cust.join(broadcast(segs), col("seg_n") <=> col("seg"))
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("seg"), lit("(null)")).as("seg"), col("n"))
        .orderBy(col("seg"))
    },

    // CROSS join of two tiny dims.
    "q19_join_cross" -> { (s, dir) =>
      val reg = Tables.df(s, dir, "region")
      val nat = Tables.df(s, dir, "nation")
      reg.crossJoin(nat)
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // Forced sort-merge join (merge hint) — the algorithm big-big joins
    // use at 100 TB where neither side broadcasts (reference:
    // sort_merge_join_exec.rs; SURVEY §2.2).
    "q35_join_smj" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem").hint("merge")
      val ord = Tables.df(s, dir, "orders")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(revenue().as("revenue"), count(lit(1)).as("n"))
        .orderBy(col("l_linestatus"))
    },

    // Forced shuffled-hash join (reference FORCE_SHUFFLED_HASH_JOIN,
    // SparkAuronConfiguration.java:205).
    "q36_join_shj" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
      val ord = Tables.df(s, dir, "orders").hint("shuffle_hash")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(revenue().as("revenue"), count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    },

    // Salted join — THE skew-mitigation pattern for hot keys at 100 TB:
    // replicate the dim SALT times (explode), derive a deterministic salt
    // on the fact side, and join on (key, salt) so one hot key spreads
    // over SALT reducers. Result provably equals the unsalted join (the
    // oracle is the plain join).
    "q38_salted_join" -> { (s, dir) =>
      val salt = 8
      val ev = Tables.df(s, dir, "events")
        .withColumn("salt", pmod(col("event_id"), lit(salt)))
      val dim = Tables.df(s, dir, "nation")
        .withColumn("salt", explode(array((0 until salt).map(lit): _*)))
      ev.join(broadcast(dim),
          ev("user_id") === dim("n_nationkey") &&
            ev("salt") === dim("salt"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("sum_v"))
        .orderBy(col("n_name"))
    },

    // Existence join: IN-subquery in the projection (plans ExistenceJoin;
    // reference maps it from decorrelated IN, NativeConverters.scala:1390).
    "q20_join_existence" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT c_custkey,
          |  c_custkey IN (SELECT o_custkey FROM orders
          |                WHERE o_totalprice > 300000.0) AS has_big
          |FROM customer ORDER BY c_custkey""".stripMargin)
    },

    // Binned range join: point-in-interval join rewritten as an equi-join.
    // A naive `p BETWEEN start AND end` join has no equi key, so Spark
    // plans a nested-loop — O(n·m), a scale-killer. Binning both sides by
    // the interval width (each 3-day interval covers ≤2 bins; each point
    // falls in exactly one) turns it into a shuffled equi-join on the bin
    // plus a residual filter: O(n+m) shuffle, pairs generated only within
    // a bin. Plan shape (SMJ/SHJ on `bin`, no BNLJ) asserted in PlanSpec.
    "q108_range_join_binned" -> { (s, dir) =>
      val w = 3 // bin width = interval length, days
      val epoch = lit("1995-01-01").cast(DateType)
      val ivals = Tables.df(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"),
          datediff(col("o_orderdate").cast(DateType), epoch).as("d0"))
        // interval [d0, d0+w) touches bins floor(d0/w) .. floor((d0+w-1)/w)
        .withColumn("bin",
          explode(sequence(floor(col("d0") / w), floor((col("d0") + (w - 1)) / w))))
      val points = Tables.df(s, dir, "lineitem")
        .select(col("l_quantity"),
          datediff(col("l_shipdate").cast(DateType), epoch).as("dp"))
        .withColumn("bin", floor(col("dp") / w))
      ivals.join(points,
          ivals("bin") === points("bin") &&
            col("dp") >= col("d0") && col("dp") < col("d0") + w)
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("qty"))
        .orderBy(col("o_orderkey"))
    },

    // NOT IN — the null-aware anti join. Unlike NOT EXISTS (q16's plain
    // LeftAnti), `x NOT IN (subquery)` is three-valued: one NULL in the
    // subquery output annihilates EVERY row, and a NULL probe never
    // qualifies. Spark plans the single-column no-correlation case as
    // BroadcastHashJoin(LeftAnti, NullAwareAntiJoin) — the hashed-relation
    // fast path that keeps full SQL semantics without a nested loop
    // (asserted in PlanSpec; the null-annihilation semantics themselves
    // are pinned in QueriesSpec against an IN-list with a NULL).
    "q207_not_in_nullaware" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT n_name, count(*) AS n_inactive
          |FROM customer JOIN nation ON c_nationkey = n_nationkey
          |WHERE c_custkey NOT IN
          |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
          |GROUP BY n_name ORDER BY n_name""".stripMargin)
    }
  )

  override def oracle: Map[String, String] = Map(
    "q10_join_inner" ->
      """SELECT o_orderpriority,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q11_join_star" ->
      """SELECT r_name, n_name,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | count(*) AS n
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q12_join_left" ->
      """SELECT n_orders, count(*) AS n_cust FROM (
        |  SELECT c_custkey, count(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY c_custkey
        |) GROUP BY n_orders ORDER BY n_orders""".stripMargin,
    "q13_join_right" ->
      """SELECT c_mktsegment, count(o_orderkey) AS n_big_orders,
        | count(*) AS n_rows
        |FROM orders RIGHT JOIN customer
        | ON o_custkey = c_custkey AND o_totalprice > 300000.0
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q14_join_full" ->
      """SELECT side, count(*) AS n FROM (
        |  SELECT CASE WHEN a.k IS NULL THEN 'right_only'
        |              WHEN b.k2 IS NULL THEN 'left_only'
        |              ELSE 'both' END AS side
        |  FROM (SELECT DISTINCT c_custkey AS k FROM customer
        |        WHERE c_acctbal > 5000.0) a
        |  FULL JOIN (SELECT DISTINCT o_custkey AS k2 FROM orders
        |             WHERE o_totalprice > 300000.0) b ON a.k = b.k2
        |) GROUP BY side ORDER BY side""".stripMargin,
    "q15_join_semi" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders
        |                    WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q16_join_anti" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
        |                        WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q17_join_nonequi" ->
      """SELECT band, count(*) AS n,
        | CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM part JOIN (VALUES (900.0, 907.0, 'low'), (907.0, 914.0, 'mid'),
        |                       (914.0, 920.0, 'high')) AS b(lo, hi, band)
        | ON p_retailprice >= lo AND p_retailprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "q18_join_nullsafe" ->
      """SELECT coalesce(seg, '(null)') AS seg, count(*) AS n
        |FROM (SELECT nullif(c_mktsegment, 'BUILDING') AS seg_n
        |      FROM customer) c
        |JOIN (SELECT DISTINCT nullif(c_mktsegment, 'BUILDING') AS seg
        |      FROM customer) s
        | ON c.seg_n IS NOT DISTINCT FROM s.seg
        |GROUP BY seg ORDER BY seg""".stripMargin,
    "q19_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "q38_salted_join" ->
      """SELECT n_name, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events JOIN nation ON user_id = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q35_join_smj" ->
      """SELECT l_linestatus,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q36_join_shj" ->
      """SELECT o_orderstatus,
        | CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q20_join_existence" ->
      """SELECT c_custkey,
        | c_custkey IN (SELECT o_custkey FROM orders
        |               WHERE o_totalprice > 300000.0) AS has_big
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q108_range_join_binned" ->
      """SELECT o_orderkey, count(*) AS n_items,
        | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM orders JOIN lineitem
        | ON l_shipdate >= o_orderdate
        | AND l_shipdate < o_orderdate + INTERVAL 3 DAY
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,
    "q207_not_in_nullaware" ->
      """SELECT n_name, count(*) AS n_inactive
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |GROUP BY n_name ORDER BY n_name""".stripMargin
  )
}
