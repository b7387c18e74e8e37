package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Third analytics module: the remaining high-frequency TPC-DS join
  * topologies (Q72 triple-relation date-offset, Q14 cross-channel
  * INTERSECT, Q75 year-over-year channel decline) plus the recursive-CTE
  * hierarchy walk Spark 4 gained and the reference engine cannot run at
  * all (its protobuf plan vocabulary has no recursion node —
  * reference: native-engine/auron-proto/proto/auron.proto's closed
  * PhysicalPlanNode list).
  *
  * Scale conventions shared with Analytics/Analytics2: exact-decimal
  * money math, broadcast dims only (never a fact), every fact-to-fact
  * join on its natural equi key so the 100 TB plan is one shuffle per
  * fact side, θ-conditions ride as extra ON predicates inside the hash
  * join rather than post-filters or nested loops.
  */
object Analytics3 extends QueryModule {

  private val D4 = DecimalType(18, 4)
  private val D6 = DecimalType(18, 6)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TPC-DS Q72 topology — two facts joined on the natural key with a
    // DATE-OFFSET θ-condition riding the same join (ship > order + 30d:
    // "late shipments"), then broadcast supplier→nation dims and a
    // nation × month census. The θ-predicate must stay INSIDE the
    // equi hash join (extra ON clause), not become a BNLJ — at 100 TB
    // the orderkey equi-pair is the only shuffle either fact takes.
    "q216_late_shipments" -> { (s, dir) =>
      val l = Tables.df(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_shipdate"))
      val o = Tables.df(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
      val sup = Tables.df(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_nationkey"))
      val nat = Tables.df(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      l.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"),
          date_trunc("month", col("o_orderdate")).as("om"))
        .agg(count(lit(1)).as("n_late"),
          sum(col("l_extendedprice").cast(D4)).cast(DoubleType)
            .as("late_revenue"))
        .orderBy(col("n_name"), col("om"))
    },

    // TPC-DS Q14 topology — cross_items = parts present in ALL THREE
    // channels (returnflag R/A/N, qualified by a high-quantity sale),
    // built with chained INTERSECT (distinct set semantics — the
    // multiplicity-preserving twins live in q213), then a per-channel
    // revenue census restricted to those parts via a semi join. The
    // intersect legs each read the fact filtered+projected to the key
    // column only, so at 100 TB each leg is a narrow distinct-shuffle,
    // and the final restriction is a semi join (no row duplication).
    "q217_cross_channel_items" -> { (s, dir) =>
      val l = Tables.df(s, dir, "lineitem")
      def leg(flag: String) = l
        .filter(col("l_returnflag") === flag && col("l_quantity") >= 48)
        .select(col("l_partkey"))
      val crossItems = leg("R").intersect(leg("A")).intersect(leg("N"))
      l.join(crossItems, Seq("l_partkey"), "left_semi")
        .groupBy(col("l_returnflag").as("channel"))
        .agg(count(lit(1)).as("n_lines"),
          countDistinct(col("l_partkey")).as("n_parts"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(D6)).cast(DoubleType).as("revenue"))
        .orderBy(col("channel"))
    },

    // TPC-DS Q75 topology — per (brand, channel, year) sales roll-up,
    // self-joined year-over-year, keeping combinations whose revenue
    // dropped more than 10% (exact decimal boundary: cur*10 < prev*9).
    // The roll-up output is dimension-sized (brands × flags × years), so
    // the YoY self-join is a broadcast over a tiny aggregate — the fact
    // is read once and shuffles once (orderkey join, then group keys).
    "q218_yoy_decline" -> { (s, dir) =>
      val l = Tables.df(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_partkey"), col("l_returnflag"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      val o = Tables.df(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
      val p = Tables.df(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
      val sales = l
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_returnflag").as("channel"),
          year(col("o_orderdate")).cast(LongType).as("yr"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(D6)).as("rev"),
          sum(col("l_quantity").cast(D4)).as("qty"))
      val prev = sales.select(col("p_brand").as("pb"),
        col("channel").as("pch"), (col("yr") + 1).as("p_next_yr"),
        col("rev").as("p_rev"), col("qty").as("p_qty"))
      sales.join(broadcast(prev), col("p_brand") === col("pb") &&
          col("channel") === col("pch") && col("yr") === col("p_next_yr"))
        .filter(col("rev") * 10 < col("p_rev") * 9)
        .select(col("p_brand"), col("channel"), col("yr").as("cur_yr"),
          col("p_rev").cast(DoubleType).as("prev_rev"),
          col("rev").cast(DoubleType).as("cur_rev"),
          col("p_qty").cast(DoubleType).as("prev_qty"),
          col("qty").cast(DoubleType).as("cur_qty"))
        .orderBy(col("p_brand"), col("channel"), col("cur_yr"))
    },

    // RECURSIVE CTE (Spark 4 WITH RECURSIVE — beyond the reference,
    // whose plan protocol has no recursion operator): ancestor walk up
    // the implicit supplier binary tree (parent = suppkey div 2),
    // accumulating the exact-decimal account-balance path sum until the
    // root (suppkey < 2). Each iteration is one equi hash join of the
    // frontier against the parent table — O(log n) rounds, frontier
    // never exceeds the node count, no driver-side loop.
    "q219_recursive_hierarchy" -> { (s, dir) =>
      Tables.df(s, dir, "supplier")
        .createOrReplaceTempView("supplier_q219")
      s.sql("""WITH RECURSIVE climb AS (
        |  SELECT s_suppkey AS node, s_suppkey AS cur, 0 AS n_ancestors,
        |    CAST(CAST(s_acctbal AS DECIMAL(18,4)) AS DECIMAL(38,4))
        |      AS path_bal
        |  FROM supplier_q219
        |  UNION ALL
        |  SELECT c.node, p.s_suppkey, c.n_ancestors + 1,
        |    CAST(c.path_bal + CAST(p.s_acctbal AS DECIMAL(18,4))
        |      AS DECIMAL(38,4))
        |  FROM climb c JOIN supplier_q219 p
        |    ON p.s_suppkey = c.cur div 2 AND c.cur >= 2
        |)
        |SELECT node, cur AS root, n_ancestors,
        |  CAST(path_bal AS DOUBLE) AS path_bal
        |FROM climb WHERE cur < 2 ORDER BY node""".stripMargin)
    },

    // PageRank power iteration — the weighted-mass propagation twin of
    // the q118/q150 connected-components loop (labels propagate there;
    // rank mass propagates here). Graph: two deterministic out-edges
    // per supplier (a quadratic map + an integer-division map over the
    // key space — non-bijective, so in-degrees skew and ranks spread).
    // Three unrolled rounds of r' = 0.15 + 0.85·Σ in-contributions in
    // EXACT e12 fixed point: every contribution is r div 2 (out-degree
    // 2) and the damping is (85·Σ) div 100 — pure integer arithmetic,
    // so any partitioning and both engines agree bit-for-bit (float
    // PageRank would diverge by summation order). Each round is ONE
    // shuffle on dst (partial-aggregated map-side); the rank frontier
    // is node-sized, never edge-sized. At 100 TB the loop adds
    // per-round checkpoint freeing exactly as Pipeline3.freeCheckpoint
    // does for CC; 3 rounds keeps the verify bounded here.
    "q224_pagerank" -> { (s, dir) =>
      val sup = Tables.df(s, dir, "supplier").select(col("s_suppkey"))
      val nn = sup.agg(count(lit(1)).as("nn"))
      val withN = sup.crossJoin(broadcast(nn))
      val edges = withN.select(col("s_suppkey").as("src"),
          ((col("s_suppkey") * col("s_suppkey") + 7) % col("nn")).as("dst"))
        .union(withN.select(col("s_suppkey").as("src"),
          (expr("s_suppkey div 3") % col("nn")).as("dst")))
      var ranks = sup.select(col("s_suppkey").as("node"),
        lit(1000000000000L).as("r"))
      for (_ <- 1 to 3) {
        val contrib = edges
          .join(ranks, col("src") === col("node"))
          .groupBy(col("dst")).agg(sum(expr("r div 2")).as("mass_in"))
        ranks = sup.select(col("s_suppkey").as("node"))
          .join(contrib, col("node") === col("dst"), "left")
          .select(col("node"), (lit(150000000000L) +
            expr("85 * coalesce(mass_in, 0L) div 100")).as("r"))
      }
      ranks.select(col("node"), col("r").as("rank_e12"))
        .orderBy(col("node"))
    }
  )

  override def oracle: Map[String, String] = Map(
    "q216_late_shipments" ->
      """SELECT n.n_name, date_trunc('month', o.o_orderdate) AS om,
        |  count(*) AS n_late,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS late_revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q217_cross_channel_items" ->
      """WITH cross_items AS (
        |  SELECT l_partkey FROM lineitem
        |    WHERE l_returnflag = 'R' AND l_quantity >= 48
        |  INTERSECT
        |  SELECT l_partkey FROM lineitem
        |    WHERE l_returnflag = 'A' AND l_quantity >= 48
        |  INTERSECT
        |  SELECT l_partkey FROM lineitem
        |    WHERE l_returnflag = 'N' AND l_quantity >= 48)
        |SELECT l.l_returnflag AS channel, count(*) AS n_lines,
        |  count(DISTINCT l.l_partkey) AS n_parts,
        |  CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |WHERE l.l_partkey IN (SELECT l_partkey FROM cross_items)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q218_yoy_decline" ->
      """WITH sales AS (
        |  SELECT p.p_brand, l.l_returnflag AS channel,
        |    CAST(year(o.o_orderdate) AS BIGINT) AS yr,
        |    sum(CAST(l.l_extendedprice * (1 - l.l_discount)
        |      AS DECIMAL(18,6))) AS rev,
        |    sum(CAST(l.l_quantity AS DECIMAL(18,4))) AS qty
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2, 3)
        |SELECT c.p_brand, c.channel, c.yr AS cur_yr,
        |  CAST(p.rev AS DOUBLE) AS prev_rev,
        |  CAST(c.rev AS DOUBLE) AS cur_rev,
        |  CAST(p.qty AS DOUBLE) AS prev_qty,
        |  CAST(c.qty AS DOUBLE) AS cur_qty
        |FROM sales c JOIN sales p
        |  ON c.p_brand = p.p_brand AND c.channel = p.channel
        |  AND c.yr = p.yr + 1
        |WHERE c.rev * 10 < p.rev * 9
        |ORDER BY 1, 2, 3""".stripMargin,
    "q219_recursive_hierarchy" ->
      """WITH RECURSIVE climb AS (
        |  SELECT s_suppkey AS node, s_suppkey AS cur, 0 AS n_ancestors,
        |    CAST(CAST(s_acctbal AS DECIMAL(18,4)) AS DECIMAL(38,4))
        |      AS path_bal
        |  FROM supplier
        |  UNION ALL
        |  SELECT c.node, p.s_suppkey, c.n_ancestors + 1,
        |    CAST(c.path_bal + CAST(p.s_acctbal AS DECIMAL(18,4))
        |      AS DECIMAL(38,4))
        |  FROM climb c JOIN supplier p
        |    ON p.s_suppkey = c.cur // 2 AND c.cur >= 2
        |)
        |SELECT node, cur AS root, n_ancestors,
        |  CAST(path_bal AS DOUBLE) AS path_bal
        |FROM climb WHERE cur < 2 ORDER BY node""".stripMargin,
    "q224_pagerank" ->
      """WITH n AS (SELECT count(*) AS nn FROM supplier),
        |edges AS (
        |  SELECT s_suppkey AS src,
        |    (s_suppkey * s_suppkey + 7) % nn AS dst FROM supplier, n
        |  UNION ALL
        |  SELECT s_suppkey, (s_suppkey // 3) % nn FROM supplier, n),
        |r0 AS (SELECT s_suppkey AS node,
        |  CAST(1000000000000 AS BIGINT) AS r FROM supplier),
        |it1 AS (
        |  SELECT a.node,
        |    CAST(150000000000 + (85 * coalesce(m.s, 0)) // 100
        |      AS BIGINT) AS r
        |  FROM r0 a LEFT JOIN (
        |    SELECT e.dst AS node, sum(r.r // 2) AS s FROM edges e
        |    JOIN r0 r ON e.src = r.node GROUP BY 1) m
        |  ON a.node = m.node),
        |it2 AS (
        |  SELECT a.node,
        |    CAST(150000000000 + (85 * coalesce(m.s, 0)) // 100
        |      AS BIGINT) AS r
        |  FROM it1 a LEFT JOIN (
        |    SELECT e.dst AS node, sum(r.r // 2) AS s FROM edges e
        |    JOIN it1 r ON e.src = r.node GROUP BY 1) m
        |  ON a.node = m.node),
        |it3 AS (
        |  SELECT a.node,
        |    CAST(150000000000 + (85 * coalesce(m.s, 0)) // 100
        |      AS BIGINT) AS r
        |  FROM it2 a LEFT JOIN (
        |    SELECT e.dst AS node, sum(r.r // 2) AS s FROM edges e
        |    JOIN it2 r ON e.src = r.node GROUP BY 1) m
        |  ON a.node = m.node)
        |SELECT node, r AS rank_e12 FROM it3 ORDER BY node""".stripMargin
  )
}
