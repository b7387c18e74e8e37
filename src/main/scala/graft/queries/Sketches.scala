package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed sketch & re-aggregable summary surface: DataSketches HLL
  * (build → merge → estimate, the mergeable-sketch contract that lets a
  * 1000-executor job pre-aggregate per partition and union at the
  * coordinator), exact distinct counting via segment BITMAPS (the
  * bitmap-index pattern: per-segment fixed-size bitmaps OR-merge instead
  * of reshuffling raw keys), higher statistical moments
  * (skewness/kurtosis — single-pass, partial-aggregable central-moment
  * kernels), and ordered string aggregation (listagg WITHIN GROUP).
  *
  * Reference ground: auron's agg framework streams partial aggregate
  * states across the shuffle (native-engine/.../agg/mod.rs) — these
  * queries pin the Spark-native equivalents where the partial state IS
  * a sketch/bitmap/moment-vector, the property that makes the op
  * one-pass at 100 TB.
  */
object Sketches extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Mergeable sketches × grouping sets: distinct users at EVERY
    // granularity of CUBE(event_type, day) in one pass — Expand
    // replicates each row into its 4 grouping sets and the HLL partial
    // states merge map-side, so the "all granularities" report costs
    // one shuffle of sketch states, not one job per granularity (and
    // at 100 TB the exact-distinct side of each coarse cell is the
    // expensive part a production report would drop). Exact counts +
    // error-bound booleans keep the sketch oracle-checkable (q67
    // pattern); grouping_id disambiguates real vs cube nulls.
    "q314_hll_groupsets" -> { (s, dir) =>
      val ev = Tables.df(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type").as("et"),
          to_date(col("ts")).as("day"), col("user_id"))
      ev.cube(col("et"), col("day"))
        .agg(grouping_id().cast(LongType).as("gid"),
          countDistinct(col("user_id")).as("n_exact"),
          expr("hll_sketch_estimate(hll_sketch_agg(user_id))").as("est"))
        .select(col("et"), col("day").cast(StringType).as("day"),
          col("gid"), col("n_exact"),
          (abs(col("est") - col("n_exact")) <= col("n_exact") * 0.1)
            .as("approx_ok"))
        .orderBy(col("gid"), col("et"), col("day"))
    },

    // Higher central moments per group: Spark's skewness/kurtosis are
    // POPULATION g1 / excess-g2 (m3/m2^1.5, m4/m2^2 - 3 over mean
    // central moments) computed in one streaming pass with partial
    // merge (CentralMomentAgg) — map-side partials shuffle a 5-number
    // state, never rows. The oracle recomputes via an explicit
    // two-pass moment join, pinning the formula rather than trusting
    // name parity (DuckDB's own skewness/kurtosis are SAMPLE-corrected
    // and would NOT match).
    "q285_stats_moments" -> { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(
          round(skewness(col("l_quantity")), 6).as("skew"),
          round(kurtosis(col("l_quantity")), 6).as("kurt"),
          round(stddev_pop(col("l_quantity")), 6).as("sd_pop"),
          round(var_samp(col("l_quantity")), 6).as("var_samp"))
        .orderBy(col("flag"))
    },

    // DataSketches HLL: per-group sketch build + estimate, then a
    // GLOBAL estimate from hll_union_agg over the per-group sketches —
    // proving the merge path (the distributed contract: estimate(union
    // of sketches) ≈ distinct(union of streams), so per-partition
    // sketches union at the driver without touching raw keys again).
    // The oracle supplies exact distinct counts; the query asserts the
    // default-lgK error stays within 5% (~1.6% expected at lgK=12), so
    // a broken merge or estimator goes red.
    "q286_hll_sketch" -> { (s, dir) =>
      val o = Tables.df(s, dir, "orders")
        .select(col("o_orderpriority").as("g"), col("o_custkey").as("k"))
      val per = o.groupBy(col("g"))
        .agg(hll_sketch_agg(col("k")).as("sk"),
          countDistinct(col("k")).as("n_exact"))
      val perRows = per.select(col("g"), col("n_exact"),
        (abs(hll_sketch_estimate(col("sk")) - col("n_exact")) <=
          col("n_exact") * lit(0.05)).as("within_5pct"))
      val glob = per.agg(
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        .crossJoin(o.agg(countDistinct(col("k")).as("n_exact")))
        .select(lit("__ALL__").as("g"), col("n_exact"),
          (abs(col("est") - col("n_exact")) <= col("n_exact") * lit(0.05))
            .as("within_5pct"))
      perRows.unionByName(glob).orderBy(col("g"))
    },

    // Exact distinct via segment bitmaps: key → (bucket, bit) with
    // bitmap_bucket_number/bitmap_bit_position, one fixed-size (≤4 KB)
    // bitmap per (group, bucket) via bitmap_construct_agg, then
    // count = Σ bitmap_count per group and a global roll-up that
    // OR-merges the per-group bitmaps (bitmap_or_agg) WITHOUT
    // re-scanning keys — the bitmap-index distinct pattern: at 100 TB
    // the second-level agg moves only #buckets × 4 KB, not user ids.
    "q287_bitmap_distinct" -> { (s, dir) =>
      val e = Tables.df(s, dir, "events")
        .select(col("event_type").as("g"), col("user_id").as("k"))
      val seg = e
        .groupBy(col("g"), expr("bitmap_bucket_number(k)").as("bkt"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(k))").as("bm"))
      val per = seg.groupBy(col("g"))
        .agg(sum(expr("bitmap_count(bm)")).as("n_distinct"))
      val glob = seg.groupBy(col("bkt"))
        .agg(expr("bitmap_or_agg(bm)").as("bm"))
        .agg(sum(expr("bitmap_count(bm)")).as("n_distinct"))
        .select(lit("__ALL__").as("g"), col("n_distinct"))
      per.unionByName(glob).orderBy(col("g"))
    },

    // listagg WITHIN GROUP (Spark 4.0 SQL:2016 surface): ordered string
    // aggregation + the DISTINCT variant — deterministic by explicit
    // ORDER BY, so it hash-matches DuckDB's string_agg(... ORDER BY).
    "q288_listagg" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT r_name,
          |  listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)
          |    AS nations,
          |  listagg(DISTINCT substr(n_name, 8, 1), '')
          |    WITHIN GROUP (ORDER BY substr(n_name, 8, 1)) AS digits
          |FROM nation JOIN region ON n_regionkey = r_regionkey
          |GROUP BY r_name ORDER BY r_name""".stripMargin)
    }
  )

  override def oracle: Map[String, String] = Map(
    "q314_hll_groupsets" ->
      """SELECT event_type AS et, CAST(day AS VARCHAR) AS day,
        |  CAST(2 * GROUPING(event_type) + GROUPING(day) AS BIGINT)
        |    AS gid,
        |  count(DISTINCT user_id) AS n_exact, TRUE AS approx_ok
        |FROM (SELECT event_type, CAST(ts AS DATE) AS day, user_id
        |      FROM events WHERE event_type IN ('click', 'purchase'))
        |GROUP BY CUBE(event_type, day)
        |ORDER BY gid, et, day""".stripMargin,
    "q285_stats_moments" ->
      """WITH mu AS (
        |  SELECT l_returnflag AS flag, avg(l_quantity) AS m,
        |    count(*) AS n
        |  FROM lineitem GROUP BY 1),
        |mom AS (
        |  SELECT flag, n,
        |    avg(pow(l_quantity - m, 2)) AS m2,
        |    avg(pow(l_quantity - m, 3)) AS m3,
        |    avg(pow(l_quantity - m, 4)) AS m4
        |  FROM lineitem JOIN mu ON l_returnflag = flag
        |  GROUP BY flag, n)
        |SELECT flag,
        |  round(m3 / pow(m2, 1.5), 6) AS skew,
        |  round(m4 / (m2 * m2) - 3, 6) AS kurt,
        |  round(sqrt(m2), 6) AS sd_pop,
        |  round(m2 * n / (n - 1), 6) AS var_samp
        |FROM mom ORDER BY flag""".stripMargin,
    "q286_hll_sketch" ->
      """WITH per AS (
        |  SELECT o_orderpriority AS g,
        |    count(DISTINCT o_custkey) AS n_exact
        |  FROM orders GROUP BY 1
        |  UNION ALL
        |  SELECT '__ALL__', count(DISTINCT o_custkey) FROM orders)
        |SELECT g, n_exact, true AS within_5pct FROM per ORDER BY g""".stripMargin,
    "q287_bitmap_distinct" ->
      """SELECT event_type AS g,
        |  count(DISTINCT user_id) AS n_distinct
        |FROM events GROUP BY 1
        |UNION ALL
        |SELECT '__ALL__', count(DISTINCT user_id) FROM events
        |ORDER BY g""".stripMargin,
    "q288_listagg" ->
      """SELECT r_name,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  string_agg(DISTINCT substr(n_name, 8, 1), ''
        |    ORDER BY substr(n_name, 8, 1)) AS digits
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin
  )
}
