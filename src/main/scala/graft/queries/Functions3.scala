package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Third SQL-surface sweep — the remaining user-facing corners:
  * width_bucket histogramming, stack() unpivot generation, EXECUTE
  * IMMEDIATE + session variables (dynamic SQL), collation-aware
  * grouping (Spark 4 UTF8_LCASE), a pinned misc-function battery
  * (soundex/luhn/to_varchar/conv/getbit/...), and correlated LATERAL
  * subquery join (per-row top-k without a window over the whole
  * fact table).
  */
object Functions3 extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // width_bucket: fixed-width histogram in ONE codegen'd expression —
    // no join against a bucket dimension, no crossJoin with min/max
    // (the bounds are part of the report spec, so they're literals).
    // Out-of-range rows land in the documented 0 / n+1 overflow
    // buckets. The oracle reconstructs the bucket arithmetic from the
    // definition, pinning edge semantics (x < lo -> 0, x >= hi -> n+1).
    "q289_width_bucket" -> { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .select(width_bucket(col("l_extendedprice"), lit(900.0),
          lit(105000.0), lit(10)).as("bkt"),
          col("l_extendedprice").as("p"))
        .groupBy(col("bkt"))
        .agg(count(lit(1)).as("n"),
          round(min(col("p")), 2).as("p_min"),
          round(max(col("p")), 2).as("p_max"))
        .orderBy(col("bkt"))
    },

    // stack() generator: wide metrics row → long (metric, value) rows
    // inside the SAME stage as the aggregation — the unpivot runs on
    // the 3-row agg output, not the fact table, so it is free at any
    // scale. Decimal-cast sums keep both engines bit-identical.
    "q290_stack_metrics" -> { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .groupBy(col("l_returnflag").as("flag"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("sq"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("sp"),
          round(avg(col("l_discount")), 6).as("ad"))
        .selectExpr("flag",
          "stack(3, 'sum_qty', sq, 'sum_price', sp, 'avg_disc', ad)" +
            " AS (metric, value)")
        .orderBy(col("flag"), col("metric"))
    },

    // Dynamic SQL: session variable (DECLARE / SET VAR) referenced
    // inside an EXECUTE IMMEDIATE template plus a positional ?
    // parameter — the safe parameterized-SQL surface (no string
    // splicing). The oracle runs the fully-resolved query literally.
    "q291_exec_immediate" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("DECLARE OR REPLACE VARIABLE qty_floor DOUBLE DEFAULT 0.0")
      s.sql("SET VAR qty_floor = 45.0")
      s.sql(
        """EXECUTE IMMEDIATE
          |  "SELECT l_returnflag AS flag, count(*) AS n
          |   FROM lineitem
          |   WHERE l_quantity >= qty_floor AND l_linestatus = ?
          |   GROUP BY 1 ORDER BY 1"
          |  USING 'F'""".stripMargin)
    },

    // Collation-aware grouping (Spark 4): group case-variant strings
    // under UTF8_LCASE so 'NATION_0' and 'nation_0' are ONE group.
    // The emitted key is lower()ed (the raw collated grouping value is
    // an arbitrary group representative — never emit it), the
    // representative is the binary min, and the result is re-collated
    // to UTF8_BINARY so downstream sort/compare semantics are the
    // default ones. Oracle: GROUP BY lower(s).
    "q292_collation_group" -> { (s, dir) =>
      val n = Tables.df(s, dir, "nation")
      val u = n.select(col("n_name").as("s"))
        .unionAll(n.filter(col("n_nationkey") % 2 === 0)
          .select(lower(col("n_name")).as("s")))
      u.groupBy(collate(col("s"), "UTF8_LCASE").as("sk"))
        .agg(count(lit(1)).as("n"), min(col("s")).as("rep"))
        .select(collate(lower(col("sk")), "UTF8_BINARY").as("k"),
          col("n"), col("rep"))
        .orderBy(col("k"))
    },

    // Misc scalar battery, PINNED-literal contract (CastMatrix
    // pattern): soundex, luhn_check, to_varchar/to_number format
    // engines, conv radix, bin, char, elt, factorial, hypot,
    // code-point vs byte length, bit_count/getbit, try_element_at
    // out-of-bounds -> NULL. One row; oracle SELECTs the expected
    // literals, so any kernel drift goes red.
    "q293_misc_funcs" -> { (s, dir) =>
      Tables.df(s, dir, "region").limit(1)
        .select(
          soundex(lit("Robert")).as("sx"),
          expr("luhn_check('79927398713')").as("luhn_ok"),
          expr("luhn_check('79927398714')").as("luhn_bad"),
          expr("to_varchar(78.12, '$99.99')").as("fmt_money"),
          expr("CAST(to_number('12,345.67', '99,999.99') AS DOUBLE)")
            .as("parsed_num"),
          conv(lit("100"), 2, 10).as("conv_b2"),
          bin(lit(13L)).as("bin13"),
          expr("char(65)").as("chr65"),
          expr("elt(2, 'scala', 'java')").as("elt2"),
          factorial(lit(5)).as("fact5"),
          round(hypot(lit(3.0), lit(4.0)), 6).as("hyp34"),
          length(lit("héllo")).as("cp_len"),
          octet_length(lit("héllo")).as("byte_len"),
          bit_count(lit(7L)).as("bits7"),
          getbit(lit(11L), lit(2)).as("bit2_of_11"),
          expr("try_element_at(array(1, 2, 3), 5)").as("elem5"))
    },

    // Time-zone & interval battery, PINNED-literal contract: the
    // UTC↔zone conversion family (from/to_utc_timestamp, 3-arg
    // convert_timezone over NTZ), timestampdiff/timestampadd (incl. a
    // leap-day carry), next_day, ISO week, and the make_interval /
    // make_dt_interval constructors. Cells sit on edges (a US DST
    // transition instant, Jan-31 + 1 month clamping to Feb-29) so a tz
    // or calendar kernel drift goes red. Timestamps are CAST to STRING
    // so the comparison is rendering-exact and tz-agnostic.
    "q295_timezone_battery" -> { (s, dir) =>
      Tables.df(s, dir, "region").limit(1)
        .select(
          expr("CAST(from_utc_timestamp(" +
            "timestamp'2024-03-10 06:30:00', 'America/New_York') " +
            "AS STRING)").as("nyc_dst_edge"),
          expr("CAST(to_utc_timestamp(" +
            "timestamp'2024-07-01 12:00:00', 'Asia/Tokyo') AS STRING)")
            .as("tokyo_to_utc"),
          expr("CAST(convert_timezone('UTC', 'Asia/Kolkata', " +
            "timestamp_ntz'2024-01-01 00:00:00') AS STRING)")
            .as("kolkata"),
          expr("timestampdiff(MONTH, timestamp'2024-01-15 00:00:00', " +
            "timestamp'2024-03-14 00:00:00')").as("tdiff_month"),
          expr("CAST(timestampadd(HOUR, 25, " +
            "timestamp'2024-02-28 00:00:00') AS STRING)")
            .as("leap_plus25h"),
          expr("CAST(next_day(date'2024-01-01', 'FR') AS STRING)")
            .as("next_fri"),
          expr("date_part('week', date'2024-01-04')").as("iso_week"),
          expr("CAST(timestamp'2024-01-01 00:00:00' + " +
            "make_dt_interval(1, 2, 3, 4.5) AS STRING)").as("plus_dti"),
          expr("CAST(date'2024-01-31' + make_interval(0, 1) AS STRING)")
            .as("plus_1mo"))
    },

    // Array-edit battery, PINNED-literal contract: the mutation/slice
    // family (array_insert 1-based, prepend/append, NULL-dropping
    // compact, slice, position, descending sort, negative-step
    // sequence, flatten), locale-stable format_number, and sentences()
    // tokenization (array<array<string>>). Array results are rendered
    // through array_join (the repo's canonical-string convention — the
    // gate comparator treats nested arrays poorly on both sides), so
    // the ARRAY kernels still run in-engine and any drift re-renders.
    "q296_array_edit" -> { (s, dir) =>
      Tables.df(s, dir, "region").limit(1)
        .select(
          expr("array_join(array_insert(array(1, 2, 4), 3, 3), ',')")
            .as("ins"),
          expr("array_join(array_prepend(array(2, 3), 1), ',')")
            .as("prep"),
          expr("array_join(array_append(array(1, 2), 3), ',')")
            .as("app"),
          expr("array_join(array_compact(array(1, NULL, 2, NULL)), ',')")
            .as("compact"),
          expr("array_join(slice(array(1, 2, 3, 4, 5), 2, 3), ',')")
            .as("sl"),
          expr("array_position(array('a', 'b', 'c'), 'b')").as("pos"),
          expr("array_join(sort_array(array(3, 1, 2), false), ',')")
            .as("desc_sorted"),
          expr("array_join(sequence(10, 2, -4), ',')").as("seq_desc"),
          expr("array_join(flatten(array(array(1, 2), array(3))), ',')")
            .as("flat"),
          expr("format_number(1234567.891, 2)").as("fmt"),
          expr("array_join(transform(" +
            "sentences('Hello world. How are you?')," +
            " ws -> array_join(ws, ' ')), '|')").as("sents"))
    },

    // Correlated LATERAL subquery: per-customer top-2 orders by price.
    // The lateral form states "top-k per row" directly; Spark plans it
    // as a decorrelated join + per-key limit rather than a global
    // window over the whole fact side. Inner lateral drops
    // order-less customers, keeping the result total-ordered and
    // engine-agnostic (ties broken by o_orderkey).
    "q294_lateral_topk" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT c_custkey, o_orderkey,
          |  CAST(o_totalprice AS DOUBLE) AS price
          |FROM customer,
          |  LATERAL (SELECT o_orderkey, o_totalprice FROM orders
          |           WHERE o_custkey = c_custkey
          |           ORDER BY o_totalprice DESC, o_orderkey LIMIT 2)
          |WHERE c_custkey < 50
          |ORDER BY c_custkey, o_orderkey""".stripMargin)
    },

    // SQL scripting (Spark 4): BEGIN/DECLARE/WHILE/END procedural
    // block — the migration surface for stored-procedure warehouse
    // jobs. The loop computes 2^10 in script-local variables; the
    // block's final SELECT (its result) scales a grouped count by it,
    // so both the control flow and the variable scoping are pinned.
    // The oracle runs the closed form.
    "q298_sql_scripting" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """BEGIN
          |  DECLARE i INT DEFAULT 0;
          |  DECLARE acc BIGINT DEFAULT 1;
          |  WHILE i < 10 DO
          |    SET acc = acc * 2;
          |    SET i = i + 1;
          |  END WHILE;
          |  SELECT l_returnflag AS flag, count(*) * acc AS scaled_n
          |  FROM lineitem GROUP BY 1 ORDER BY 1;
          |END""".stripMargin)
    },

    // Typed Dataset cogroup: per-key (customers, orders) iterator pair
    // — the arbitrary per-key merge the relational API can't express
    // directly (here it CAN be checked relationally, which is the
    // point: the oracle is the LEFT JOIN census). Keys with no orders
    // flow through with an EMPTY right iterator, pinning cogroup's
    // outer semantics. Scale: cogroup is one co-shuffle on the key —
    // same cost envelope as the equivalent join.
    "q299_typed_cogroup" -> { (s, dir) =>
      import s.implicits._
      val cs = Tables.df(s, dir, "customer")
        .select(col("c_custkey").as("_1"), col("c_mktsegment").as("_2"))
        .as[(Long, String)]
      val os = Tables.df(s, dir, "orders")
        .select(col("o_custkey").as("_1"),
          col("o_orderkey").as("_2")).as[(Long, Long)]
      cs.groupByKey(_._1).cogroup(os.groupByKey(_._1)) { (_, cit, oit) =>
        val c = cit.toSeq
        if (c.isEmpty) Iterator.empty
        else Iterator((c.head._2, oit.size.toLong))
      }.toDF("segment", "n_orders")
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("n_orders")).as("n_orders"),
          sum(when(col("n_orders") === 0, 1).otherwise(0))
            .as("n_orderless"))
        .orderBy(col("segment"))
    },

    // Exact percentiles, SQL:2016 WITHIN GROUP surface:
    // percentile_cont (linear interpolation) vs percentile_disc
    // (smallest value with cume_dist >= p) per group — the two
    // semantics analysts conflate until a report disagrees. DuckDB's
    // quantile_cont/quantile_disc implement the same definitions, so
    // the oracle is independent. (q66 covers the APPROX sketch path;
    // this is the exact sort-based one.)
    "q302_percentile_exact" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT l_returnflag AS flag,
          |  round(percentile_cont(0.5) WITHIN GROUP
          |    (ORDER BY l_extendedprice), 6) AS p50_cont,
          |  round(percentile_disc(0.5) WITHIN GROUP
          |    (ORDER BY l_extendedprice), 6) AS p50_disc,
          |  round(percentile_cont(0.9) WITHIN GROUP
          |    (ORDER BY l_extendedprice), 6) AS p90_cont
          |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    // Regex position/extraction + row-codec battery, PINNED-literal
    // contract: regexp_instr (1-based match position), regexp_substr
    // (first match or NULL), regexp_extract_all index capture, and the
    // from_csv -> to_json single-row codec chain (schema-ful CSV line
    // parse re-rendered as canonical JSON).
    "q303_regex_codec" -> { (s, dir) =>
      Tables.df(s, dir, "region").limit(1)
        .select(
          expr("regexp_instr('user=bob id=42', 'id=[0-9]+')")
            .as("instr_pos"),
          expr("regexp_substr('user=bob id=42', 'id=[0-9]+')")
            .as("substr_hit"),
          expr("regexp_substr('no digits here', '[0-9]+')")
            .as("substr_miss"),
          expr("array_join(regexp_extract_all(" +
            "'a1b22c333', '([0-9]+)', 1), ',')").as("all_nums"),
          expr("to_json(from_csv('7,wide', 'k INT, v STRING'))")
            .as("csv_json"),
          expr("to_json(named_struct('a', array(1, 2), 'm', " +
            "map('x', 1)))").as("nested_json"))
    },

    // DISTRIBUTE BY / SORT BY / CLUSTER BY: the physical-layout SQL
    // clauses (hash repartition + per-partition sort, no global order)
    // — what ETL writers use to shape files before a partitioned
    // write. The outer aggregate re-groups on the SAME expression, so
    // the result is layout-invariant and oracle-checkable while the
    // clauses still execute underneath (plan shape pinned in
    // PlanSpec-style assertions by the bucket count).
    "q300_distribute_sort_by" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT b, count(*) AS n,
          |  CAST(sum(CAST(q AS DECIMAL(18,2))) AS DOUBLE) AS sum_q
          |FROM (
          |  (SELECT l_suppkey % 16 AS b, l_quantity AS q
          |   FROM lineitem WHERE l_linenumber = 1
          |   DISTRIBUTE BY l_suppkey % 16 SORT BY l_suppkey)
          |  UNION ALL
          |  (SELECT l_suppkey % 16 AS b, l_quantity AS q
          |   FROM lineitem WHERE l_linenumber = 2
          |   CLUSTER BY b))
          |GROUP BY b ORDER BY b""".stripMargin)
    }
  )

  override def oracle: Map[String, String] = Map(
    "q289_width_bucket" ->
      """SELECT CASE WHEN p < 900.0 THEN 0
        |  WHEN p >= 105000.0 THEN 11
        |  ELSE 1 + CAST(floor((p - 900.0) * 10 /
        |    (105000.0 - 900.0)) AS BIGINT) END AS bkt,
        |  count(*) AS n,
        |  round(min(p), 2) AS p_min, round(max(p), 2) AS p_max
        |FROM (SELECT l_extendedprice AS p FROM lineitem)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q290_stack_metrics" ->
      """WITH a AS (
        |  SELECT l_returnflag AS flag,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      AS sq,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS sp,
        |    round(avg(l_discount), 6) AS ad
        |  FROM lineitem GROUP BY 1)
        |SELECT flag, metric, value FROM (
        |  SELECT flag, 'sum_qty' AS metric, sq AS value FROM a
        |  UNION ALL SELECT flag, 'sum_price', sp FROM a
        |  UNION ALL SELECT flag, 'avg_disc', ad FROM a)
        |ORDER BY flag, metric""".stripMargin,
    "q291_exec_immediate" ->
      """SELECT l_returnflag AS flag, count(*) AS n
        |FROM lineitem
        |WHERE l_quantity >= 45.0 AND l_linestatus = 'F'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q292_collation_group" ->
      """WITH u AS (
        |  SELECT n_name AS s FROM nation
        |  UNION ALL
        |  SELECT lower(n_name) FROM nation WHERE n_nationkey % 2 = 0)
        |SELECT lower(s) AS k, count(*) AS n, min(s) AS rep
        |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,
    "q293_misc_funcs" ->
      """SELECT 'R163' AS sx, true AS luhn_ok, false AS luhn_bad,
        |  '$78.12' AS fmt_money, 12345.67 AS parsed_num,
        |  '4' AS conv_b2, '1101' AS bin13, 'A' AS chr65,
        |  'java' AS elt2, CAST(120 AS BIGINT) AS fact5,
        |  5.0 AS hyp34, 5 AS cp_len, 6 AS byte_len,
        |  CAST(3 AS BIGINT) AS bits7, CAST(0 AS BIGINT) AS bit2_of_11,
        |  CAST(NULL AS INTEGER) AS elem5""".stripMargin,
    "q295_timezone_battery" ->
      """SELECT '2024-03-10 01:30:00' AS nyc_dst_edge,
        |  '2024-07-01 03:00:00' AS tokyo_to_utc,
        |  '2024-01-01 05:30:00' AS kolkata,
        |  CAST(1 AS BIGINT) AS tdiff_month,
        |  '2024-02-29 01:00:00' AS leap_plus25h,
        |  '2024-01-05' AS next_fri,
        |  1 AS iso_week,
        |  '2024-01-02 02:03:04.5' AS plus_dti,
        |  '2024-02-29' AS plus_1mo""".stripMargin,
    "q296_array_edit" ->
      """SELECT '1,2,3,4' AS ins, '1,2,3' AS prep,
        |  '1,2,3' AS app, '1,2' AS compact, '2,3,4' AS sl,
        |  CAST(2 AS BIGINT) AS pos, '3,2,1' AS desc_sorted,
        |  '10,6,2' AS seq_desc, '1,2,3' AS flat,
        |  '1,234,567.89' AS fmt,
        |  'Hello world|How are you' AS sents""".stripMargin,
    "q302_percentile_exact" ->
      """SELECT l_returnflag AS flag,
        |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_cont,
        |  round(quantile_disc(l_extendedprice, 0.5), 6) AS p50_disc,
        |  round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_cont
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q303_regex_codec" ->
      """SELECT 10 AS instr_pos, 'id=42' AS substr_hit,
        |  CAST(NULL AS VARCHAR) AS substr_miss,
        |  '1,22,333' AS all_nums,
        |  '{"k":7,"v":"wide"}' AS csv_json,
        |  '{"a":[1,2],"m":{"x":1}}' AS nested_json""".stripMargin,
    "q298_sql_scripting" ->
      """SELECT l_returnflag AS flag, count(*) * 1024 AS scaled_n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q299_typed_cogroup" ->
      """WITH per AS (
        |  SELECT c_custkey, c_mktsegment AS segment,
        |    count(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |  GROUP BY 1, 2)
        |SELECT segment, count(*) AS n_cust,
        |  CAST(sum(n_orders) AS BIGINT) AS n_orders,
        |  CAST(sum(CASE WHEN n_orders = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_orderless
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "q300_distribute_sort_by" ->
      """SELECT l_suppkey % 16 AS b, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_q
        |FROM lineitem WHERE l_linenumber IN (1, 2)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q294_lateral_topk" ->
      """SELECT c_custkey, o_orderkey,
        |  CAST(o_totalprice AS DOUBLE) AS price
        |FROM customer,
        |  LATERAL (SELECT o_orderkey, o_totalprice FROM orders
        |           WHERE o_custkey = c_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c_custkey < 50
        |ORDER BY c_custkey, o_orderkey""".stripMargin
  )
}
