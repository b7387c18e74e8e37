package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Map-type operations, array set-operations, and the pivot API
  * (SURVEY §2.5 array/map/struct rows: map_from_arrays, map_concat,
  * str_to_map, flatten + friends; pivot lowers to conditional aggregation
  * over the Expand-free path).
  *
  * Map iteration order is not defined cross-engine, so all map outputs
  * are canonicalized (sorted keys joined, or fixed-key element_at).
  */
object Collections extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Nested-data reshaping — the denormalize/renormalize round trip
    // every event-sourced pipeline runs: per-user event TIMELINE built
    // as a deterministically-ordered array<struct> (sort_array over
    // collect_list — collect order is partition-dependent, the sort
    // makes it canonical), then per-user metrics derived FROM the
    // nested structure with higher-order functions (element access,
    // filter, ordered fold). The oracle computes the same metrics
    // relationally — proving the nested round trip loses nothing. One
    // user-grain shuffle; the array stays executor-side.
    "q253_nested_timeline" -> { (s, dir) =>
      val tl = Tables.df(s, dir, "events")
        .select(col("user_id"),
          struct(unix_micros(col("ts")).as("t"),
            col("event_id").as("eid"),
            col("event_type").as("et"),
            col("value").as("v")).as("e"))
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(col("e"))).as("timeline"))
      tl.select(col("user_id"),
          size(col("timeline")).cast(LongType).as("n_events"),
          col("timeline").getItem(0).getField("et").as("first_type"),
          element_at(col("timeline"), -1).getField("et").as("last_type"),
          size(filter(col("timeline"),
            e => e.getField("et") === "purchase")).cast(LongType)
            .as("n_purchases"),
          round(aggregate(col("timeline"), lit(0.0),
            (acc, e) => acc + e.getField("v")), 4).as("total_value"))
        .orderBy(col("user_id"))
    },

    // Map higher-order functions — transform_values / transform_keys /
    // map_filter / map_zip_with (the map side of q65's array HOFs),
    // canonicalized through fixed-key element_at + size since map
    // iteration order is undefined cross-engine; the oracle derives
    // the same scalars arithmetically.
    "q280_map_hof" -> { (s, dir) =>
      val m = map(lit("q"), col("l_quantity"),
        lit("p"), col("l_extendedprice"))
      val doubled = transform_values(m, (_, v) => v * 2)
      val kept = map_filter(m, (_, v) => v >= 30)
      val zipped = map_zip_with(m, doubled, (_, a, b) => b - a)
      val renamed = transform_keys(m, (k, _) => upper(k))
      Tables.df(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          element_at(doubled, "q").as("q2"),
          element_at(doubled, "p").as("p2"),
          size(kept).cast(LongType).as("n_kept"),
          element_at(zipped, "q").as("zq"),
          element_at(renamed, "Q").as("uq"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    "q68_map_funcs" -> { (s, dir) =>
      val m1 = expr("str_to_map('a:1,b:2', ',', ':')")
      val m2 = map(lit("c"), col("lang"))
      val m3 = map_concat(m1, m2)
      Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          element_at(m3, "a").as("va"),
          element_at(m3, "b").as("vb"),
          element_at(m3, "c").as("vc"),
          size(m3).cast(LongType).as("msize"),
          array_join(array_sort(map_keys(m3)), ",").as("mkeys"),
          element_at(map_from_arrays(
            array(lit("x"), lit("y")),
            array(col("n_chars"), col("doc_id"))), "y").as("from_arr"))
        .orderBy(col("doc_id"))
    },

    "q69_array_setops" -> { (s, dir) =>
      import graft.functions.TextOps.uniqueTokens
      val tk = uniqueTokens(col("text"))
      val ref = array(lit("the"), lit("data"), lit("spark"), lit("row"))
      Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          array_join(array_sort(array_intersect(tk, ref)), ",").as("inter"),
          size(array_except(tk, ref)).cast(LongType).as("n_except"),
          arrays_overlap(tk, ref).as("overlaps"),
          array_position(ref, "data").cast(LongType).as("pos_data"),
          array_join(array_remove(ref, "the"), ",").as("removed"),
          size(flatten(array(tk, ref))).cast(LongType).as("n_flat"),
          array_join(array_repeat(col("lang"), 3), "").as("rep3"))
        .orderBy(col("doc_id"))
    },

    // Pivot API — lowers to grouped conditional aggregation.
    "q91_pivot" -> { (s, dir) =>
      Tables.df(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("o_orderpriority"))
    },

    // Unpivot (melt) — the inverse reshape: wide pivot output back to
    // long (priority, status, n) rows. Expand-based, map-only: no
    // shuffle beyond the pivot's own aggregation, so it scales as a
    // projection. Zero-filled cells are dropped to keep parity with the
    // long-form oracle aggregate.
    "q110_unpivot" -> { (s, dir) =>
      val wide = Tables.df(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
      wide.unpivot(
          Array(col("o_orderpriority")),
          Array(col("F"), col("O"), col("P")),
          "status", "n")
        .filter(col("n") > 0L)
        .orderBy(col("o_orderpriority"), col("status"))
    }
  )

  override def oracle: Map[String, String] = Map(
    "q280_map_hof" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_quantity * 2 AS q2,
        |  l_extendedprice * 2 AS p2,
        |  CAST(CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END +
        |       CASE WHEN l_extendedprice >= 30 THEN 1 ELSE 0 END
        |    AS BIGINT) AS n_kept,
        |  l_quantity AS zq,
        |  l_quantity AS uq
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q253_nested_timeline" ->
      """WITH r AS (
        |  SELECT user_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
        |      AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events)
        |SELECT user_id, CAST(any_value(n) AS BIGINT) AS n_events,
        |  min(CASE WHEN rn = 1 THEN event_type END) AS first_type,
        |  min(CASE WHEN rn = n THEN event_type END) AS last_type,
        |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
        |    AS n_purchases,
        |  round(sum(value), 4) AS total_value
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q68_map_funcs" ->
      """SELECT doc_id, '1' AS va, '2' AS vb, lang AS vc,
        | CAST(3 AS BIGINT) AS msize, 'a,b,c' AS mkeys,
        | doc_id AS from_arr
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q69_array_setops" ->
      """SELECT doc_id,
        | coalesce(array_to_string(list_sort(list_intersect(
        |   list_distinct(string_split(text, ' ')),
        |   ['the','data','spark','row'])), ','), '') AS inter,
        | CAST(len(list_filter(list_distinct(string_split(text, ' ')),
        |   t -> NOT list_contains(['the','data','spark','row'], t)))
        |   AS BIGINT) AS n_except,
        | len(list_intersect(list_distinct(string_split(text, ' ')),
        |   ['the','data','spark','row'])) > 0 AS overlaps,
        | CAST(list_position(['the','data','spark','row'], 'data')
        |   AS BIGINT) AS pos_data,
        | array_to_string(list_filter(['the','data','spark','row'],
        |   t -> t != 'the'), ',') AS removed,
        | CAST(len(list_distinct(string_split(text, ' '))) + 4 AS BIGINT)
        |   AS n_flat,
        | repeat(lang, 3) AS rep3
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q91_pivot" ->
      """SELECT o_orderpriority,
        | CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS "F",
        | CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS "O",
        | CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q110_unpivot" ->
      """SELECT o_orderpriority, o_orderstatus AS status,
        | CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderpriority, o_orderstatus
        |ORDER BY o_orderpriority, status""".stripMargin
  )
}
