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
