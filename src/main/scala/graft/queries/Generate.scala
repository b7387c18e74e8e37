package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generator / lateral-view coverage (SURVEY §2.1 row 14, §2.6): explode,
  * posexplode, explode_outer, inline, sequence-explode. Reference:
  * generate_exec.rs + generate/{explode,json_tuple,spark_udtf_wrapper}.rs.
  *
  * Scale: generators multiply rows partition-locally (no shuffle); the
  * word-count query then does the classic map-side partial agg before the
  * shuffled final agg — the canonical 100 TB token-counting shape.
  */
object Generate extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // explode(split) → word count → top-50. THE token-frequency pipeline.
    "q50_explode_wordcount" -> { (s, dir) =>
      Tables.df(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(50)
    },

    // posexplode: position-aware flattening.
    "q51_posexplode" -> { (s, dir) =>
      Tables.df(s, dir, "documents")
        .filter(col("doc_id") <= 5)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .select(col("doc_id"), col("pos").cast(LongType).as("pos"),
          col("word"))
        .orderBy(col("doc_id"), col("pos"))
    },

    // explode_outer: rows with empty arrays survive with NULL.
    "q52_explode_outer" -> { (s, dir) =>
      val arr = when(col("lang") === "en", array())
        .otherwise(array(col("lang"), col("source")))
      Tables.df(s, dir, "documents")
        .select(col("doc_id"), explode_outer(arr).as("tag"))
        .orderBy(col("doc_id"), col("tag"))
    },

    // inline: explode an array of structs into columns.
    "q53_inline" -> { (s, dir) =>
      val pairs = array(
        struct(lit("status").as("k"), col("o_orderstatus").as("v")),
        struct(lit("prio").as("k"), col("o_orderpriority").as("v")))
      Tables.df(s, dir, "orders")
        .filter(col("o_orderkey") <= 100)
        .select(col("o_orderkey"), inline(pairs))
        .orderBy(col("o_orderkey"), col("k"))
    },

    // sequence + explode: row-generating from a numeric range.
    "q54_sequence" -> { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 50)
        .select(col("l_orderkey"), col("l_linenumber"),
          explode(sequence(lit(1), col("l_linenumber"))).as("i"))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("i").cast(LongType).as("i"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("i"))
    }
  )

  override def oracle: Map[String, String] = Map(
    "q50_explode_wordcount" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents
        |) GROUP BY word ORDER BY n DESC, word LIMIT 50""".stripMargin,
    "q51_posexplode" ->
      """SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, parts[i] AS word
        |FROM (SELECT doc_id, string_split(text, ' ') AS parts
        |      FROM documents WHERE doc_id <= 5),
        |     unnest(generate_series(1, len(parts))) AS t(i)
        |ORDER BY doc_id, pos""".stripMargin,
    "q52_explode_outer" ->
      """SELECT doc_id, t.tag FROM (
        |  SELECT doc_id,
        |    CASE WHEN lang = 'en' THEN [] ELSE [lang, source] END AS arr
        |  FROM documents) d
        |LEFT JOIN LATERAL (SELECT unnest(arr) AS tag) t ON true
        |ORDER BY doc_id, tag""".stripMargin,
    "q53_inline" ->
      """SELECT o_orderkey, u.k, u.v FROM (
        |  SELECT o_orderkey,
        |    unnest([struct_pack(k := 'status', v := o_orderstatus),
        |            struct_pack(k := 'prio', v := o_orderpriority)]) AS u
        |  FROM orders WHERE o_orderkey <= 100)
        |ORDER BY o_orderkey, u.k""".stripMargin,
    "q54_sequence" ->
      """SELECT l_orderkey, l_linenumber, CAST(i AS BIGINT) AS i
        |FROM (SELECT l_orderkey, l_linenumber FROM lineitem
        |      WHERE l_orderkey <= 50),
        |     unnest(generate_series(1, l_linenumber)) AS t(i)
        |ORDER BY l_orderkey, l_linenumber, i""".stripMargin
  )
}
