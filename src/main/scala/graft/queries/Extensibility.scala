package graft.queries

import graft.{GraftExtensions, QueryModule, Tables}
import graft.functions.BigramsGenerator.bigrams
import graft.functions.KmvDistinctSketch.kmvDistinct
import graft.functions.TextOps.{tokens, uniqueTokens}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** UDF / UDAF / UDTF extension surface (SURVEY §2.6): the reference wraps
  * all three as JNI fallbacks (spark_udf_wrapper.rs, spark_udaf_wrapper.rs,
  * spark_udtf_wrapper.rs); ours are native Catalyst citizens — a
  * registered scalar UDF, a TypedImperativeAggregate sketch, and a custom
  * Generator — all usable from SQL via GraftExtensions.
  */
object Extensibility extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Scalar UDF (spark.udf.register): vowel count. The oracle expresses
    // the same semantics in pure SQL — proving the UDF surface without
    // sacrificing checkability.
    "q49_scalar_udf" -> { (s, dir) =>
      s.udf.register("vowel_count",
        (t: String) => t.count("aeiou".contains(_)).toLong)
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT doc_id, vowel_count(text) AS n_vowels
          |FROM documents ORDER BY doc_id""".stripMargin)
    },

    // Hive UDF bridge (the day-one surface for a Hive-workload
    // migration — reference analog: HiveUDFUtil's detect-and-wrap):
    // four REAL Hive UDF classes from hive-exec, spanning BOTH Hive
    // protocols — old-style `UDF` (UDFAscii, UDFBin: reflective
    // evaluate) and `GenericUDF` (GenericUDFConcatWS, GenericUDFLpad:
    // ObjectInspector negotiation) — registered by class name and run
    // distributed through Spark's adapter expressions. The oracle
    // recomputes each with DuckDB's native equivalents, so the bridged
    // evaluation path itself is hash-checked.
    "q196_hive_udf" -> { (s, dir) =>
      import graft.functions.HiveUdfBridge
      HiveUdfBridge.register(s, "hive_ascii",
        "org.apache.hadoop.hive.ql.udf.UDFAscii")
      HiveUdfBridge.register(s, "hive_bin",
        "org.apache.hadoop.hive.ql.udf.UDFBin")
      HiveUdfBridge.register(s, "hive_concat_ws",
        "org.apache.hadoop.hive.ql.udf.generic.GenericUDFConcatWS")
      HiveUdfBridge.register(s, "hive_lpad",
        "org.apache.hadoop.hive.ql.udf.generic.GenericUDFLpad")
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT doc_id,
          |  CAST(hive_ascii(substring(text, 1, 1)) AS BIGINT)
          |    AS first_ascii,
          |  hive_bin(doc_id) AS id_bin,
          |  hive_concat_ws('-', lang, source) AS lang_source,
          |  hive_lpad(CAST(doc_id AS STRING), 8, '0') AS id_pad
          |FROM documents WHERE doc_id < 500
          |ORDER BY doc_id""".stripMargin)
    },

    // Custom Generator UDTF via SQL LATERAL VIEW: bigram shingles,
    // counted — the n-gram dedup primitive.
    "q55_bigrams_udtf" -> { (s, dir) =>
      GraftExtensions.register(s)
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT w1, w2, count(*) AS n
          |FROM documents
          |LATERAL VIEW bigrams(split(text, ' ')) b AS w1, w2
          |GROUP BY w1, w2
          |ORDER BY n DESC, w1, w2 LIMIT 50""".stripMargin)
    },

    // TypedImperativeAggregate: KMV distinct-token sketch per lang,
    // checked against the exact distinct count via an error-bound
    // boolean (`approx_ok = relErr <= 0.2`, the sketch's k=256 bound) —
    // the oracle supplies the identical exact side + TRUE, making the
    // sketch hash-checkable despite being engine-specific.
    "q90_kmv_sketch" -> { (s, dir) =>
      val docs = Tables.df(s, dir, "documents")
      val exact = docs
        .select(col("lang"), explode(uniqueTokens(col("text"))).as("tok"))
        .groupBy(col("lang"))
        .agg(countDistinct(col("tok")).as("exact_distinct"))
      docs.groupBy(col("lang"))
        .agg(kmvDistinct(tokens(col("text"))).as("est_distinct"))
        .join(exact, "lang")
        .select(col("lang"), col("exact_distinct"),
          (abs(col("est_distinct") - col("exact_distinct"))
            <= col("exact_distinct") * lit(0.2)).as("approx_ok"))
        .orderBy(col("lang"))
    },

    // Sketch SET OPERATIONS: mergeable KMV sketches estimate the
    // distinct-user union and intersection of two event slices —
    // union = one sketch over both slices (sketch merge is the union
    // by construction), intersection by inclusion-exclusion over three
    // estimates. At 100 TB this is how cross-dataset overlap is
    // measured without ever shuffling raw ids into one place; the
    // exact sides + error-bound booleans keep it oracle-checkable
    // (the intersection bound is vs the UNION size — differences of
    // estimates carry the summed error).
    "q145_sketch_setops" -> { (s, dir) =>
      val ev = Tables.df(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id").cast(StringType).as("uid"),
          col("event_type"))
      def side(t: String, nm: String) = ev.filter(col("event_type") === t)
        .agg(kmvDistinct(array(col("uid"))).as(s"est_$nm"),
          countDistinct(col("uid")).as(s"exact_$nm"))
      val u = ev.agg(kmvDistinct(array(col("uid"))).as("est_u"),
        countDistinct(col("uid")).as("exact_u"))
      side("click", "a").crossJoin(broadcast(side("purchase", "b")))
        .crossJoin(broadcast(u))
        .select(col("exact_a"), col("exact_b"), col("exact_u"),
          (col("exact_a") + col("exact_b") - col("exact_u")).as("exact_i"),
          (abs(col("est_a") - col("exact_a"))
            <= col("exact_a") * 0.2).as("a_ok"),
          (abs(col("est_b") - col("exact_b"))
            <= col("exact_b") * 0.2).as("b_ok"),
          (abs(col("est_u") - col("exact_u"))
            <= col("exact_u") * 0.2).as("u_ok"),
          (abs(col("est_a") + col("est_b") - col("est_u") -
            (col("exact_a") + col("exact_b") - col("exact_u")))
            <= col("exact_u") * 0.3).as("i_ok"))
    },

    // SQL-body functions (Spark 4): CREATE FUNCTION with a scalar
    // RETURN expression AND a table function (RETURNS TABLE) — the
    // catalog-native UDF surface warehouse users migrate PL/SQL-ish
    // logic onto. Unlike q49's JVM-closure UDF, both bodies are pure
    // SQL, so Catalyst inlines them into the calling plan (the scalar
    // one stays inside whole-stage codegen; the table function is
    // just a parameterized view — full pushdown through it). The
    // per-row product is cast to DECIMAL before the sum so both
    // engines agree bit-for-bit.
    "q304_sql_udf" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION disc_price(
          |  p DOUBLE, d DOUBLE) RETURNS DOUBLE
          |RETURN p * (1.0 - d)""".stripMargin)
      s.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION status_orders(
          |  st STRING) RETURNS TABLE(okey BIGINT, price DOUBLE)
          |RETURN SELECT o_orderkey, o_totalprice FROM orders
          |       WHERE o_orderstatus = st""".stripMargin)
      s.sql(
        """SELECT l_returnflag AS flag,
          |  CAST(sum(CAST(disc_price(l_extendedprice, l_discount)
          |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
          |  (SELECT count(*) FROM status_orders('F')) AS n_f_orders
          |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
    },

    // Brickhouse collect / combine_unique UDAFs (SURVEY §2.3 row 7;
    // reference lowers both onto a collect-set kernel — see
    // functions/Brickhouse.scala). Registered as SQL UDAFs via
    // functions.udaf; first-5-tokens slice bounds each row's
    // contribution so the duplicate-preserving side stays compact.
    "q105_brickhouse" -> { (s, dir) =>
      import graft.functions.Brickhouse
      s.udf.register("combine_unique", udaf(Brickhouse.CombineUnique))
      s.udf.register("bh_collect", udaf(Brickhouse.BhCollect))
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT lang,
          | array_join(combine_unique(slice(split(text, ' '), 1, 5)), ' ')
          |   AS uniq_toks,
          | array_join(bh_collect(slice(split(text, ' '), 1, 5)), ' ')
          |   AS all_toks
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)
    }
  )

  override def oracle: Map[String, String] = Map(
    "q304_sql_udf" ->
      """SELECT l_returnflag AS flag,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  (SELECT count(*) FROM orders WHERE o_orderstatus = 'F')
        |    AS n_f_orders
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q196_hive_udf" ->
      """SELECT doc_id,
        |  CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_ascii,
        |  bin(doc_id) AS id_bin,
        |  concat_ws('-', lang, source) AS lang_source,
        |  lpad(CAST(doc_id AS VARCHAR), 8, '0') AS id_pad
        |FROM documents WHERE doc_id < 500
        |ORDER BY doc_id""".stripMargin,
    "q49_scalar_udf" ->
      """SELECT doc_id,
        | CAST(length(text) - length(translate(text, 'aeiou', ''))
        |   AS BIGINT) AS n_vowels
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q55_bigrams_udtf" ->
      """SELECT parts[i] AS w1, parts[i+1] AS w2, count(*) AS n
        |FROM (SELECT string_split(text, ' ') AS parts FROM documents),
        |     unnest(generate_series(1, len(parts) - 1)) AS t(i)
        |GROUP BY w1, w2 ORDER BY n DESC, w1, w2 LIMIT 50""".stripMargin,
    "q90_kmv_sketch" ->
      """SELECT lang, count(DISTINCT tok) AS exact_distinct,
        | TRUE AS approx_ok
        |FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |      FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q145_sketch_setops" ->
      """SELECT
        | (SELECT count(DISTINCT user_id) FROM events
        |  WHERE event_type = 'click') AS exact_a,
        | (SELECT count(DISTINCT user_id) FROM events
        |  WHERE event_type = 'purchase') AS exact_b,
        | (SELECT count(DISTINCT user_id) FROM events
        |  WHERE event_type IN ('click', 'purchase')) AS exact_u,
        | (SELECT count(DISTINCT user_id) FROM events
        |  WHERE event_type = 'click')
        |  + (SELECT count(DISTINCT user_id) FROM events
        |     WHERE event_type = 'purchase')
        |  - (SELECT count(DISTINCT user_id) FROM events
        |     WHERE event_type IN ('click', 'purchase')) AS exact_i,
        | TRUE AS a_ok, TRUE AS b_ok, TRUE AS u_ok, TRUE AS i_ok""".stripMargin,
    "q105_brickhouse" ->
      """SELECT lang,
        | array_to_string(list_sort(list(DISTINCT tok)), ' ') AS uniq_toks,
        | array_to_string(list_sort(list(tok)), ' ') AS all_toks
        |FROM (SELECT lang, unnest(string_split(text, ' ')[1:5]) AS tok
        |      FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin
  )
}
