package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar expression/function coverage (SURVEY §2.5): string, math,
  * date/time, hash/crypto, JSON, conditional, array/map/struct families.
  * Reference registry: NativeConverters.scala:399-1240 + ScalarFunction
  * enum (auron.proto:218-298), kernels in datafusion-ext-functions/.
  *
  * All functions here are Spark built-ins (codegen'd) — no UDFs. Oracle
  * notes: transcendentals are rounded to 6dp on both sides (libm vs
  * java.lang.Math differ at ulp level); Spark-specific hashes (murmur3
  * seed 42, xxhash64 seed 42) have no DuckDB equivalent and are covered
  * by the rows-only q44.
  */
object Functions extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // String family over documents.
    "q40_string_funcs" -> { (s, dir) =>
      Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).cast(LongType).as("len"),
          upper(substring(col("text"), 1, 10)).as("head_up"),
          ascii(substring(col("text"), 1, 1)).as("a1"),
          concat_ws("|", col("lang"), col("source")).as("cws"),
          regexp_replace(substring(col("text"), 1, 20), " ", "_").as("rep"),
          reverse(col("lang")).as("rev"),
          lpad(col("doc_id").cast(StringType), 6, "0").as("pad"),
          repeat(col("lang"), 2).as("rep2"),
          trim(concat(lit(" "), col("lang"), lit(" "))).as("tr"),
          substring_index(col("text"), " ", 2).as("first2"),
          instr(col("text"), "data").cast(LongType).as("pos_data"),
          translate(col("lang"), "aeiou", "AEIOU").as("tl"),
          col("text").startsWith("the").as("sw"),
          col("text").endsWith("scan").as("ew"),
          col("text").contains("vector").as("has_vec"),
          levenshtein(col("lang"), lit("en")).cast(LongType).as("lev"),
          col("lang").like("e%").as("lk"),
          col("text").rlike("ha[s]h").as("rl"))
        .orderBy(col("doc_id"))
    },

    // Math family over a bounded lineitem slice.
    "q41_math_funcs" -> { (s, dir) =>
      val tx = round(col("l_quantity") * col("l_discount"), 3)
      Tables.df(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 200)
        .select(col("l_orderkey"), col("l_linenumber"),
          sqrt(col("l_quantity")).as("sq"),
          abs(col("l_quantity") - 25.0).as("ab"),
          floor(col("l_extendedprice") / 100.0).cast(LongType).as("fl"),
          ceil(col("l_extendedprice") / 100.0).cast(LongType).as("ce"),
          // price(2dp) * discount(2dp) is an exact 4dp value: rounding to 4
          // recovers it bit-identically in any engine; rounding to 2 would
          // sit exactly on .005 half-way boundaries where engines disagree.
          round(col("l_extendedprice") * col("l_discount"), 4).as("rnd"),
          signum(col("l_discount") - 0.05).as("sg"),
          round(pow(col("l_quantity"), 2.0), 6).as("pw"),
          greatest(col("l_quantity"), lit(25.0)).as("gr"),
          least(col("l_quantity"), lit(25.0)).as("le"),
          round(exp(col("l_discount")), 6).as("ex"),
          round(log(col("l_quantity")), 6).as("ln_q"),
          round(log10(col("l_extendedprice")), 6).as("l10"),
          round(log2(col("l_quantity")), 6).as("l2"),
          round(sin(col("l_quantity")), 6).as("sn"),
          round(cos(col("l_quantity")), 6).as("cs"),
          factorial(col("l_linenumber")).as("fact"),
          tx.as("rnd3"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // Date/time family over orders + events (µs-rebuilt ts).
    "q42_date_funcs" -> { (s, dir) =>
      Tables.df(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast(LongType).as("y"),
          month(col("o_orderdate")).cast(LongType).as("m"),
          dayofmonth(col("o_orderdate")).cast(LongType).as("d"),
          quarter(col("o_orderdate")).cast(LongType).as("q"),
          dayofweek(col("o_orderdate")).cast(LongType).as("dow"),
          weekofyear(col("o_orderdate")).cast(LongType).as("woy"),
          date_trunc("month", col("o_orderdate")).cast(DateType).as("mstart"),
          date_add(col("o_orderdate").cast(DateType), 30).as("plus30"),
          datediff(col("o_orderdate").cast(DateType),
            lit("2000-01-01").cast(DateType)).cast(LongType).as("dd"),
          last_day(col("o_orderdate").cast(DateType)).as("eom"),
          make_date(year(col("o_orderdate")), month(col("o_orderdate")),
            lit(1)).as("md"),
          months_between(col("o_orderdate").cast(DateType),
            lit("2000-01-15").cast(DateType)).as("mb"),
          dayofyear(col("o_orderdate")).cast(LongType).as("doy"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("fmt"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy(col("o_orderkey"))
    },

    // Hash/crypto with DuckDB equivalents (md5 / sha2-256).
    "q43_hash_funcs" -> { (s, dir) =>
      Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          md5(col("text").cast(BinaryType)).as("h_md5"),
          sha2(col("text").cast(BinaryType), 256).as("h_sha256"))
        .orderBy(col("doc_id"))
    },

    // Spark-specific hashes (murmur3 seed 42 / xxhash64 seed 42L — the
    // exact kernels the reference re-implements, shuffle/mod.rs:172,
    // spark_hash.rs). DuckDB cannot COMPUTE them, but it can check them:
    // the query hashes a fixed input set whose expected values are
    // pinned literals on BOTH sides (SparkHashPinSpec anchors 'abc'),
    // and matches_pinned re-derives the equality in-engine — so a Spark
    // kernel change flips the boolean and the oracle hash goes red
    // instead of silently drifting.
    "q44_spark_hashes" -> { (s, dir) =>
      import s.implicits._
      val pinned = Seq(
        ("", 142593372L, -7444071767201028348L, 0L),
        ("abc", 1322437556L, 1423657621850124518L, 891568578L),
        ("graft", -1930494102L, -4815631219266125053L, 31255620L),
        ("spark sql", 40074111L, -3741135727865485229L, 2182859546L),
        ("minhash lsh", -1493102839L, -7783688322173173549L, 3844865734L))
      pinned.toDF("input", "m3_exp", "xx_exp", "crc_exp")
        .select(col("input"),
          hash(col("input")).cast(LongType).as("murmur3"),
          xxhash64(col("input")).as("xx64"),
          crc32(col("input").cast(BinaryType)).as("crc"),
          (hash(col("input")).cast(LongType) === col("m3_exp") &&
            xxhash64(col("input")) === col("xx_exp") &&
            crc32(col("input").cast(BinaryType)) === col("crc_exp"))
            .as("matches_pinned"))
        .orderBy(col("input"))
    },

    // JSON family over events.props: get_json_object / json_tuple /
    // from_json all extracting the same field (must agree).
    "q45_json_funcs" -> { (s, dir) =>
      Tables.df(s, dir, "events")
        // json_tuple is a Generator — must be a top-level select item,
        // so extract first, then cast in a second projection.
        .select(col("event_id"), col("props"),
          json_tuple(col("props"), "k").as("k2raw"))
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k1"),
          col("k2raw").cast(LongType).as("k2"),
          from_json(col("props"), StructType(Seq(StructField("k", LongType))))
            .getField("k").as("k3"))
        .orderBy(col("event_id"))
    },

    // VARIANT type (Spark 4): parse-once binary-encoded semi-structured
    // values. At scale this beats re-parsing JSON strings per extraction —
    // parse_json runs once, each variant_get is a cheap binary probe, and
    // typed extraction prunes like any other column.
    "q109_variant" -> { (s, dir) =>
      Tables.df(s, dir, "events")
        .select(col("event_id"),
          parse_json(col("props")).as("v"),
          try_parse_json(lit("not json")).as("bad"))
        .select(col("event_id"),
          variant_get(col("v"), "$.k", "bigint").as("k_long"),
          variant_get(col("v"), "$.k", "string").as("k_str"),
          variant_get(col("v"), "$.missing", "bigint").as("k_missing"),
          is_variant_null(col("v")).as("v_isnull"),
          schema_of_variant(col("v")).as("v_schema"),
          col("bad").isNull.as("bad_isnull"))
        .orderBy(col("event_id"))
    },

    // Conditional family: CASE WHEN, coalesce, nullif, if.
    "q46_conditional" -> { (s, dir) =>
      Tables.df(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_totalprice") < 100000.0, "small")
            .when(col("o_totalprice") < 300000.0, "medium")
            .otherwise("large").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open"))
            .as("status2"),
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
            .as("is_urgent"),
          greatest(col("o_totalprice"), lit(50000.0)).as("floor_price"))
        .orderBy(col("o_orderkey"))
    },

    // Array family via split (ArrayType end-to-end, canonicalized output).
    "q47_array_funcs" -> { (s, dir) =>
      val parts = split(col("text"), " ")
      Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          size(parts).cast(LongType).as("n_words"),
          array_contains(parts, "data").as("has_data"),
          array_sort(parts).getItem(0).as("first_sorted"),
          size(array_distinct(parts)).cast(LongType).as("n_uniq"),
          array_join(slice(parts, 2, 3), " ").as("mid3"),
          element_at(parts, 3).as("third"),
          array_max(parts).as("max_word"),
          array_min(parts).as("min_word"))
        .orderBy(col("doc_id"))
    },

    // Map + struct family: literal map lookup, named_struct field access.
    "q48_struct_map" -> { (s, dir) =>
      val langRank = map(
        lit("en"), lit(1L), lit("de"), lit(2L), lit("es"), lit(3L),
        lit("fr"), lit(4L), lit("zh"), lit(5L))
      Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          element_at(langRank, col("lang")).as("lang_rank"),
          struct(col("n_chars").as("a"), col("source").as("b"))
            .getField("b").as("src"),
          map_keys(map(col("lang"), col("n_chars"))).getItem(0).as("mk"))
        .orderBy(col("doc_id"))
    }
  )

  override def oracle: Map[String, String] = Map(
    "q40_string_funcs" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
        | upper(substring(text, 1, 10)) AS head_up,
        | CAST(ascii(substring(text, 1, 1)) AS INT) AS a1,
        | concat_ws('|', lang, source) AS cws,
        | regexp_replace(substring(text, 1, 20), ' ', '_', 'g') AS rep,
        | reverse(lang) AS rev,
        | lpad(CAST(doc_id AS VARCHAR), 6, '0') AS pad,
        | repeat(lang, 2) AS rep2,
        | trim(concat(' ', lang, ' ')) AS tr,
        | array_to_string(string_split(text, ' ')[1:2], ' ') AS first2,
        | CAST(strpos(text, 'data') AS BIGINT) AS pos_data,
        | translate(lang, 'aeiou', 'AEIOU') AS tl,
        | starts_with(text, 'the') AS sw,
        | ends_with(text, 'scan') AS ew,
        | contains(text, 'vector') AS has_vec,
        | CAST(levenshtein(lang, 'en') AS BIGINT) AS lev,
        | lang LIKE 'e%' AS lk,
        | regexp_matches(text, 'ha[s]h') AS rl
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q41_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        | sqrt(l_quantity) AS sq, abs(l_quantity - 25.0) AS ab,
        | CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS fl,
        | CAST(ceil(l_extendedprice / 100.0) AS BIGINT) AS ce,
        | round(l_extendedprice * l_discount, 4) AS rnd,
        | CAST(sign(l_discount - 0.05) AS DOUBLE) AS sg,
        | round(pow(l_quantity, 2.0), 6) AS pw,
        | greatest(l_quantity, 25.0) AS gr, least(l_quantity, 25.0) AS le,
        | round(exp(l_discount), 6) AS ex,
        | round(ln(l_quantity), 6) AS ln_q,
        | round(log10(l_extendedprice), 6) AS l10,
        | round(log2(l_quantity), 6) AS l2,
        | round(sin(l_quantity), 6) AS sn, round(cos(l_quantity), 6) AS cs,
        | CAST(factorial(l_linenumber) AS BIGINT) AS fact,
        | round(l_quantity * l_discount, 3) AS rnd3
        |FROM lineitem WHERE l_orderkey <= 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q42_date_funcs" ->
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS BIGINT) AS y,
        | CAST(month(o_orderdate) AS BIGINT) AS m,
        | CAST(day(o_orderdate) AS BIGINT) AS d,
        | CAST(quarter(o_orderdate) AS BIGINT) AS q,
        | CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        | CAST(weekofyear(o_orderdate) AS BIGINT) AS woy,
        | CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart,
        | CAST(o_orderdate AS DATE) + 30 AS plus30,
        | CAST(date_diff('day', DATE '2000-01-01', CAST(o_orderdate AS DATE))
        |      AS BIGINT) AS dd,
        | last_day(CAST(o_orderdate AS DATE)) AS eom,
        | make_date(year(o_orderdate), month(o_orderdate), 1) AS md,
        | round((year(o_orderdate) - 2000) * 12 + (month(o_orderdate) - 1)
        |   + CASE WHEN day(o_orderdate) = 15 THEN 0.0
        |          ELSE (day(o_orderdate) - 15) / 31.0 END, 8) AS mb,
        | CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        | strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS fmt,
        | CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q43_hash_funcs" ->
      """SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q44_spark_hashes" ->
      """SELECT * FROM (VALUES
        |  ('', CAST(142593372 AS BIGINT),
        |   CAST(-7444071767201028348 AS BIGINT), CAST(0 AS BIGINT), TRUE),
        |  ('abc', CAST(1322437556 AS BIGINT),
        |   CAST(1423657621850124518 AS BIGINT),
        |   CAST(891568578 AS BIGINT), TRUE),
        |  ('graft', CAST(-1930494102 AS BIGINT),
        |   CAST(-4815631219266125053 AS BIGINT),
        |   CAST(31255620 AS BIGINT), TRUE),
        |  ('spark sql', CAST(40074111 AS BIGINT),
        |   CAST(-3741135727865485229 AS BIGINT),
        |   CAST(2182859546 AS BIGINT), TRUE),
        |  ('minhash lsh', CAST(-1493102839 AS BIGINT),
        |   CAST(-7783688322173173549 AS BIGINT),
        |   CAST(3844865734 AS BIGINT), TRUE)
        |) AS t(input, murmur3, xx64, crc, matches_pinned)
        |ORDER BY input""".stripMargin,
    "q45_json_funcs" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k1,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k2,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k3
        |FROM events ORDER BY event_id""".stripMargin,
    "q109_variant" ->
      """SELECT event_id,
        | CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
        | json_extract_string(props, '$.k') AS k_str,
        | CAST(NULL AS BIGINT) AS k_missing,
        | FALSE AS v_isnull,
        | 'OBJECT<k: BIGINT>' AS v_schema,
        | TRUE AS bad_isnull
        |FROM events ORDER BY event_id""".stripMargin,
    "q46_conditional" ->
      """SELECT o_orderkey,
        | CASE WHEN o_totalprice < 100000.0 THEN 'small'
        |      WHEN o_totalprice < 300000.0 THEN 'medium'
        |      ELSE 'large' END AS bucket,
        | coalesce(nullif(o_orderstatus, 'O'), 'open') AS status2,
        | CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
        |      AS BIGINT) AS is_urgent,
        | greatest(o_totalprice, 50000.0) AS floor_price
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q47_array_funcs" ->
      """SELECT doc_id,
        | CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        | list_contains(string_split(text, ' '), 'data') AS has_data,
        | list_sort(string_split(text, ' '))[1] AS first_sorted,
        | CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
        | array_to_string(string_split(text, ' ')[2:4], ' ') AS mid3,
        | string_split(text, ' ')[3] AS third,
        | list_max(string_split(text, ' ')) AS max_word,
        | list_min(string_split(text, ' ')) AS min_word
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q48_struct_map" ->
      """SELECT doc_id,
        | CAST(CASE lang WHEN 'en' THEN 1 WHEN 'de' THEN 2 WHEN 'es' THEN 3
        |           WHEN 'fr' THEN 4 WHEN 'zh' THEN 5 END AS BIGINT)
        |   AS lang_rank,
        | source AS src, lang AS mk
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
