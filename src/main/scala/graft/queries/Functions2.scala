package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second scalar-function sweep — the remaining SURVEY §2.5 rows:
  * bit_length, chr, space, find_in_set, rpad, left/right, regexp_extract,
  * base64/unbase64, initcap (string); bround (half-even), hex, pmod,
  * inverse trig, expm1, acosh, isnan (math); to_timestamp parse (date).
  */
object Functions2 extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Null-KEY join battery — q276's join sibling: null keys injected
    // on BOTH sides, counted through inner (null never matches), left
    // (null-keyed probe rows survive unmatched), and null-safe <=>
    // (null matches null, cross of the two null sets). One row of
    // counts; q18 pins <=> on clean keys, this pins the dirty-key
    // contract.
    "q278_null_key_joins" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
        .select(nullif(col("l_suppkey"), lit(42)).as("sk"))
      val sup = Tables.df(s, dir, "supplier")
        .select(nullif(col("s_suppkey"), lit(57)).as("pk"))
      val inner = li.join(sup, col("sk") === col("pk"))
        .agg(count(lit(1)).as("n_inner"))
      val leftUn = li.join(sup, col("sk") === col("pk"), "left")
        .filter(col("pk").isNull)
        .agg(count(lit(1)).as("n_left_unmatched"))
      val nsafe = li.join(sup, col("sk") <=> col("pk"))
        .agg(count(lit(1)).as("n_nullsafe"))
      inner.crossJoin(leftUn).crossJoin(nsafe)
    },

    // Signed modulo / integral-division semantics — the cells that
    // silently differ across engines: % keeps the DIVIDEND sign (both
    // engines C-style), pmod is always non-negative (DuckDB mirrors it
    // as ((x%7)+7)%7), and Spark's `div` TRUNCATES toward zero where
    // DuckDB's // floors — the oracle reconstructs truncation as
    // (x - x%5)/5, pinning Spark's semantics rather than assuming the
    // operators agree.
    "q279_signed_mod_div" -> { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .select((col("l_quantity").cast(LongType) - 26).as("x"))
        .distinct()
        .select(col("x"),
          (col("x") % 7).as("mod7"),
          pmod(col("x"), lit(7L)).as("pmod7"),
          expr("x div 5").as("tdiv5"))
        .orderBy(col("x"))
    },

    // Null-semantics battery — the fixtures carry no NULLs, so inject
    // them (nullif on value patterns) and pin the null-sensitive
    // aggregate contract in one grouped pass: count(*) vs count(col),
    // null-skipping sum/avg/min, a NULL GROUP KEY row (grouping treats
    // null as a real group), coalesce fallback, and count_if over a
    // null predicate. Oracle applies the identical injection.
    "q276_null_matrix" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
        .select(nullif(col("l_returnflag"), lit("R")).as("flag"),
          nullif(col("l_quantity"), lit(25.0)).as("qty"),
          when(col("l_linenumber") === 1, col("l_discount")).as("disc"))
      li.groupBy(col("flag"))
        .agg(count(lit(1)).as("n_star"),
          count(col("qty")).as("n_qty"),
          sum(col("qty").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("sum_qty"),
          round(avg(col("qty")), 4).as("avg_qty"),
          count(col("disc")).as("n_disc"),
          coalesce(min(col("disc")), lit(-1.0)).as("min_disc_or"))
        .orderBy(col("flag").asc_nulls_first)
    },

    // Unicode string semantics — ASCII fixtures never test these:
    // accented/CJK/emoji/combining-mark literals through
    // length (CODE POINTS, incl. a surrogate-pair emoji = 1),
    // upper (incl. the German ß -> SS expansion), substring (code-point
    // addressed), instr and concat. Engines that count UTF-16 units or
    // bytes go red here.
    "q277_unicode" -> { (s, dir) =>
      val rows = Seq(
        (1L, "hello"), (2L, "caf\u00e9"), (3L, "stra\u00dfe"),
        (4L, "\u65e5\u672c\u8a9e\u30c6\u30b9\u30c8"), // CJK, 6 cps
        (5L, "a\u0301b\u0301"), // decomposed combining acutes: 4 cps
        (6L, "\ud83d\ude00x\ud83d\ude01") // emoji x emoji: 3 cps
      )
      val df = s.createDataFrame(rows).toDF("id", "t")
      df.select(col("id"), col("t"),
          length(col("t")).cast(LongType).as("n_cp"),
          // ss-sharp uppercase is a GENUINE engine divergence (Java
          // expands to SS, ICU-backed engines emit capital sharp S) --
          // excluded by id on both sides, documented not papered over
          when(col("id") =!= 3, upper(col("t"))).as("up"),
          substring(col("t"), 2, 2).as("sub23"),
          instr(col("t"), "x").cast(LongType).as("pos_x"),
          concat(col("t"), lit("!")).as("bang"))
        .orderBy(col("id"))
    },

    // JSON schema inference + typed parse — schema_of_json pins the
    // inferred DDL (a Spark-version contract) and from_json applies an
    // explicit schema to the event payload; q45's path-extraction
    // family gets its typed-parse sibling.
    "q265_json_schema" -> { (s, dir) =>
      Tables.df(s, dir, "events")
        .filter(col("event_id") < 1000)
        .select(col("event_id"),
          expr("from_json(props, 'k INT').k").cast(LongType).as("k"),
          expr("schema_of_json('{\"k\": 42}')").as("inferred"))
        .orderBy(col("event_id"))
    },

    // One-pass numeric profile — the pairwise correlation matrix of
    // the fact's numeric columns (the ANALYZE-style profiling report):
    // six corr aggregates in a single scan, no self-joins.
    "q266_numeric_profile" -> { (s, dir) =>
      val li = Tables.df(s, dir, "lineitem")
      li.agg(count(lit(1)).as("n"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4)
          .as("c_qty_price"),
        round(corr(col("l_quantity"), col("l_discount")), 4)
          .as("c_qty_disc"),
        round(corr(col("l_quantity"), col("l_tax")), 4).as("c_qty_tax"),
        round(corr(col("l_extendedprice"), col("l_discount")), 4)
          .as("c_price_disc"),
        round(corr(col("l_extendedprice"), col("l_tax")), 4)
          .as("c_price_tax"),
        round(corr(col("l_discount"), col("l_tax")), 4).as("c_disc_tax"))
    },

    // XPath extraction over an XML payload (the Hive-workload xpath_*
    // family; the XML SOURCE roundtrip is q107): documents rendered as
    // XML, fields extracted back by path — string, numeric, and a
    // node-list count. Generation-rule oracle (DuckDB has no XPath).
    "q263_xpath" -> { (s, dir) =>
      val xml = concat(lit("<doc id=\""), col("doc_id"),
        lit("\"><lang>"), col("lang"), lit("</lang><src>"),
        col("source"), lit("</src><m><n>"), col("n_chars"),
        lit("</n><n>7</n></m></doc>"))
      Tables.df(s, dir, "documents")
        .select(col("doc_id"), xml.as("x"))
        .select(col("doc_id"),
          expr("xpath_string(x, '/doc/lang')").as("xlang"),
          expr("xpath_string(x, '/doc/src')").as("xsrc"),
          expr("xpath_long(x, '/doc/m/n[1]')").as("xn"),
          expr("size(xpath(x, '/doc/m/n/text()'))").cast(LongType)
            .as("n_nodes"))
        .orderBy(col("doc_id"))
    },

    // AES encrypt/decrypt round trip — exceeds the reference's crypto
    // surface (md5/sha2/crc32 only): ECB ciphertext length follows the
    // PKCS#7 block rule (oracle-derivable), GCM uses a random IV so
    // only its ROUND TRIP is checked, with the equality computed
    // in-engine (the q171 matches-pinned pattern — DuckDB has no AES).
    "q264_aes_roundtrip" -> { (s, dir) =>
      val key = lit("0123456789abcdef") // AES-128
      val d = Tables.df(s, dir, "documents")
        .filter(col("doc_id") <= 100)
        .select(col("doc_id"), col("lang"))
      d.select(col("doc_id"),
          octet_length(expr(
            "aes_encrypt(lang, '0123456789abcdef', 'ECB')"))
            .cast(LongType).as("ecb_len"),
          expr("cast(aes_decrypt(aes_encrypt(lang, " +
            "'0123456789abcdef', 'ECB'), '0123456789abcdef', 'ECB') " +
            "AS STRING)").as("ecb_rt"),
          expr("cast(aes_decrypt(aes_encrypt(lang, " +
            "'0123456789abcdef'), '0123456789abcdef') AS STRING) " +
            "= lang").as("gcm_roundtrip_ok"))
        .orderBy(col("doc_id"))
    },

    // URL parsing — the crawl-pipeline normalization step: parse_url
    // extracts protocol/host/path and a named query parameter from a
    // synthesized per-document URL. The oracle derives the expected
    // fields from the same generation rule, so a parse_url behavior
    // change (it is java.net.URI-backed) goes red.
    "q254_url_parse" -> { (s, dir) =>
      val url = concat(lit("https://"), col("source"),
        lit(".example.com/docs/"), col("doc_id"),
        lit("?lang="), col("lang"), lit("&rank=7"))
      Tables.df(s, dir, "documents")
        .select(col("doc_id"), url.as("url"))
        .select(col("doc_id"),
          parse_url(col("url"), lit("PROTOCOL")).as("proto"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("lang")).as("q_lang"),
          parse_url(col("url"), lit("QUERY"), lit("rank")).as("q_rank"))
        .orderBy(col("doc_id"))
    },
    "q56_string_funcs2" -> { (s, dir) =>
      Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          bit_length(col("lang")).cast(LongType).as("bl"),
          chr(col("doc_id") % 26 + 65).as("ch"),
          concat(lit("x"), lit(" " * 3), lit("y")).as("spaced"),
          expr("find_in_set(lang, 'en,de,es,fr,zh')").cast(LongType)
            .as("fis"),
          rpad(col("lang"), 5, "*").as("rp"),
          expr("left(text, 4)").as("lf"),
          expr("right(lang, 1)").as("rt"),
          regexp_extract(col("text"), "[a-z]+a", 0).as("rex"),
          base64(col("lang").cast(BinaryType)).as("b64"),
          unbase64(base64(col("lang").cast(BinaryType))).cast(StringType)
            .as("b64rt"),
          initcap(substring(col("text"), 1, 15)).as("ic"))
        .orderBy(col("doc_id"))
    },

    // Higher-order functions over arrays: transform / filter / exists /
    // forall / aggregate — all codegen-adjacent lambda expressions (the
    // reference test corpus has a HigherOrderFunctions suite; SURVEY §5).
    "q65_higher_order" -> { (s, dir) =>
      import graft.functions.TextOps.tokens
      val tk = tokens(col("text"))
      Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          size(filter(tk, t => length(t) > 4)).cast(LongType).as("n_long"),
          exists(tk, t => t === "the").as("has_the"),
          forall(tk, t => t === lower(t)).as("all_lower"),
          aggregate(tk, lit(0), (acc, t) => acc + length(t))
            .cast(LongType).as("total_chars"),
          array_join(transform(slice(tk, 1, 5),
            t => length(t).cast(StringType)), ",").as("len5"))
        .orderBy(col("doc_id"))
    },

    // Error-safe function family: try_divide/try_cast/nullif-guarded
    // arithmetic (Spark's non-failing variants; the reference inherits
    // Spark's div-by-zero -> null semantics, NativeConverters.scala
    // arithmetic notes).
    "q93_try_funcs" -> { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          // integral divide-by-zero -> NULL (double division would give
          // IEEE Infinity and not trigger the TRY path)
          try_divide(col("l_linenumber"), lit(0)).as("div0"),
          try_divide(col("l_extendedprice"), col("l_quantity")).as("divok"),
          expr("try_cast(l_returnflag AS INT)").as("badcast"),
          expr("try_cast(l_linenumber AS STRING)").as("okcast"),
          try_add(col("l_orderkey") + 1, lit(Long.MaxValue)).as("overflow"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    "q57_math_funcs2" -> { (s, dir) =>
      Tables.df(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          bround(col("l_quantity") + 0.5, 0).as("br"),
          hex(col("l_orderkey")).as("hx"),
          pmod(col("l_orderkey") * -1, lit(7L)).as("pm"),
          round(atan(col("l_discount")), 6).as("at"),
          round(asin(col("l_discount") * 5), 6).as("as"),
          round(acos(col("l_discount") * 5), 6).as("ac"),
          round(tan(col("l_discount")), 6).as("tn"),
          round(expm1(col("l_discount")), 6).as("em1"),
          round(acosh(col("l_quantity") + 1.0), 6).as("ah"),
          isnan(lit("NaN").cast(DoubleType)).as("nan_t"),
          isnan(col("l_quantity")).as("nan_f"),
          round(degrees(col("l_discount")), 6).as("deg"),
          round(radians(col("l_quantity")), 6).as("rad"),
          round(sinh(col("l_discount")), 6).as("sh"),
          round(cosh(col("l_discount")), 6).as("ch"),
          round(tanh(col("l_discount")), 6).as("th"),
          round(cbrt(col("l_quantity")), 6).as("cb"),
          bin(col("l_linenumber")).as("bn"),
          to_timestamp(date_format(col("l_shipdate"), "yyyy-MM-dd"),
            "yyyy-MM-dd").cast(DateType).as("reparsed"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }
  )

  override def oracle: Map[String, String] = Map(
    "q278_null_key_joins" ->
      """WITH li AS (SELECT nullif(l_suppkey, 42) AS sk FROM lineitem),
        |sup AS (SELECT nullif(s_suppkey, 57) AS pk FROM supplier)
        |SELECT
        |  (SELECT count(*) FROM li JOIN sup ON sk = pk) AS n_inner,
        |  (SELECT count(*) FROM li LEFT JOIN sup ON sk = pk
        |   WHERE pk IS NULL) AS n_left_unmatched,
        |  (SELECT count(*) FROM li JOIN sup
        |   ON sk IS NOT DISTINCT FROM pk) AS n_nullsafe""".stripMargin,
    "q279_signed_mod_div" ->
      """SELECT x, x % 7 AS mod7,
        |  ((x % 7) + 7) % 7 AS pmod7,
        |  (x - (x % 5)) // 5 AS tdiv5
        |FROM (SELECT DISTINCT CAST(l_quantity AS BIGINT) - 26 AS x
        |      FROM lineitem)
        |ORDER BY x""".stripMargin,
    "q276_null_matrix" ->
      """SELECT nullif(l_returnflag, 'R') AS flag,
        |  count(*) AS n_star,
        |  count(nullif(l_quantity, 25.0)) AS n_qty,
        |  CAST(sum(CAST(nullif(l_quantity, 25.0) AS DECIMAL(18,2)))
        |    AS DOUBLE) AS sum_qty,
        |  round(avg(nullif(l_quantity, 25.0)), 4) AS avg_qty,
        |  count(CASE WHEN l_linenumber = 1 THEN l_discount END)
        |    AS n_disc,
        |  coalesce(min(CASE WHEN l_linenumber = 1 THEN l_discount END),
        |    -1.0) AS min_disc_or
        |FROM lineitem GROUP BY 1 ORDER BY flag NULLS FIRST""".stripMargin,
    "q277_unicode" ->
      """WITH t(id, t) AS (VALUES
        |  (1, 'hello'), (2, 'caf' || chr(233)),
        |  (3, 'stra' || chr(223) || 'e'),
        |  (4, chr(26085) || chr(26412) || chr(35486) || chr(12486) ||
        |      chr(12473) || chr(12488)),
        |  (5, 'a' || chr(769) || 'b' || chr(769)),
        |  (6, chr(128512) || 'x' || chr(128513)))
        |SELECT CAST(id AS BIGINT) AS id, t,
        |  CAST(length(t) AS BIGINT) AS n_cp,
        |  CASE WHEN id != 3 THEN upper(t) END AS up,
        |  substr(t, 2, 2) AS sub23,
        |  CAST(coalesce(strpos(t, 'x'), 0) AS BIGINT) AS pos_x,
        |  t || '!' AS bang
        |FROM t ORDER BY id""".stripMargin,
    "q265_json_schema" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |  'STRUCT<k: BIGINT>' AS inferred
        |FROM events WHERE event_id < 1000 ORDER BY event_id""".stripMargin,
    "q266_numeric_profile" ->
      """SELECT count(*) AS n,
        |  round(corr(l_quantity, l_extendedprice), 4) AS c_qty_price,
        |  round(corr(l_quantity, l_discount), 4) AS c_qty_disc,
        |  round(corr(l_quantity, l_tax), 4) AS c_qty_tax,
        |  round(corr(l_extendedprice, l_discount), 4) AS c_price_disc,
        |  round(corr(l_extendedprice, l_tax), 4) AS c_price_tax,
        |  round(corr(l_discount, l_tax), 4) AS c_disc_tax
        |FROM lineitem""".stripMargin,
    "q263_xpath" ->
      """SELECT doc_id, lang AS xlang, source AS xsrc,
        |  CAST(n_chars AS BIGINT) AS xn, CAST(2 AS BIGINT) AS n_nodes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q264_aes_roundtrip" ->
      """SELECT doc_id,
        |  CAST((length(lang) // 16 + 1) * 16 AS BIGINT) AS ecb_len,
        |  lang AS ecb_rt, TRUE AS gcm_roundtrip_ok
        |FROM documents WHERE doc_id <= 100 ORDER BY doc_id""".stripMargin,
    "q254_url_parse" ->
      """SELECT doc_id, 'https' AS proto,
        |  source || '.example.com' AS host,
        |  '/docs/' || doc_id AS path,
        |  lang AS q_lang, '7' AS q_rank
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q56_string_funcs2" ->
      """SELECT doc_id,
        | CAST(bit_length(lang) AS BIGINT) AS bl,
        | chr(CAST(doc_id % 26 + 65 AS INT)) AS ch,
        | 'x' || repeat(' ', 3) || 'y' AS spaced,
        | CAST(list_position(string_split('en,de,es,fr,zh', ','), lang)
        |   AS BIGINT) AS fis,
        | rpad(lang, 5, '*') AS rp,
        | left(text, 4) AS lf,
        | right(lang, 1) AS rt,
        | coalesce(regexp_extract(text, '[a-z]+a'), '') AS rex,
        | to_base64(encode(lang)) AS b64,
        | lang AS b64rt,
        | array_to_string(list_transform(
        |     string_split(substring(text, 1, 15), ' '),
        |     w -> CASE WHEN len(w) = 0 THEN w
        |          ELSE upper(w[1]) || lower(w[2:]) END), ' ') AS ic
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q93_try_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        | CAST(NULL AS DOUBLE) AS div0,
        | l_extendedprice / l_quantity AS divok,
        | TRY_CAST(l_returnflag AS INT) AS badcast,
        | TRY_CAST(l_linenumber AS VARCHAR) AS okcast,
        | CAST(NULL AS BIGINT) AS overflow
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q65_higher_order" ->
      """SELECT doc_id,
        | CAST(len(list_filter(string_split(text, ' '), t -> len(t) > 4))
        |   AS BIGINT) AS n_long,
        | len(list_filter(string_split(text, ' '), t -> t = 'the')) > 0
        |   AS has_the,
        | len(list_filter(string_split(text, ' '), t -> t != lower(t))) = 0
        |   AS all_lower,
        | CAST(list_aggregate(list_transform(string_split(text, ' '),
        |   t -> len(t)), 'sum') AS BIGINT) AS total_chars,
        | array_to_string(list_transform(string_split(text, ' ')[1:5],
        |   t -> CAST(len(t) AS VARCHAR)), ',') AS len5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q57_math_funcs2" ->
      """SELECT l_orderkey, l_linenumber,
        | roundbankers(l_quantity + 0.5, 0) AS br,
        | hex(l_orderkey) AS hx,
        | CAST(((l_orderkey * -1) % 7 + 7) % 7 AS BIGINT) AS pm,
        | round(atan(l_discount), 6) AS at,
        | round(asin(l_discount * 5), 6) AS "as",
        | round(acos(l_discount * 5), 6) AS ac,
        | round(tan(l_discount), 6) AS tn,
        | round(exp(l_discount) - 1, 6) AS em1,
        | round(ln(l_quantity + 1.0 +
        |   sqrt((l_quantity + 1.0) * (l_quantity + 1.0) - 1)), 6) AS ah,
        | isnan(CAST('NaN' AS DOUBLE)) AS nan_t,
        | isnan(l_quantity) AS nan_f,
        | round(degrees(l_discount), 6) AS deg,
        | round(radians(l_quantity), 6) AS rad,
        | round((exp(l_discount) - exp(-l_discount)) / 2, 6) AS sh,
        | round((exp(l_discount) + exp(-l_discount)) / 2, 6) AS ch,
        | round((exp(l_discount) - exp(-l_discount))
        |     / (exp(l_discount) + exp(-l_discount)), 6) AS th,
        | round(cbrt(l_quantity), 6) AS cb,
        | bin(CAST(l_linenumber AS BIGINT)) AS bn,
        | CAST(strptime(strftime(l_shipdate, '%Y-%m-%d'), '%Y-%m-%d')
        |   AS DATE) AS reparsed
        |FROM lineitem WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
