package graft.queries

import graft.{QueryModule, Tables}
import graft.functions.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second wave of LLM-training-data pipeline operators (north star beyond
  * the reference surface): benchmark decontamination, dictionary scrubbing,
  * deterministic stratified mixture sampling, TF-IDF keyword extraction,
  * and token-window chunking.
  *
  * Scale design notes (100 TB):
  *  - q113 broadcasts the *benchmark* gram set (benchmarks are tiny vs the
  *    corpus) — the corpus side is one scan + one map-side join, no
  *    corpus-vs-corpus shuffle.
  *  - q114/q115/q117 are map-only (scan → project/filter → explode); no
  *    shuffle at all before the presentation sort.
  *  - q116 shuffles twice (doc-term counts, term doc-frequency) and
  *    broadcasts the single-row corpus count — the classic two-pass
  *    TF-IDF shape; both shuffles are on high-cardinality keys.
  */
object Pipeline2 extends QueryModule {

  import TextOps._

  private val gramN = 4

  /** Distinct word n-grams per document (n = `gramN`). */
  private[graft] def docGrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("tok"))
      .filter(size(col("tok")) >= gramN)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          sequence(lit(0), size(col("tok")) - gramN),
          i => array_join(slice(col("tok"), i + 1, lit(gramN)), " ")))).as("g"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Benchmark decontamination: flag training docs sharing word 4-grams
    // with a held-out benchmark slice (here: a FIXED 200-doc tail of the
    // id space, the split bound computed in-plan — no driver collect).
    // The bench slice is O(1) in corpus size, so its gram set stays
    // broadcast-safe at 100 TB (real benchmarks are a fixed artifact,
    // not a corpus fraction); the corpus is scanned once and never
    // self-joined.
    "q113_decontamination" -> { (s, dir) =>
      val docs = Tables.df(s, dir, "documents")
      val cut = docs.agg((max(col("doc_id")) - 200)
        .cast(LongType).as("cut"))
      val grams = docGrams(docs).crossJoin(broadcast(cut))
      val corpus = grams.filter(col("doc_id") < col("cut"))
        .select(col("doc_id"), col("g"))
      val bench = grams.filter(col("doc_id") >= col("cut"))
        .select(col("g")).distinct()
      corpus.join(broadcast(bench), "g")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hits"))
        .withColumn("contaminated", col("n_hits") >= 3)
        .orderBy(col("doc_id"))
    },

    // Dictionary scrubbing (the PII-redaction shape on synthetic text):
    // blocklist terms are masked via one compiled regex pass; emits the
    // match count and a digest of the scrubbed text. Map-only.
    "q114_redact" -> { (s, dir) =>
      val pat = "\\b(customer|supplier|part)\\b"
      Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          regexp_count(col("text"), lit(pat)).cast(LongType).as("n_redacted"),
          md5(regexp_replace(col("text"), pat, "[ENT]").cast(BinaryType))
            .as("red_md5"))
        .orderBy(col("doc_id"))
    },

    // Deterministic stratified mixture sampling: per-language rates
    // (en 0.5 / de 0.3 / rest 0.1) applied by comparing a salted md5
    // prefix against the rate threshold — map-only, no shuffle, no RNG
    // state, reproducible on any cluster layout. The hex-string compare
    // is a uniform [0,1) draw (8 hex chars = 32 bits).
    "q115_stratified_sample" -> { (s, dir) =>
      val u = substring(md5(concat(lit("smpl"),
        col("doc_id").cast(StringType)).cast(BinaryType)), 1, 8)
      val thresh = when(col("lang") === "en", "80000000")
        .when(col("lang") === "de", "4ccccccc")
        .otherwise("19999999")
      Tables.df(s, dir, "documents")
        .filter(u < thresh)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    },

    // TF-IDF keyword extraction: top-3 terms per document by
    // tf·ln(N/df), ties broken lexicographically.
    "q116_tfidf" -> { (s, dir) =>
      val docs = Tables.df(s, dir, "documents")
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val terms = docs.select(col("doc_id"),
        explode(tokens(col("text"))).as("term"))
      val tf = terms.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("dfreq"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      tf.join(df, "term").crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"),
          round(col("tf") * log(col("n_docs") / col("dfreq")), 6).as("tfidf"))
        .withColumn("rk", row_number().over(w).cast(LongType))
        .filter(col("rk") <= 3)
        .orderBy(col("doc_id"), col("rk"))
    },

    // Token-window chunking for training-sequence packing: windows of 64
    // tokens at stride 48 (17% overlap). Map-only explode; emits a
    // digest per chunk rather than the text itself.
    "q117_chunking" -> { (s, dir) =>
      val tok = tokens(col("text"))
      Tables.df(s, dir, "documents")
        .select(col("doc_id"), tok.as("tok"))
        .select(col("doc_id"),
          explode(sequence(lit(0), size(col("tok")) - 1, lit(48)))
            .as("start"), col("tok"))
        .select(col("doc_id"),
          (col("start") / 48).cast(LongType).as("chunk_idx"),
          size(slice(col("tok"), col("start") + 1, lit(64))).cast(LongType)
            .as("n_chunk_tokens"),
          md5(array_join(slice(col("tok"), col("start") + 1, lit(64)), " ")
            .cast(BinaryType)).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // Token-budget WEIGHTED sampling (Efraimidis-Spirakis A-Res): each
    // doc draws key = u^(1/w) with weight w = token count and a
    // DETERMINISTIC uniform u from a Knuth multiplicative hash of the
    // doc id (exact integer math, then an exact binary fraction — no
    // RNG state, identical on any cluster layout or rerun); the sample
    // is the top-k by key, which Spark plans as TakeOrderedAndProject —
    // map-side top-k, O(k) state per task at any corpus size. Longer
    // docs are proportionally likelier, the standard token-budget
    // mixture-sampling primitive. pow() is rounded to 9dp on both
    // engines (libm vs java.lang.Math ulp drift).
    "q165_weighted_sample" -> { (s, dir) =>
      Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          size(tokens(col("text"))).cast(LongType).as("w"))
        .withColumn("u",
          ((col("doc_id") * 2654435761L) % 2147483648L) /
            lit(2147483648.0))
        .select(col("doc_id"), col("w"),
          round(pow(col("u"), lit(1.0) / col("w")), 9).as("skey"))
        .orderBy(col("skey").desc, col("doc_id"))
        .limit(25)
    },

    // Boilerplate-chunk detection — repeated-paragraph removal, the
    // chunk-granular dedup real curation runs AFTER doc-level dedup
    // (navigation headers, license blocks and template paragraphs
    // repeat across otherwise-distinct docs): non-overlapping 32-token
    // chunks are fingerprinted, a corpus-wide census flags fingerprints
    // appearing in >= 3 docs as boilerplate, and each doc reports its
    // boilerplate ratio. Two narrow shuffles (census on the 128-bit
    // fingerprint, rollup on doc_id) + one broadcast-sized flag join —
    // the census output above the threshold is tiny by definition.
    "q169_boilerplate_chunks" -> { (s, dir) =>
      val tok = tokens(col("text"))
      val chunks = Tables.df(s, dir, "documents")
        .select(col("doc_id"), tok.as("tok"))
        .select(col("doc_id"),
          explode(sequence(lit(0), size(col("tok")) - 1, lit(32)))
            .as("start"), col("tok"))
        .select(col("doc_id"),
          md5(array_join(slice(col("tok"), col("start") + 1, lit(32)), " ")
            .cast(BinaryType)).as("h"))
      val boiler = chunks.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_docs") >= 3)
        .select(col("h").as("bh"))
        .withColumn("is_boiler", lit(true))
      chunks.join(broadcast(boiler), col("h") === col("bh"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          count(col("is_boiler")).as("n_boiler"))
        .select(col("doc_id"), col("n_chunks"), col("n_boiler"),
          round(col("n_boiler").cast(DoubleType) / col("n_chunks"), 6)
            .as("boiler_ratio"))
        .orderBy(col("doc_id"))
    },

    // Model-based quality scoring (the KenLM-style LM filter of real
    // curation stacks, with a transparent bigram frequency model
    // standing in for the LM): PASS 1 aggregates corpus bigram counts
    // and keeps the top 1000 with a deterministic (count desc, bigram)
    // tiebreak — partial agg + TakeOrdered, so the model is
    // broadcast-sized BY CONSTRUCTION at any corpus size; PASS 2
    // re-scans the corpus, joins each doc's bigrams against the
    // broadcast model map-side (no corpus-keyed shuffle), and scores
    // docs by model coverage and mean log-frequency. Engine-portable
    // floats: each ln(count) is rounded to 6dp then summed EXACTLY as
    // decimal, so summation order cannot move the score.
    "q158_lm_quality" -> { (s, dir) =>
      val docs = Tables.df(s, dir, "documents")
      def bigrams(df: DataFrame) = df
        .select(col("doc_id"), tokens(col("text")).as("tok"))
        .filter(size(col("tok")) >= 2)
        .select(col("doc_id"),
          explode(transform(sequence(lit(0), size(col("tok")) - 2),
            i => array_join(slice(col("tok"), i + 1, lit(2)), " ")))
            .as("b"))
      val model = bigrams(docs)
        .groupBy(col("b")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("b")).limit(1000)
      bigrams(docs)
        .join(broadcast(model), Seq("b"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          count(col("cnt")).as("n_covered"),
          sum(round(log(col("cnt").cast(DoubleType)), 6)
            .cast(DecimalType(18, 6))).as("sum_lf"))
        .select(col("doc_id"), col("n_bigrams"), col("n_covered"),
          round(col("n_covered").cast(DoubleType) / col("n_bigrams"), 6)
            .as("coverage"),
          round(coalesce(col("sum_lf").cast(DoubleType) / col("n_covered"),
            lit(0.0)), 6).as("avg_logfreq"))
        .orderBy(col("doc_id"))
    }
  )

  private val tokSql = "string_split(text, ' ')"

  override def oracle: Map[String, String] = Map(
    "q169_boilerplate_chunks" ->
      s"""WITH d AS (SELECT doc_id, $tokSql AS tok FROM documents),
         |starts AS (SELECT doc_id, tok,
         |             unnest(range(0, len(tok), 32)) AS start FROM d),
         |chunks AS (SELECT doc_id,
         |             md5(array_to_string(tok[start+1:start+32], ' ')) AS h
         |           FROM starts),
         |boiler AS (SELECT h FROM chunks
         |           GROUP BY h HAVING count(DISTINCT doc_id) >= 3)
         |SELECT c.doc_id, count(*) AS n_chunks,
         |  CAST(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_boiler,
         |  round(CAST(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*), 6) AS boiler_ratio
         |FROM chunks c LEFT JOIN boiler b ON c.h = b.h
         |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin,
    "q165_weighted_sample" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST(len($tokSql) AS BIGINT) AS w,
         |    ((doc_id * 2654435761) % 2147483648) / 2147483648.0 AS u
         |  FROM documents)
         |SELECT doc_id, w, round(pow(u, 1.0 / w), 9) AS skey
         |FROM d ORDER BY skey DESC, doc_id LIMIT 25""".stripMargin,
    "q158_lm_quality" ->
      s"""WITH tok AS (SELECT doc_id, $tokSql AS t FROM documents
         |             WHERE len($tokSql) >= 2),
         |idx AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM tok),
         |bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS b FROM idx),
         |model AS (SELECT b, count(*) AS cnt FROM bg GROUP BY b
         |          ORDER BY cnt DESC, b LIMIT 1000),
         |per AS (
         |  SELECT doc_id, count(*) AS n_bigrams, count(m.cnt) AS n_covered,
         |    sum(CAST(round(ln(m.cnt), 6) AS DECIMAL(18,6))) AS sum_lf
         |  FROM bg LEFT JOIN model m USING (b)
         |  GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, n_covered,
         |  round(CAST(n_covered AS DOUBLE) / n_bigrams, 6) AS coverage,
         |  round(coalesce(CAST(sum_lf AS DOUBLE) / n_covered, 0.0), 6)
         |    AS avg_logfreq
         |FROM per ORDER BY doc_id""".stripMargin,
    "q113_decontamination" ->
      s"""WITH cut AS (SELECT CAST(max(doc_id) - 200 AS BIGINT) AS cut
         |             FROM documents),
         |d AS (SELECT doc_id, $tokSql AS tok FROM documents
         |      WHERE len($tokSql) >= 4),
         |idx AS (SELECT doc_id, tok, unnest(range(1, len(tok) - 2)) AS i
         |        FROM d),
         |grams AS (SELECT DISTINCT doc_id,
         |            array_to_string(tok[i:i+3], ' ') AS g FROM idx),
         |corpus AS (SELECT doc_id, g FROM grams, cut WHERE doc_id < cut),
         |bench AS (SELECT DISTINCT g FROM grams, cut WHERE doc_id >= cut)
         |SELECT c.doc_id, count(*) AS n_hits,
         |  count(*) >= 3 AS contaminated
         |FROM corpus c JOIN bench b USING (g)
         |GROUP BY c.doc_id ORDER BY doc_id""".stripMargin,
    "q114_redact" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\b(customer|supplier|part)\b'))
        |    AS BIGINT) AS n_redacted,
        |  md5(regexp_replace(text, '\b(customer|supplier|part)\b',
        |    '[ENT]', 'g')) AS red_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q115_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5('smpl' || CAST(doc_id AS VARCHAR)), 1, 8)
        |  < CASE WHEN lang = 'en' THEN '80000000'
        |         WHEN lang = 'de' THEN '4ccccccc'
        |         ELSE '19999999' END
        |ORDER BY doc_id""".stripMargin,
    "q116_tfidf" ->
      s"""WITH n AS (SELECT count(*) AS n_docs FROM documents),
         |terms AS (SELECT doc_id, unnest($tokSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms
         |       GROUP BY doc_id, term),
         |df AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY term)
         |SELECT doc_id, term, tfidf, rk FROM (
         |  SELECT tf.doc_id, tf.term,
         |    round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.dfreq), 6)
         |      AS tfidf,
         |    row_number() OVER (PARTITION BY tf.doc_id ORDER BY
         |      round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.dfreq), 6)
         |        DESC, tf.term) AS rk
         |  FROM tf JOIN df USING (term), n
         |) WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "q117_chunking" ->
      s"""WITH d AS (SELECT doc_id, $tokSql AS tok FROM documents),
         |starts AS (SELECT doc_id, tok,
         |             unnest(range(0, len(tok), 48)) AS start FROM d)
         |SELECT doc_id, CAST(start / 48 AS BIGINT) AS chunk_idx,
         |  CAST(len(tok[start+1:start+64]) AS BIGINT) AS n_chunk_tokens,
         |  md5(array_to_string(tok[start+1:start+64], ' ')) AS chunk_md5
         |FROM starts ORDER BY doc_id, chunk_idx""".stripMargin
  )
}
