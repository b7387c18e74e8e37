package graft.queries

import graft.{QueryModule, Tables}
import graft.functions.TextOps._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fourth wave of LLM-training-data pipeline operators: repetition
  * quality signals (the "repeated n-gram" degenerate-text detector) and
  * deterministic train/val/test split assignment.
  *
  * Scale design (100 TB):
  *  - q131's gram-repetition ratio is map-only (one pass per doc); the
  *    top-token frequency is a two-level aggregation on high-cardinality
  *    (doc_id, term) then doc_id keys — both shuffles partial-aggregate
  *    map-side first.
  *  - q132 is map-only: the split is a pure function of a salted hash of
  *    the doc id, so any cluster layout / rerun assigns identically, and
  *    a doc never migrates between splits when the corpus grows (the
  *    hash ignores corpus size — unlike randomSplit, whose assignment
  *    depends on partitioning).
  */
object Pipeline4 extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Repetition signals: 1 - distinct/total 3-grams (degenerate-text
    // detector — boilerplate and looped generations repeat grams), plus
    // the most-frequent-token share of the doc.
    "q131_repetition" -> { (s, dir) =>
      val grams = Tables.df(s, dir, "documents")
        .select(col("doc_id"), tokens(col("text")).as("tok"))
        .filter(size(col("tok")) >= 3)
        .select(col("doc_id"), col("tok"),
          transform(sequence(lit(0), size(col("tok")) - 3),
            i => array_join(slice(col("tok"), i + 1, lit(3)), " ")).as("g3"))
        .select(col("doc_id"),
          size(col("g3")).cast(LongType).as("n_grams"),
          size(array_distinct(col("g3"))).cast(LongType).as("n_uniq_grams"),
          explode(col("tok")).as("term"))
      grams
        .groupBy(col("doc_id"), col("n_grams"), col("n_uniq_grams"),
          col("term"))
        .agg(count(lit(1)).as("tf"))
        .groupBy(col("doc_id"), col("n_grams"), col("n_uniq_grams"))
        .agg(max(col("tf")).as("max_tf"), sum(col("tf")).as("n_tokens"))
        .select(col("doc_id"), col("n_grams"), col("n_uniq_grams"),
          round(lit(1.0) - col("n_uniq_grams") / col("n_grams").cast(DoubleType), 6)
            .as("rep_ratio"),
          round(col("max_tf") / col("n_tokens").cast(DoubleType), 6)
            .as("top_tok_share"))
        .orderBy(col("doc_id"))
    },

    // The CURATION PIPELINE end-to-end, oracle-checkable: the whole
    // LLM-data flow in one declarative plan — quality filter (length),
    // near-dup removal (fingerprint groups keep the min doc_id),
    // benchmark decontamination (drop docs sharing >= 3 word-4-grams
    // with the fixed 200-doc benchmark tail, and the tail itself), and
    // deterministic split assignment on the survivors. Every stage is
    // the oracle-expressible variant of its scalable twin (fingerprint
    // ~ q129's LSH clusters, gram overlap = q113, split = q132), so
    // DuckDB replays the ENTIRE pipeline hash-exactly.
    // Scale: scan → window-on-fp → gram join vs broadcast bench set →
    // anti join → map-only split. No stage is quadratic in the corpus.
    "q149_curation" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.df(s, dir, "documents")
      val cut = docs.agg((max(col("doc_id")) - 200).cast(LongType).as("cut"))
      val wFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
      val quality = docs
        .select(col("doc_id"), col("text"),
          size(tokens(col("text"))).cast(LongType).as("n_tokens"))
        .filter(col("n_tokens") >= 40)
      val deduped = quality
        .withColumn("fp", fingerprint(col("text")))
        .withColumn("rn", row_number().over(wFp))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("text"))
      val grams = Pipeline2.docGrams(docs).crossJoin(broadcast(cut))
      val bench = grams.filter(col("doc_id") >= col("cut"))
        .select(col("g")).distinct()
      val contaminated = grams.filter(col("doc_id") < col("cut"))
        .join(broadcast(bench), "g")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
        .filter(col("n_hits") >= 3)
        .select(col("doc_id"))
      val u = substring(md5(concat(lit("split"),
        col("doc_id").cast(StringType)).cast(BinaryType)), 1, 8)
      deduped.crossJoin(broadcast(cut))
        .filter(col("doc_id") < col("cut"))
        .join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"),
          when(u < "cccccccc", "train")
            .when(u < "e6666666", "val")
            .otherwise("test").as("split"))
        .orderBy(col("doc_id"))
    },

    // Deterministic train/val/test split (80/10/10): a salted md5 maps
    // every doc to a stable uniform draw; thresholds on the 8-hex-char
    // prefix partition the unit interval. Emits the assignment — the
    // production write is partitionBy(split).
    "q132_train_split" -> { (s, dir) =>
      val u = substring(md5(concat(lit("split"),
        col("doc_id").cast(StringType)).cast(BinaryType)), 1, 8)
      Tables.df(s, dir, "documents")
        .select(col("doc_id"),
          when(u < "cccccccc", "train")
            .when(u < "e6666666", "val")
            .otherwise("test").as("split"))
        .orderBy(col("doc_id"))
    }
  )

  private val tokSql = "string_split(text, ' ')"

  override def oracle: Map[String, String] = Map(
    "q149_curation" ->
      s"""WITH cut AS (SELECT CAST(max(doc_id) - 200 AS BIGINT) AS cut
         |             FROM documents),
         |quality AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE len($tokSql) >= 40),
         |deduped AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, row_number() OVER (
         |      PARTITION BY md5(array_to_string(list_sort(
         |        list_distinct($tokSql)), ' '))
         |      ORDER BY doc_id) AS rn
         |    FROM quality) WHERE rn = 1),
         |d AS (SELECT doc_id, $tokSql AS tok FROM documents
         |      WHERE len($tokSql) >= 4),
         |idx AS (SELECT doc_id, tok, unnest(range(1, len(tok) - 2)) AS i
         |        FROM d),
         |grams AS (SELECT DISTINCT doc_id,
         |            array_to_string(tok[i:i+3], ' ') AS g FROM idx),
         |bench AS (SELECT DISTINCT g FROM grams, cut WHERE doc_id >= cut),
         |contaminated AS (
         |  SELECT c.doc_id FROM grams c JOIN bench b USING (g), cut
         |  WHERE c.doc_id < cut
         |  GROUP BY c.doc_id HAVING count(*) >= 3)
         |SELECT doc_id,
         |  CASE WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8)
         |         < 'cccccccc' THEN 'train'
         |       WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8)
         |         < 'e6666666' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM deduped, cut
         |WHERE doc_id < cut
         |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
         |ORDER BY doc_id""".stripMargin,
    "q131_repetition" ->
      s"""WITH d AS (SELECT doc_id, $tokSql AS tok FROM documents
         |           WHERE len($tokSql) >= 3),
         |g AS (SELECT doc_id, tok,
         |        [array_to_string(tok[i:i+2], ' ')
         |         FOR i IN range(1, len(tok) - 1)] AS g3 FROM d),
         |base AS (SELECT doc_id, CAST(len(g3) AS BIGINT) AS n_grams,
         |           CAST(len(list_distinct(g3)) AS BIGINT) AS n_uniq_grams,
         |           unnest(tok) AS term FROM g),
         |tf AS (SELECT doc_id, n_grams, n_uniq_grams, term,
         |         count(*) AS tf FROM base GROUP BY 1, 2, 3, 4)
         |SELECT doc_id, n_grams, n_uniq_grams,
         |  round(1.0 - n_uniq_grams / CAST(n_grams AS DOUBLE), 6)
         |    AS rep_ratio,
         |  round(max(tf) / CAST(sum(tf) AS DOUBLE), 6) AS top_tok_share
         |FROM tf GROUP BY doc_id, n_grams, n_uniq_grams
         |ORDER BY doc_id""".stripMargin,
    "q132_train_split" ->
      """SELECT doc_id,
        |  CASE WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8)
        |         < 'cccccccc' THEN 'train'
        |       WHEN substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8)
        |         < 'e6666666' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
