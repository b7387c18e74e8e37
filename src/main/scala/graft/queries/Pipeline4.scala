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
