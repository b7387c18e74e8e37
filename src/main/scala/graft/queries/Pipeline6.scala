package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sixth wave of LLM-training-data pipeline operators: the EPOCH
  * DATA-ORDERING pair every large training run needs —
  * deterministic epoch shuffling into shards, and weighted priority
  * sampling without replacement (Efraimidis–Spirakis).
  *
  * Determinism convention as everywhere else in the repo: pseudo-
  * randomness is salted md5 over stable keys (never rand()), so every
  * engine — Spark here, DuckDB in the oracle, a re-run next year —
  * lands on the same sample.
  *
  * Scale design (100 TB):
  *  - q410 is map-only hashing + a 32-group aggregate: shard
  *    assignment happens where the row lives, the census partial-
  *    aggregates map-side, and the production write path is
  *    `repartition($"shard").sortWithinPartitions($"pos")` — a single
  *    hash shuffle, no global ordering anywhere;
  *  - q411's top-k rides `orderBy().limit(k)` →
  *    TakeOrderedAndProject: per-partition heaps of size k, one
  *    k-sized driver merge — never a global sort, never a single-
  *    partition window.
  */
object Pipeline6 extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // EPOCH SHUFFLE: deterministic shard + intra-shard position for
    // training epoch 1. shard = md5("ep1:"+doc_id)[0:4] mod 32; the
    // next 8 hex chars are the intra-shard sort position. The census
    // proves the assignment (counts, char mass, position range per
    // shard) with INTEGER-exact arithmetic end to end.
    "q410_epoch_shuffle" -> { (s, dir) =>
      val docs = Tables.df(s, dir, "documents")
      val hashed = docs.select(
        col("doc_id"), col("n_chars"),
        md5(concat(lit("ep1:"), col("doc_id").cast(StringType))).as("h"))
        .select(col("doc_id"), col("n_chars"),
          (conv(substring(col("h"), 1, 4), 16, 10).cast(LongType) % 32)
            .as("shard"),
          conv(substring(col("h"), 5, 8), 16, 10).cast(LongType)
            .as("pos"))
      hashed.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("pos")).as("min_pos"),
          max(col("pos")).as("max_pos"))
        .orderBy(col("shard"))
    },

    // WEIGHTED PRIORITY SAMPLE (Efraimidis–Spirakis A-ES, without
    // replacement): priority = ln(u)/w with u = (md5 32-bit + 1)/2^32
    // ∈ (0,1] and w = max(n_chars, 1) — the k rows with the LARGEST
    // priority (closest to 0) are exactly a weight-proportional
    // sample without replacement. Raw priority orders; the output
    // value is rounded to 6 (the repo's float convention) and doc_id
    // breaks ties.
    "q411_weighted_sample" -> { (s, dir) =>
      val docs = Tables.df(s, dir, "documents")
      val keyed = docs.select(
        col("doc_id"), col("lang"),
        greatest(col("n_chars"), lit(1L)).as("w"),
        ((conv(substring(md5(concat(lit("wps:"),
          col("doc_id").cast(StringType))), 1, 8), 16, 10)
          .cast(DoubleType) + 1.0) / 4294967296.0).as("u"))
        .withColumn("priority", log(col("u")) / col("w"))
      keyed
        .orderBy(col("priority").desc, col("doc_id"))
        .limit(100)
        .select(col("doc_id"), col("lang"),
          round(col("priority") * 1e6, 6).as("priority_ppm"))
        .orderBy(col("doc_id"))
    })

  override def oracle: Map[String, String] = Map(
    "q410_epoch_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |    md5('ep1:' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, n_chars,
        |    ('0x' || substr(h, 1, 4))::BIGINT % 32 AS shard,
        |    ('0x' || substr(h, 5, 8))::BIGINT AS pos
        |  FROM h)
        |SELECT shard, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  min(pos) AS min_pos, max(pos) AS max_pos
        |FROM k GROUP BY shard ORDER BY shard""".stripMargin,
    "q411_weighted_sample" ->
      """WITH k AS (
        |  SELECT doc_id, lang, greatest(n_chars, 1) AS w,
        |    (('0x' || substr(md5('wps:' || CAST(doc_id AS VARCHAR)),
        |      1, 8))::BIGINT + 1.0) / 4294967296.0 AS u
        |  FROM documents)
        |SELECT doc_id, lang,
        |  round(ln(u) / w * 1e6, 6) AS priority_ppm
        |FROM k
        |ORDER BY ln(u) / w DESC, doc_id
        |LIMIT 100""".stripMargin)
}
