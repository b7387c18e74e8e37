package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column handling (north star): media as opaque `binary`
  * columns + typed metadata structs, with decode / feature-extraction
  * running as partition-parallel typed transforms.
  *
  * No image/audio codecs exist in this container, so the DECODE step is a
  * clearly-marked deterministic STUB (`FakeDecoder`); everything around
  * it — binary column construction, metadata schema, mapPartitions batch
  * shape, partition parallelism — is real and oracle-checked. Swapping
  * `FakeDecoder.decode` for a real codec is the only change needed.
  */
object Multimodal extends QueryModule {

  /** Typed decode output (the schema a real image decoder would emit). */
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
                       height: Long, mime: String)

  /** STUB decoder: deterministic pseudo-metadata from the byte payload.
    * A real implementation would parse the container header here. */
  object FakeDecoder {
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length.toLong
      MediaMeta(
        doc_id = docId,
        n_bytes = n,
        width = n % 640 + 1,
        height = (n * 7) % 480 + 1,
        mime = (n % 3) match {
          case 0 => "image/jpeg"
          case 1 => "image/png"
          case _ => "audio/wav"
        })
    }
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload + mapPartitions "decode" into a typed metadata
    // struct — the real distributed plumbing around the stubbed codec.
    "q80_multimodal_decode" -> { (s, dir) =>
      import s.implicits._
      Tables.df(s, dir, "documents")
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          FakeDecoder.decode(id, bytes)
        })
        .toDF()
        .orderBy(col("doc_id"))
    },

    // Frame-sampling / chunking stub over the binary payload: fixed-size
    // byte windows (what frame extraction does to video), flattened with
    // posexplode — shape and cardinality are real, payload is sliced
    // binary. Output: per-chunk byte length + md5.
    "q81_multimodal_chunks" -> { (s, dir) =>
      val chunk = 100
      val payload = col("text").cast(BinaryType)
      val nChunks = ceil(octet_length(payload).cast(DoubleType) / chunk)
        .cast(IntegerType)
      Tables.df(s, dir, "documents")
        .filter(col("doc_id") <= 50)
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(0), nChunks - 1),
            i => substring(col("text"), i * chunk + 1, lit(chunk))))
            .as(Seq("chunk_idx", "chunk")))
        .select(col("doc_id"), col("chunk_idx").cast(LongType).as("chunk_idx"),
          length(col("chunk")).cast(LongType).as("chunk_len"),
          md5(col("chunk").cast(BinaryType)).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // Feature-extraction + resize stub over the payload: a 4-bin
    // character-class histogram as the "extracted feature vector" (a
    // real pipeline would emit CNN features here — same shape: map-only,
    // fixed-width vector per row) and aspect-preserving resize targets
    // computed from the decoded dimensions (width fixed at 224). The
    // histogram is ONE codegen'd text pass (CharClassCounts) — the
    // four-regexp_replace formulation scanned each document 4×.
    "q128_multimodal_features" -> { (s, dir) =>
      import graft.functions.CharClassCounts.charClassCounts
      val nBytes = octet_length(col("text").cast(BinaryType))
      val wRaw = (nBytes % 640 + 1).cast(DoubleType)
      val hRaw = ((nBytes * 7) % 480 + 1).cast(DoubleType)
      Tables.df(s, dir, "documents")
        .select(col("doc_id"), charClassCounts(col("text")).as("f"),
          lit(224L).as("resize_w"),
          floor(lit(224.0) * hRaw / wRaw).cast(LongType).as("resize_h"))
        .select(col("doc_id"),
          element_at(col("f"), 1).as("f1"), element_at(col("f"), 2).as("f2"),
          element_at(col("f"), 3).as("f3"), element_at(col("f"), 4).as("f4"),
          col("resize_w"), col("resize_h"))
        .withColumn("fnorm",
          round(sqrt((col("f1") * col("f1") + col("f2") * col("f2") +
            col("f3") * col("f3") + col("f4") * col("f4"))
            .cast(DoubleType)), 6))
        .orderBy(col("doc_id"))
    }
  )

  override def oracle: Map[String, String] = Map(
    "q80_multimodal_decode" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(octet_length(encode(text)) % 640 + 1 AS BIGINT) AS width,
        | CAST((octet_length(encode(text)) * 7) % 480 + 1 AS BIGINT) AS height,
        | CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'image/jpeg'
        |   WHEN 1 THEN 'image/png' ELSE 'audio/wav' END AS mime
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q81_multimodal_chunks" ->
      """SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        | CAST(length(substring(text, CAST(i * 100 + 1 AS INT), 100))
        |   AS BIGINT) AS chunk_len,
        | md5(substring(text, CAST(i * 100 + 1 AS INT), 100)) AS chunk_md5
        |FROM documents,
        |  unnest(generate_series(0,
        |    CAST(ceil(octet_length(encode(text)) / 100.0) AS INT) - 1)) AS t(i)
        |WHERE doc_id <= 50
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "q128_multimodal_features" ->
      """SELECT doc_id,
        |  CAST(length(text) - length(regexp_replace(text, '[a-h]', '', 'g'))
        |    AS BIGINT) AS f1,
        |  CAST(length(text) - length(regexp_replace(text, '[i-p]', '', 'g'))
        |    AS BIGINT) AS f2,
        |  CAST(length(text) - length(regexp_replace(text, '[q-z]', '', 'g'))
        |    AS BIGINT) AS f3,
        |  CAST(length(text) - length(regexp_replace(text, '[^a-z]', '', 'g'))
        |    AS BIGINT) AS f4,
        |  CAST(224 AS BIGINT) AS resize_w,
        |  CAST(floor(224.0 * ((octet_length(encode(text)) * 7) % 480 + 1)
        |    / (octet_length(encode(text)) % 640 + 1)) AS BIGINT) AS resize_h,
        |  round(sqrt(CAST(
        |    (length(text) - length(regexp_replace(text, '[a-h]', '', 'g'))) *
        |    (length(text) - length(regexp_replace(text, '[a-h]', '', 'g'))) +
        |    (length(text) - length(regexp_replace(text, '[i-p]', '', 'g'))) *
        |    (length(text) - length(regexp_replace(text, '[i-p]', '', 'g'))) +
        |    (length(text) - length(regexp_replace(text, '[q-z]', '', 'g'))) *
        |    (length(text) - length(regexp_replace(text, '[q-z]', '', 'g'))) +
        |    (length(text) - length(regexp_replace(text, '[^a-z]', '', 'g'))) *
        |    (length(text) - length(regexp_replace(text, '[^a-z]', '', 'g')))
        |    AS DOUBLE)), 6) AS fnorm
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
