package graft.queries

import graft.{QueryModule, Tables}
import graft.functions.MediaCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column handling (north star): media as opaque `binary`
  * columns + typed metadata structs, with decode / feature-extraction
  * running as partition-parallel typed transforms.
  *
  * The decode step is a REAL container codec (functions/MediaCodec):
  * documents are materialized as structurally-complete BMP and PNG
  * files — correct magic numbers, endian-faithful header fields, CRC-32
  * chunk trailers — and the decoder parses width/height/channels back
  * out of those bytes, degrading to null on a corrupted header. No
  * pixel codec library exists in this container (and none is needed for
  * header metadata); swapping MediaCodec for libjpeg/ffmpeg changes one
  * executor-side function, none of the Spark plumbing.
  */
object Multimodal extends QueryModule {

  /** Typed decode output (what a real image decoder emits per file). */
  case class MediaMeta(doc_id: Long, n_bytes: Long, mime: Option[String],
                       width: Option[Long], height: Option[Long],
                       channels: Option[Long], bit_depth: Option[Long])

  /** Typed decode output for the audio leg. */
  case class AudioMeta(event_id: Long, n_bytes: Long, mime: Option[String],
                       sample_rate: Option[Long], channels: Option[Long],
                       bit_depth: Option[Long], n_frames: Option[Long],
                       duration_ms: Option[Long])

  /** Deterministic per-document media file: even doc_id → 24-bit BMP,
    * odd → PNG (truecolor, +alpha when doc_id%4==1), dims derived from
    * the id, payload from the text bytes. Every 13th document gets its
    * magic number zeroed — the corrupt-file case a 100 TB ingest always
    * contains. */
  private[graft] def buildMedia(id: Long, text: String): Array[Byte] = {
    val w = (id % 31 + 1).toInt
    val h = (id % 17 + 1).toInt
    val textBytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bytes =
      if (id % 2 == 0) MediaCodec.encodeBmp(w, h, textBytes)
      else MediaCodec.encodePng(w, h,
        colorType = if (id % 4 == 1) 6 else 2,
        payload = textBytes.take(64))
    if (id % 13 == 0) { bytes(0) = 0; bytes(1) = 0 }
    bytes
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload + mapPartitions decode into a typed metadata
    // struct. Two typed stages: (1) materialize the container bytes as
    // a real binary column, (2) sniff + parse the header per row. Both
    // are map-only over the same partitioning — no shuffle until the
    // final presentation sort.
    "q80_multimodal_decode" -> { (s, dir) =>
      import s.implicits._
      Tables.df(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          (id, buildMedia(id, text))
        })
        .mapPartitions(_.map { case (id, bytes) =>
          val d = MediaCodec.sniffDecode(bytes)
          MediaMeta(id, bytes.length.toLong, d.mime,
            d.width.map(_.toLong), d.height.map(_.toLong),
            d.channels.map(_.toLong), d.bitDepth.map(_.toLong))
        })
        .toDF()
        .orderBy(col("doc_id"))
    },

    // Audio leg of the multimodal family: real PCM WAV containers
    // (RIFF + fmt + data, chunk-walking sniffer that tolerates extra
    // chunks in any order) built per event, then header metadata —
    // sample rate / channels / bit depth / frame count / duration —
    // decoded back from the BYTES. Every 13th file gets its RIFF magic
    // zeroed and must degrade to nulls. Same two map-only typed stages
    // as q80; swapping the sniffer for ffprobe changes one function.
    "q244_multimodal_audio" -> { (s, dir) =>
      import s.implicits._
      val rates = Array(8000, 16000, 44100, 48000)
      Tables.df(s, dir, "events")
        .select(col("event_id")).filter(col("event_id") < 500)
        .as[Long]
        .mapPartitions(_.map { id =>
          val bytes = MediaCodec.encodeWav(rates((id % 4).toInt),
            1 + (id % 2).toInt, 16, (id % 500 + 1).toInt)
          if (id % 13 == 0) { bytes(0) = 0; bytes(1) = 0 }
          (id, bytes)
        })
        .mapPartitions(_.map { case (id, bytes) =>
          val d = MediaCodec.sniffWav(bytes)
          AudioMeta(id, bytes.length.toLong, d.mime,
            d.sampleRate.map(_.toLong), d.channels.map(_.toLong),
            d.bitDepth.map(_.toLong), d.nFrames,
            for (nf <- d.nFrames; sr <- d.sampleRate)
              yield nf * 1000L / sr)
        })
        .toDF()
        .orderBy(col("event_id"))
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

    // Feature-extraction + resize over DECODED dimensions: the 4-bin
    // character-class histogram is the "feature vector" (ONE codegen'd
    // text pass — CharClassCounts), and the aspect-preserving resize
    // target comes from the REAL parsed header (width fixed at 224);
    // a corrupted file's resize_h degrades to null instead of garbage.
    "q128_multimodal_features" -> { (s, dir) =>
      import s.implicits._
      import graft.functions.CharClassCounts.charClassCounts
      Tables.df(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val d = MediaCodec.sniffDecode(buildMedia(id, text))
          (id, text, d.width.map(_.toLong), d.height.map(_.toLong))
        })
        .toDF("doc_id", "text", "width", "height")
        .select(col("doc_id"), charClassCounts(col("text")).as("f"),
          lit(224L).as("resize_w"),
          floor(lit(224.0) * col("height") / col("width"))
            .cast(LongType).as("resize_h"))
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
    // WAV leg: the oracle recomputes the header fields from the same
    // generation rule (44-byte canonical header + frames x blockAlign
    // data; blockAlign = channels x 2 at 16-bit); corrupt-magic rows
    // (event_id % 13 = 0) keep their byte length but decode to nulls.
    "q244_multimodal_audio" ->
      """WITH p AS (
        |  SELECT event_id,
        |    CASE event_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |      WHEN 2 THEN 44100 ELSE 48000 END AS sr,
        |    1 + event_id % 2 AS ch,
        |    event_id % 500 + 1 AS nf
        |  FROM events WHERE event_id < 500)
        |SELECT event_id,
        |  CAST(44 + nf * ch * 2 AS BIGINT) AS n_bytes,
        |  CASE WHEN event_id % 13 = 0 THEN NULL
        |       ELSE 'audio/wav' END AS mime,
        |  CAST(CASE WHEN event_id % 13 = 0 THEN NULL ELSE sr END
        |    AS BIGINT) AS sample_rate,
        |  CAST(CASE WHEN event_id % 13 = 0 THEN NULL ELSE ch END
        |    AS BIGINT) AS channels,
        |  CAST(CASE WHEN event_id % 13 = 0 THEN NULL ELSE 16 END
        |    AS BIGINT) AS bit_depth,
        |  CAST(CASE WHEN event_id % 13 = 0 THEN NULL ELSE nf END
        |    AS BIGINT) AS n_frames,
        |  CAST(CASE WHEN event_id % 13 = 0 THEN NULL
        |       ELSE (nf * 1000) // sr END AS BIGINT) AS duration_ms
        |FROM p ORDER BY event_id""".stripMargin,
    // The oracle recomputes the header fields from the same generation
    // rule (DuckDB cannot parse BMP/PNG; MediaCodecSpec proves the
    // byte-level encode→decode round trip and corrupt degradation):
    //   BMP file size = 54-byte header + 4-byte-padded stride × height
    //   PNG file size = 8 sig + 25 IHDR + (12 + idat) IDAT + 12 IEND
    "q80_multimodal_decode" ->
      """SELECT doc_id,
        | CAST(CASE WHEN doc_id % 2 = 0
        |   THEN 54 + ((3 * (doc_id % 31 + 1) + 3) // 4 * 4)
        |     * (doc_id % 17 + 1)
        |   ELSE 57 + least(64, octet_length(encode(text)))
        | END AS BIGINT) AS n_bytes,
        | CASE WHEN doc_id % 13 = 0 THEN NULL
        |   WHEN doc_id % 2 = 0 THEN 'image/bmp'
        |   ELSE 'image/png' END AS mime,
        | CASE WHEN doc_id % 13 = 0 THEN NULL
        |   ELSE CAST(doc_id % 31 + 1 AS BIGINT) END AS width,
        | CASE WHEN doc_id % 13 = 0 THEN NULL
        |   ELSE CAST(doc_id % 17 + 1 AS BIGINT) END AS height,
        | CASE WHEN doc_id % 13 = 0 THEN NULL
        |   WHEN doc_id % 2 = 0 THEN CAST(3 AS BIGINT)
        |   WHEN doc_id % 4 = 1 THEN CAST(4 AS BIGINT)
        |   ELSE CAST(3 AS BIGINT) END AS channels,
        | CASE WHEN doc_id % 13 = 0 THEN NULL
        |   WHEN doc_id % 2 = 0 THEN CAST(24 AS BIGINT)
        |   ELSE CAST(8 AS BIGINT) END AS bit_depth
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
        |  CASE WHEN doc_id % 13 = 0 THEN NULL
        |    ELSE CAST(floor(224.0 * (doc_id % 17 + 1)
        |      / (doc_id % 31 + 1)) AS BIGINT) END AS resize_h,
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
