package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink coverage (SURVEY §2.1 rows 1-2, 24-25; §2.7): parquet and
  * ORC write+read round-trips (incl. dynamic-partition parquet write —
  * reference parquet_sink_exec.rs:532 with num_dyn_parts), plus CSV and
  * JSON sources (reference falls back to Spark for these; we support them
  * natively via the built-in DataSource framework).
  *
  * Each round-trip writes a deterministic aggregate to a scratch dir, reads
  * it back through the matching source, and re-sorts; the oracle is the
  * same aggregate straight from the parquet fixtures — proving the sink+
  * source pair is lossless.
  */
object Sinks extends QueryModule {

  private val D2 = DecimalType(18, 2)

  private def scratch(name: String): String = {
    val d = s"/tmp/graft_sink/$name"
    d
  }

  /** Deterministic small aggregate used as the round-trip payload. */
  private def payload(s: SparkSession, dir: String): DataFrame =
    Tables.df(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(D2)).cast(DoubleType).as("sum_qty"),
        count(lit(1)).as("n"))

  private val payloadOracle =
    """SELECT l_returnflag, l_linestatus,
      | CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | count(*) AS n
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Parquet sink with dynamic partitions (partitionBy) + scan-back.
    "q60_parquet_roundtrip" -> { (s, dir) =>
      val out = scratch("parquet")
      payload(s, dir).write.mode("overwrite")
        .partitionBy("l_returnflag").parquet(out)
      s.read.parquet(out)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // SCHEMA DRIFT ingestion (mergeSchema): two parquet batches with
    // different schemas — the later batch grew a column, the exact
    // shape of a crawl pipeline whose extractor gains a field
    // mid-stream. A mergeSchema read unions the schemas by NAME and
    // pads the early batch's missing column with null; the oracle
    // recomputes both batches from the source table. At scale
    // mergeSchema costs one footer read per FILE at planning — bounded
    // by file count, not data.
    "q184_schema_drift" -> { (s, dir) =>
      val base = scratch("drift_" + Integer.toHexString(dir.hashCode))
      val docs = Tables.df(s, dir, "documents")
      docs.filter(col("doc_id") < 100)
        .select(col("doc_id"),
          length(col("text")).cast(LongType).as("n_chars"))
        .write.mode("overwrite").parquet(base + "/b1")
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 200)
        .select(col("doc_id"),
          length(col("text")).cast(LongType).as("n_chars"),
          size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
        .write.mode("overwrite").parquet(base + "/b2")
      s.read.option("mergeSchema", "true")
        .parquet(base + "/b1", base + "/b2")
        .select(col("doc_id"), col("n_chars"), col("n_tokens"))
        .orderBy(col("doc_id"))
    },

    // File PROVENANCE via the _metadata column: which ingestion batch
    // produced each row — training-data governance's first question.
    // The hidden _metadata struct is projected only when referenced
    // (zero cost otherwise); the batch label is the parent directory
    // of the file that physically holds the row.
    "q185_file_provenance" -> { (s, dir) =>
      val base = scratch("drift_" + Integer.toHexString(dir.hashCode))
      // reuse q184's staged batches (rewrite if absent — order of
      // queries in a Verify run is not guaranteed)
      val docs = Tables.df(s, dir, "documents")
      docs.filter(col("doc_id") < 100)
        .select(col("doc_id"),
          length(col("text")).cast(LongType).as("n_chars"))
        .write.mode("overwrite").parquet(base + "/b1")
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 200)
        .select(col("doc_id"),
          length(col("text")).cast(LongType).as("n_chars"),
          size(split(col("text"), " ")).cast(LongType).as("n_tokens"))
        .write.mode("overwrite").parquet(base + "/b2")
      s.read.option("mergeSchema", "true")
        .parquet(base + "/b1", base + "/b2")
        .select(col("doc_id"),
          element_at(split(col("_metadata.file_path"), "/"), -2)
            .as("batch"))
        .groupBy(col("batch"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy(col("batch"))
    },

    // ORC sink + scan.
    "q61_orc_roundtrip" -> { (s, dir) =>
      val out = scratch("orc")
      payload(s, dir).write.mode("overwrite").orc(out)
      s.read.orc(out)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // CSV sink + schema-ful scan (header on, explicit schema back).
    "q62_csv_roundtrip" -> { (s, dir) =>
      val out = scratch("csv")
      payload(s, dir).write.mode("overwrite")
        .option("header", "true").csv(out)
      s.read
        .schema(StructType(Seq(
          StructField("l_returnflag", StringType),
          StructField("l_linestatus", StringType),
          StructField("sum_qty", DoubleType),
          StructField("n", LongType))))
        .option("header", "true").csv(out)
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // JSON-lines sink + scan.
    "q63_json_roundtrip" -> { (s, dir) =>
      val out = scratch("json")
      payload(s, dir).write.mode("overwrite").json(out)
      s.read
        .schema(StructType(Seq(
          StructField("l_returnflag", StringType),
          StructField("l_linestatus", StringType),
          StructField("sum_qty", DoubleType),
          StructField("n", LongType))))
        .json(out)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Avro sink + scan (row-oriented container format). This distribution
    // bundles the avro classes in spark-sql but omits the
    // DataSourceRegister service entry, so the format is addressed by
    // class name instead of the "avro" shortname. Snappy-compressed
    // blocks are splittable, so reads parallelize at scale like the
    // columnar sources above.
    "q106_avro_roundtrip" -> { (s, dir) =>
      val fmt = "org.apache.spark.sql.avro.AvroFileFormat"
      val out = scratch("avro")
      payload(s, dir).write.mode("overwrite").format(fmt).save(out)
      s.read.format(fmt).load(out)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Avro WIRE codec (vs q106's file format): each row's struct is
    // serialized to ONE Avro binary datum and decoded downstream — the
    // Kafka-payload pattern. This distro omits the from_avro/to_avro
    // wire expressions (AVRO_NOT_LOADED), so the codec runs on the
    // public avro-java API (functions/AvroWire.scala). The result
    // groups on the DECODED record's fields, so a codec fault (dropped
    // field, wrong zig-zag varint, truncated datum) changes the
    // histogram and goes red.
    "q297_avro_wire" -> { (s, dir) =>
      val enc = udf(graft.functions.AvroWire.encode _)
      val dec = udf(graft.functions.AvroWire.decode _)
      Tables.df(s, dir, "events")
        .select(enc(col("event_type"), col("user_id")).as("wire"))
        .select(dec(col("wire")).as("back"))
        .groupBy(col("back.event_type").as("g"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("back.user_id")).as("n_users"))
        .orderBy(col("g"))
    },

    // Malformed-record ingestion modes: the PERMISSIVE /
    // DROPMALFORMED contract every raw-corpus crawl hits. A mixed
    // good/corrupt JSONL file is materialized, then read (a) PERMISSIVE
    // with columnNameOfCorruptRecord — corrupt lines surface as rows
    // whose data columns are NULL and whose _bad column carries the
    // raw line; (b) DROPMALFORMED — corrupt lines vanish. Counts are
    // deterministic because the file content is authored here. At
    // scale this is per-line parser behavior — splittable, no shuffle.
    "q301_malformed_ingest" -> { (s, dir) =>
      import org.apache.spark.sql.types._
      val out = scratch("badjson")
      val lines = Seq(
        """{"k": 1, "v": "alpha"}""",
        """{"k": 2, "v": "beta"}""",
        """{"k": OOPS not json""",
        """{"k": 3, "v": "gamma"}""",
        """also not json""",
        """{"k": "four", "v": "delta"}""")
      import s.implicits._
      s.createDataset(lines).coalesce(1)
        .write.mode("overwrite").text(out)
      val schema = StructType(Seq(
        StructField("k", LongType), StructField("v", StringType),
        StructField("_bad", StringType)))
      val permissive = s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(out)
      val dropped = s.read
        .schema(StructType(schema.fields.filter(_.name != "_bad")))
        .option("mode", "DROPMALFORMED").json(out)
      permissive.agg(
          count(lit(1)).as("n_total"),
          sum(when(col("_bad").isNotNull, 1).otherwise(0)).as("n_bad"),
          sum(col("k")).as("sum_good_k"))
        .crossJoin(dropped.agg(count(lit(1)).as("n_dropmalformed")))
    },

    // XML sink + scan (Spark 4 ships the spark-xml donation in-core).
    // Schema-ful read back: XML has no native long/double, so types are
    // declared on the scan exactly like the CSV/JSON sources above.
    "q107_xml_roundtrip" -> { (s, dir) =>
      val out = scratch("xml")
      payload(s, dir).write.mode("overwrite")
        .option("rowTag", "row").format("xml").save(out)
      s.read
        .schema(StructType(Seq(
          StructField("l_returnflag", StringType),
          StructField("l_linestatus", StringType),
          StructField("sum_qty", DoubleType),
          StructField("n", LongType))))
        .option("rowTag", "row").format("xml").load(out)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Text sink + scan (the line-oriented source: one string column per
    // line — what raw-corpus ingestion reads before any parsing). The
    // payload is self-delimited with \u0001 and re-split on read; the
    // 2-dp sum rides through a DECIMAL-string so the double survives the
    // text round-trip exactly.
    "q122_text_roundtrip" -> { (s, dir) =>
      val out = scratch("text")
      payload(s, dir)
        .select(concat_ws("\u0001", col("l_returnflag"),
          col("l_linestatus"), col("sum_qty").cast(D2).cast(StringType),
          col("n").cast(StringType)).as("value"))
        .write.mode("overwrite").text(out)
      s.read.text(out)
        .select(split(col("value"), "\u0001").as("f"))
        .select(element_at(col("f"), 1).as("l_returnflag"),
          element_at(col("f"), 2).as("l_linestatus"),
          element_at(col("f"), 3).cast(DoubleType).as("sum_qty"),
          element_at(col("f"), 4).cast(LongType).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }
  )

  override def oracle: Map[String, String] = Map(
    "q60_parquet_roundtrip" -> payloadOracle,
    "q61_orc_roundtrip" -> payloadOracle,
    "q62_csv_roundtrip" -> payloadOracle,
    "q63_json_roundtrip" -> payloadOracle,
    "q106_avro_roundtrip" -> payloadOracle,
    "q297_avro_wire" ->
      """SELECT event_type AS g, count(*) AS n,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // n_dropmalformed = 4: DROPMALFORMED drops only records that fail
    // to PARSE. {"k":"four"} is syntactically valid JSON whose k fails
    // type CONVERSION — Spark keeps the row with k=null (permissive
    // per-field null-out), so 4 of 6 survive, not 3. Pinned to Spark's
    // documented parse-vs-convert distinction (round-9 verdict).
    "q301_malformed_ingest" ->
      """SELECT CAST(6 AS BIGINT) AS n_total,
        |  CAST(3 AS BIGINT) AS n_bad,
        |  CAST(6 AS BIGINT) AS sum_good_k,
        |  CAST(4 AS BIGINT) AS n_dropmalformed""".stripMargin,
    "q107_xml_roundtrip" -> payloadOracle,
    "q122_text_roundtrip" -> payloadOracle,
    "q184_schema_drift" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |  CASE WHEN doc_id >= 100
        |    THEN CAST(len(string_split(text, ' ')) AS BIGINT) END
        |    AS n_tokens
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,
    "q185_file_provenance" ->
      """SELECT 'b1' AS batch, count(*) AS n_docs,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents WHERE doc_id < 100
        |UNION ALL
        |SELECT 'b2' AS batch, count(*) AS n_docs,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents WHERE doc_id >= 100 AND doc_id < 200
        |ORDER BY batch""".stripMargin
  )
}
