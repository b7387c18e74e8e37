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
    "q107_xml_roundtrip" -> payloadOracle,
    "q122_text_roundtrip" -> payloadOracle
  )
}
