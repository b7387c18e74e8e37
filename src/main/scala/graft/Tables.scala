package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog of the driver-generated test tables (TESTDATA.md / FIXTURES.md).
  *
  * Mirrors the reference's table registration surface: the reference engine
  * (apache/auron) consumes Spark's already-resolved `FileSourceScanExec`
  * over parquet (reference: spark-extension/.../AuronConverters.scala:217-223)
  * — our equivalent is a plain `spark.read.parquet` scan, which Catalyst
  * plans with column pruning + predicate pushdown for free.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def df(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as both parquet TIMESTAMP(NANOS) (which
      // Spark's vectorized reader rejects — PARQUET_TYPE_ILLEGAL — so we
      // read it as a raw ns long and floor-divide, matching DuckDB's
      // TIMESTAMP_NS -> TIMESTAMP truncation) and as TIMESTAMP(MICROS)
      // without the UTC flag (which Spark reads as TIMESTAMP_NTZ).
      // Normalize either encoding to session-zoned TimestampType so every
      // downstream query sees one type; session tz is pinned UTC, so the
      // NTZ->LTZ cast is value-preserving and agrees with the oracle.
      import org.apache.spark.sql.functions.{col, timestamp_micros, expr}
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(path(dir, name))
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(path(dir, name))

  /** Register every test table as a temp view for SQL-path queries.
    * Cheap (lazy plans); safe to call repeatedly. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => df(spark, dir, n).createOrReplaceTempView(n))
}

/** A group of named queries plus their DuckDB-oracle SQL (driver contract:
  * column names must match between the Spark result and the oracle result;
  * every aggregate is aliased identically on both sides). */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
