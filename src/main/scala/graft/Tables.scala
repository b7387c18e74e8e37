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
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects (PARQUET_TYPE_ILLEGAL). Read it as a raw ns long and
      // rebuild a microsecond TimestampType column (floor division matches
      // DuckDB's TIMESTAMP_NS -> TIMESTAMP truncation, so oracle SQL can
      // compare on CAST(ts AS TIMESTAMP)).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(path(dir, name))
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
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
