package graft.sources

import org.apache.spark.sql.SparkSession

/** ONE distributed pass over a bounded file list collecting per-file
  * footer facts (top-level column names; parquet field ids) — the
  * scale-safe replacement for per-file sequential driver loops. Each
  * file's footer is opened EXECUTOR-SIDE (one task per file, fan-out
  * capped at the cluster's parallelism); the collect returns one
  * small tuple per file — O(files) names on the driver, never
  * O(files) serial round-trips. Used by [[IcebergLite]] for the ORC
  * rename guard and the name-mapping classification of id-less
  * parquet files (reference surface: thirdparty/auron-iceberg reads
  * through the Iceberg library, which consults the same footers via
  * its own distributed planning).
  */
object FooterSweep {

  private def slices(spark: SparkSession, n: Int): Int =
    math.min(n, spark.sparkContext.defaultParallelism).max(1)

  /** Per ORC file: its top-level column names, read executor-side via
    * orc-core (`OrcFile.createReader`). */
  def orcColumns(spark: SparkSession,
                 files: Seq[String]): Map[String, Seq[String]] = {
    if (files.isEmpty) return Map.empty
    spark.sparkContext
      .parallelize(files, slices(spark, files.size))
      .map { f =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val reader = org.apache.orc.OrcFile.createReader(
          new org.apache.hadoop.fs.Path(f),
          org.apache.orc.OrcFile.readerOptions(conf))
        try f -> {
          import scala.jdk.CollectionConverters._
          reader.getSchema.getFieldNames.asScala.toVector
        } finally reader.close()
      }
      .collect().toMap
  }

  /** Per parquet file: its top-level (column name, stored field id)
    * pairs, read executor-side via parquet-hadoop
    * (`ParquetFileReader.open`). A field without a stored id maps to
    * None — the caller decides whether that means field-id
    * resolution, name mapping, or a refusal. */
  def parquetFields(spark: SparkSession, files: Seq[String])
  : Map[String, Seq[(String, Option[Int])]] = {
    if (files.isEmpty) return Map.empty
    spark.sparkContext
      .parallelize(files, slices(spark, files.size))
      .map { f =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new org.apache.hadoop.fs.Path(f), conf)
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try f -> {
          import scala.jdk.CollectionConverters._
          reader.getFooter.getFileMetaData.getSchema.getFields.asScala
            .map(t => t.getName ->
              Option(t.getId).map(_.intValue())).toVector
        } finally reader.close()
      }
      .collect().toMap
  }
}
