package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** One vectorized scan over a homogeneous columnar file set — parquet
  * or ORC — shared by the lakehouse readers (Paimon's DEFAULT
  * file.format is orc; Hudi deployments set
  * hoodie.table.base.file.format=ORC; Iceberg data_files carry a
  * file_format). Both formats keep Spark's native vectorized reader,
  * pushdown, pruning and whole-stage codegen. A MIXED set (a mid-life
  * format switch) is refused: splitting into two scans would silently
  * change scan-level semantics, and lite readers never guess. */
object ColumnarScan {
  def apply(spark: SparkSession, tableDir: String,
            schema: Option[StructType], files: Seq[String]): DataFrame = {
    val (orc, rest) = files.partition(_.endsWith(".orc"))
    val (parquet, unknown) = rest.partition(_.endsWith(".parquet"))
    if (unknown.nonEmpty) throw new IllegalStateException(
      s"$tableDir: data files with an unrecognized extension " +
        s"(${unknown.take(3).mkString(", ")}) — parquet and orc only")
    if (orc.nonEmpty && parquet.nonEmpty) throw new IllegalStateException(
      s"$tableDir: mixed parquet+orc data files in one snapshot " +
        s"(${parquet.size} parquet, ${orc.size} orc) — a mid-life " +
        "format switch is outside lite scope")
    val reader = schema.map(spark.read.schema).getOrElse(spark.read)
    if (orc.nonEmpty) reader.orc(orc: _*) else reader.parquet(parquet: _*)
  }
}
