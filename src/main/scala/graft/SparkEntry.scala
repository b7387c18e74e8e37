package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-category query modules. Every SURVEY §2 operator has
  * at least one entry in `queries`; SQL-expressible ones also appear in
  * `oracleSql` (DuckDB-runnable, column names aligned with the Spark side).
  */
object SparkEntry {
  private val modules: Seq[QueryModule] = Seq(
    Relational, Joins, Aggregates, Windows, Functions, Functions2,
    Generate, Sinks, Storage, Collections, Pipeline, Pipeline2, Pipeline3,
    Pipeline4, Pipeline5, Pipeline6, Similarity, Connectors, Warehouse,
    CastMatrix,
    Multimodal, Extensibility, Analytics, Analytics2, Analytics3,
    Analytics4, Analytics5, Sketches, Functions3, TpcdsShapes,
    graft.streaming.Streaming
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap
}
