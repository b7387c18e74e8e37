package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: only dump queries whose name starts with it
    // (fast local gate iteration; the driver always passes 2 args)
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, None)
      case Array(a, b, c) => (a, b, Some(c))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // keep catalog state out of the launch CWD even when run outside
      // sbt (whose javaOptions normally pin these)
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      // r20 post-mortem: two queries vanished from the driver's verify
      // (q392/q497) yet pass on the identical tree, fresh /tmp, same
      // cpus — the only uncontrolled variable is co-tenant load, and a
      // loaded box can push a broadcast build past the 300 s default
      // and throw. The dump is a correctness surface, not a timed one:
      // give slow-box broadcasts 30 min before declaring failure.
      .config("spark.sql.broadcastTimeout", "1800")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Per-query failures must be VISIBLE to the driver: stderr is
    // truncated to a 2000-char tail, so r20's two driver-side fixture
    // failures (q392/q497) left no trace. Collect name → stack trace
    // and persist $outDir/_errors.json alongside the dumps.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(name.startsWith) }
      .foreach { case (name, fn) =>
      def once(): Unit = fn(spark, sfDir).coalesce(1).write
        .mode("overwrite").parquet(s"$outDir/$name")
      def trace(e: Throwable): String = {
        val sw = new java.io.StringWriter()
        e.printStackTrace(new java.io.PrintWriter(sw))
        sw.toString
      }
      // One retry per query: the dump is deterministic, so a second
      // attempt only changes the outcome when the first failure was
      // transient (loaded-box timeout, fetch failure). A query that
      // fails twice is genuinely broken and both traces are persisted.
      try once()
      catch { case e1: Throwable =>
        System.err.println(
          s"[verify] $name failed (attempt 1, retrying): ${e1.getMessage}")
        try once()
        catch { case e2: Throwable =>
          errors(name) =
            s"attempt 1:\n${trace(e1)}\nattempt 2:\n${trace(e2)}"
          System.err.println(s"[verify] $name failed: ${e2.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(
        s"[verify] ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
