package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-recovery durability: a stateful streaming aggregation
  * stopped and RESTARTED from its checkpoint must (a) resume the
  * aggregation state (totals include pre-restart data) and (b) process
  * only files that arrived after the stop — the exactly-once contract
  * that makes long-running production streams survive executor or
  * driver loss. */
class StreamingRecoverySpec extends AnyFunSuite {
  import TestSession._

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Write `df` as a single parquet file named `name` inside `dir`. */
  private def addFile(df: org.apache.spark.sql.DataFrame, dir: Path,
                      name: String): Unit = {
    val tmp = Files.createTempDirectory("graft_ckpt_stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString
      .endsWith(".parquet")).findFirst().get()
    Files.move(part, dir.resolve(name))
  }

  test("stateful aggregation restarts from its checkpoint: state " +
    "resumes, already-read files are not reprocessed") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = Files.createTempDirectory("graft_ckpt")
    val input = Files.createDirectories(base.resolve("in"))
    val ckpt = base.resolve("ckpt").toString

    val events = spark.read.schema(eventsSchema)
      .parquet(sf + "/events.parquet")
    val early = events.filter(col("event_id") % 2 === 0)
    val late = events.filter(col("event_id") % 2 =!= 0)
    addFile(early, input, "a.parquet")

    def runOnce(sinkName: String): Map[String, Long] = {
      val agg = spark.readStream.schema(eventsSchema)
        .parquet(input.toString)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val q = agg.writeStream.outputMode(OutputMode.Complete())
        .option("checkpointLocation", ckpt)
        .format("memory").queryName(sinkName).start()
      try q.processAllAvailable() finally q.stop()
      spark.table(sinkName).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }

    val run1 = runOnce("ckpt_run1")
    val expectEarly = early.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run1 == expectEarly, "first run must aggregate file A")

    addFile(late, input, "b.parquet")
    val run2 = runOnce("ckpt_run2")
    val expectAll = events.groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(run2 == expectAll,
      "restart must RESUME state: totals include pre-restart data")

    // the checkpoint's file log must show file A was not re-read: the
    // restarted query's input total equals file B's row count
    val lateN = late.count()
    val sourcesLog = Files.list(Paths.get(ckpt, "sources", "0")).count()
    assert(sourcesLog >= 2, "file-source log must record both batches")
    assert(run2.values.sum - run1.values.sum == lateN,
      "restart must process exactly the new file's rows")
  }
}
