package graft.streaming

import graft.QueryModule
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

/** Structured Streaming coverage (SURVEY §7.2 step 9 — exceeds the
  * reference, whose only streaming piece is the Flink Kafka scan,
  * auron.proto:780-807): file-source stream → event-time windows +
  * watermark → memory sink, plus mapGroupsWithState sessionization.
  *
  * Batch-equivalence: each query drains the bounded events stream with
  * processAllAvailable(), so results equal the batch computation and the
  * DuckDB oracle can check them. At scale the same code runs against a
  * Kafka source (`readStream.format("kafka")` + from_json) — swap the
  * source, keep the pipeline.
  */
/** StatefulProcessor for q140: per-user gap sessionization with a
  * single named ValueState holding (lastTs, nEvents, nSessions) —
  * O(1) per key regardless of stream length. Batch rows are sorted
  * locally (bounded by batch size); the drained bounded fixture is a
  * single batch, so output equals the batch gap-split oracle. */
class SessionProcessor(gapUs: Long)
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {
  @transient private var state: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Long, Long)]("sess",
      Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                               timers: TimerValues): Iterator[(Long, Long, Long)] = {
    var (lastTs, nEvents, nSessions) =
      if (state.exists()) state.get() else (Long.MinValue, 0L, 0L)
    val batch = rows.map(_._2).toArray
    java.util.Arrays.sort(batch)
    batch.foreach { t =>
      if (nEvents == 0L) nSessions = 1L
      else if (t - lastTs > gapUs) nSessions += 1L
      nEvents += 1L
      if (t > lastTs) lastTs = t
    }
    state.update((lastTs, nEvents, nSessions))
    Iterator.single((key, nEvents, nSessions))
  }
}

object Streaming extends QueryModule {

  private val D2 = DecimalType(18, 2)

  /** events schema for readStream (ts arrives as raw ns long because
    * Spark rejects parquet TIMESTAMP(NANOS) — see Tables.df). */
  private def eventsSchema(tsType: org.apache.spark.sql.types.DataType) =
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

  private def eventStream(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The file stream source requires a DIRECTORY; stage a symlink dir
    // pointing at the single events.parquet fixture.
    val stage = java.nio.file.Paths.get(
      "/tmp/graft_stream", Integer.toHexString(dir.hashCode))
    java.nio.file.Files.createDirectories(stage)
    val link = stage.resolve("events.parquet")
    if (!java.nio.file.Files.exists(link))
      java.nio.file.Files.createSymbolicLink(
        link, java.nio.file.Paths.get(dir, "events.parquet"))
    // Match the fixture's ts encoding (see Tables.df): NANOS reads as a
    // raw ns long, MICROS-without-UTC reads as TIMESTAMP_NTZ. Sniff the
    // footer with a one-off batch read so the stream schema agrees.
    val tsType = s.read.parquet(
      graft.Tables.path(dir, "events")).schema("ts").dataType
    val src = s.readStream.schema(eventsSchema(tsType)).parquet(stage.toString)
    tsType match {
      case LongType =>
        src.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        src.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => src
    }
  }

  /** End-of-stream finalization base for the purchase/click outer
    * stream-stream joins. Each side's watermark tracks the max event
    * time of ITS OWN type-filtered stream (EventTimeWatermarkExec sits
    * above the filter), and the join advances on the MIN of the two —
    * so the "must have finalized" cut has to be measured from
    * least(max purchase ts, max click ts), NOT the global max over all
    * events. At sf0.001 the last click lands 4 h before the last
    * purchase; a cut from the global max demands rows the engine
    * provably cannot have evicted yet (final watermark = last click −
    * 1 h, click-state eviction a further 30 min behind it). */
  private def outerJoinWatermarkBase(s: SparkSession, dir: String): DataFrame =
    graft.Tables.df(s, dir, "events")
      .agg(least(
        max(when(col("event_type") === "purchase", unix_micros(col("ts")))),
        max(when(col("event_type") === "click", unix_micros(col("ts"))))
      ).as("mx"))

  /** Run `body` with bounded-drain confs applied and restored after:
    * shuffle partitions capped (each stateful partition carries a state
    * store — 32 stores for one bounded file is pure overhead) and
    * no-data micro-batches disabled (inner joins and Complete/Update
    * aggregations emit on data batches; the trailing watermark-only tick
    * is fixed overhead here). Restoring matters: an Append-mode windowed
    * aggregate elsewhere NEEDS no-data ticks to finalize windows, and
    * batch queries on the shared session need their own partition conf. */
  private def withDrainConfs[T](s: SparkSession, parts: Int)(body: => T): T = {
    val partKey = "spark.sql.shuffle.partitions"
    val tickKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val savedParts = s.conf.get(partKey)
    val savedTick = s.conf.get(tickKey, "true")
    if (savedParts.toInt > parts) s.conf.set(partKey, parts.toString)
    s.conf.set(tickKey, "false")
    try body finally {
      s.conf.set(partKey, savedParts)
      s.conf.set(tickKey, savedTick)
    }
  }

  /** Run a bounded streaming query to completion on a memory sink and
    * return the materialized table. */
  private def drain(df: DataFrame, s: SparkSession, name: String,
                    mode: OutputMode): DataFrame = {
    withDrainConfs(s, parts = 2) {
      val q = df.writeStream.outputMode(mode)
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    }
    s.table(name)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Trigger.AvailableNow — the production batch-catchup trigger:
    // process everything currently available across (possibly several
    // rate-limited) micro-batches, then STOP on its own, unlike
    // processAllAvailable's test-only blocking drain. awaitTermination
    // returning (not q.stop()) is the proof the trigger self-terminated.
    // maxFilesPerTrigger=1 would still drain fully — AvailableNow
    // snapshots the target offset up front.
    "q270_stream_available_now" -> { (s, dir) =>
      val agg = eventStream(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(D2)).cast(DoubleType).as("sum_v"))
      withDrainConfs(s, parts = 2) {
        val q = agg.writeStream
          .outputMode(OutputMode.Complete())
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .format("memory").queryName("q270_sink").start()
        q.awaitTermination(120000)
      }
      s.table("q270_sink").orderBy(col("event_type"))
    },

    // Tumbling 1h event-time window + watermark per event_type.
    "q85_stream_tumbling" -> { (s, dir) =>
      val agg = eventStream(s, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(D2)).cast(DoubleType).as("sum_v"))
        .select(unix_micros(col("w.start")).as("w_start"),
          col("event_type"), col("n"), col("sum_v"))
      drain(agg, s, "q85_sink", OutputMode.Complete())
        .orderBy(col("w_start"), col("event_type"))
    },

    // Stream-STATIC enrichment join — the production pattern for
    // joining a stream against a dimension table: the static side is a
    // plain batch DataFrame joined per micro-batch (STATELESS — no
    // watermark constraint, no state store; the dim broadcasts), here
    // customer market segments keyed by user id, followed by a
    // tumbling-window revenue-per-segment aggregation. At scale the
    // static side re-resolves per batch, so a slowly-refreshed dim
    // parquet is picked up without restarting the stream.
    "q159_stream_static_enrich" -> { (s, dir) =>
      val dim = graft.Tables.df(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("segment"))
      val agg = eventStream(s, dir)
        .filter(col("event_type") === "purchase")
        .join(broadcast(dim), col("user_id") === col("c_custkey"))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("segment"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(D2)).cast(DoubleType).as("sum_v"))
        .select(unix_micros(col("w.start")).as("w_start"), col("segment"),
          col("n"), col("sum_v"))
      drain(agg, s, "q159_sink", OutputMode.Complete())
        .orderBy(col("w_start"), col("segment"))
    },

    // Sliding 2h window, 1h slide (each event in two windows).
    "q86_stream_sliding" -> { (s, dir) =>
      val agg = eventStream(s, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(D2)).cast(DoubleType).as("sum_v"))
        .select(unix_micros(col("w.start")).as("w_start"), col("n"),
          col("sum_v"))
      drain(agg, s, "q86_sink", OutputMode.Complete())
        .orderBy(col("w_start"))
    },

    // Sliding-window DISTINCT users, streaming twin of batch q245:
    // CHAINED stateful operators (Spark 3.5+/4) — dropDuplicates on
    // (user, window) dedups each user once per sliding window, then the
    // windowed count aggregates the survivors. The window struct
    // carries event time, so dedup state evicts with the watermark
    // instead of growing forever; the sliding window() projection
    // expands each event into its <=3 covering windows (the same
    // bounded fan-out as q245's batch rewrite).
    "q250_stream_sliding_distinct" -> { (s, dir) =>
      val agg = eventStream(s, dir)
        .withWatermark("ts", "1 hour")
        .select(col("ts"), col("user_id"),
          window(col("ts"), "3 hours", "1 hour").as("w"))
        .dropDuplicates("user_id", "w")
        .groupBy(col("w"))
        .agg(count(lit(1)).as("n_users"))
        .select(unix_micros(col("w.start")).as("w_start"), col("n_users"))
      drain(agg, s, "q250_sink", OutputMode.Complete())
        .orderBy(col("w_start"))
    },

    // Streaming -> file sink via foreachBatch (the production path for
    // stream-to-lake writes): each micro-batch lands as parquet, result
    // read back from the files. Oracle = the equivalent batch aggregate.
    "q88_stream_foreachbatch" -> { (s, dir) =>
      val out = "/tmp/graft_stream_sink/q88"
      val agg = eventStream(s, dir)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(D2)).cast(DoubleType).as("sum_v"))
      withDrainConfs(s, parts = 8) {
        val q = agg.writeStream
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            batch.write.mode("overwrite").parquet(out)
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      s.read.parquet(out).orderBy(col("event_type"))
    },

    // Streaming CDC apply: each micro-batch pre-aggregates its slice
    // and MERGEs it into a DSv2 catalog table through the
    // SupportsRowLevelOperations seam (q191's engine) — the streaming
    // lakehouse-upsert pattern Iceberg/Hudi users run for change
    // feeds. The MERGE is ADDITIVE (matched rows accumulate n/sum_v),
    // so the final table state is independent of how the stream was
    // batched — correctness by algebra, not by trigger luck. Oracle =
    // the equivalent batch census; output rounds the accumulated
    // double through DECIMAL(18,2) to absorb cross-batch add order.
    "q313_stream_cdc_merge" -> { (s, dir) =>
      s.conf.set("spark.sql.catalog.graft_cat",
        "graft.sources.GraftCatalog")
      s.sql("DROP TABLE IF EXISTS graft_cat.default.cdc_q313")
      s.sql("CREATE TABLE graft_cat.default.cdc_q313 " +
        "(et STRING, user_id BIGINT, n BIGINT, sum_v DOUBLE) " +
        "PARTITIONED BY (et)")
      val src = eventStream(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type"), col("user_id"), col("value"))
      withDrainConfs(s, parts = 8) {
        val q = src.writeStream
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             _: Long) =>
              // The micro-batch runs in a CLONED session whose catalog
              // plugin is a fresh instance (per-session ident registry)
              // — so stage the batch as a GLOBAL temp view and run the
              // MERGE on the OUTER session, where graft_cat holds the
              // table. This is also the production-correct direction:
              // the lakehouse catalog belongs to the driver session,
              // not to a per-trigger clone.
              batch.groupBy(col("event_type").as("et"), col("user_id"))
                .agg(count(lit(1)).as("bn"),
                  sum(col("value").cast(D2)).cast(DoubleType).as("bv"))
                .createOrReplaceGlobalTempView("cdc_src_q313")
              s.sql(
                """MERGE INTO graft_cat.default.cdc_q313 t
                  |USING global_temp.cdc_src_q313 s
                  |ON t.et = s.et AND t.user_id = s.user_id
                  |WHEN MATCHED THEN UPDATE SET
                  |  n = t.n + s.bn, sum_v = t.sum_v + s.bv
                  |WHEN NOT MATCHED THEN INSERT (et, user_id, n, sum_v)
                  |  VALUES (s.et, s.user_id, s.bn, s.bv)""".stripMargin)
              ()
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      s.sql("""SELECT et, user_id, n,
        |  CAST(CAST(sum_v AS DECIMAL(18,2)) AS DOUBLE) AS sum_v
        |FROM graft_cat.default.cdc_q313
        |ORDER BY et, user_id""".stripMargin)
    },

    // MULTI-batch CDC apply — q313 exercised the streaming-MERGE seam
    // in one trigger; this stages the event log as THREE user-hashed
    // parquet slices and drains with maxFilesPerTrigger=1, so the
    // additive MERGE provably accumulates across 3 separate triggers
    // (matched keys take the UPDATE arm on later batches). Same final
    // census as the batch oracle — batching-independence exercised,
    // not just argued. Covers ALL event types (q313: two).
    "q319_stream_cdc_multibatch" -> { (s, dir) =>
      s.conf.set("spark.sql.catalog.graft_cat",
        "graft.sources.GraftCatalog")
      s.sql("DROP TABLE IF EXISTS graft_cat.default.cdc_q319")
      s.sql("CREATE TABLE graft_cat.default.cdc_q319 " +
        "(et STRING, user_id BIGINT, n BIGINT, sum_v DOUBLE) " +
        "PARTITIONED BY (et)")
      val stage = "/tmp/graft_stream/q319_" +
        Integer.toHexString(dir.hashCode)
      val batchEv = graft.Tables.df(s, dir, "events")
        .select(col("event_type"), col("user_id"), col("value"))
      batchEv.repartition(3, col("user_id"))
        .write.mode("overwrite").parquet(stage)
      val src = s.readStream.schema(batchEv.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
      withDrainConfs(s, parts = 8) {
        val q = src.writeStream
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             _: Long) =>
              batch.groupBy(col("event_type").as("et"), col("user_id"))
                .agg(count(lit(1)).as("bn"),
                  sum(col("value").cast(D2)).cast(DoubleType).as("bv"))
                .createOrReplaceGlobalTempView("cdc_src_q319")
              s.sql(
                """MERGE INTO graft_cat.default.cdc_q319 t
                  |USING global_temp.cdc_src_q319 s
                  |ON t.et = s.et AND t.user_id = s.user_id
                  |WHEN MATCHED THEN UPDATE SET
                  |  n = t.n + s.bn, sum_v = t.sum_v + s.bv
                  |WHEN NOT MATCHED THEN INSERT (et, user_id, n, sum_v)
                  |  VALUES (s.et, s.user_id, s.bn, s.bv)""".stripMargin)
              ()
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      s.sql("""SELECT et, user_id, n,
        |  CAST(CAST(sum_v AS DECIMAL(18,2)) AS DOUBLE) AS sum_v
        |FROM graft_cat.default.cdc_q319
        |ORDER BY et, user_id""".stripMargin)
    },

    // OutputMode.UPDATE + changelog capture — the third output mode
    // (q85 Append, q88 Complete): each trigger emits only the keys
    // whose aggregate CHANGED, and foreachBatch lands those deltas
    // with their batch id as an append-only changelog — the
    // stream-to-CDC-topic pattern. Reading the table back as
    // latest-per-key (max batch id wins) must equal the batch census
    // no matter how the 3 staged slices batched — the changelog
    // replay contract, oracle-gated.
    "q362_stream_update_changelog" -> { (s, dir) =>
      val out = "/tmp/graft_stream_sink/q362_" +
        Integer.toHexString(dir.hashCode)
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(out))
      val stage = "/tmp/graft_stream/q362_" +
        Integer.toHexString(dir.hashCode)
      val batchEv = graft.Tables.df(s, dir, "events")
        .select(col("event_type"), col("user_id"), col("value"))
      batchEv.repartition(3, col("user_id"))
        .write.mode("overwrite").parquet(stage)
      val agg = s.readStream.schema(batchEv.schema)
        .option("maxFilesPerTrigger", 1).parquet(stage)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(D2)).cast(DoubleType).as("sum_v"))
      withDrainConfs(s, parts = 8) {
        val q = agg.writeStream
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             bid: Long) =>
              batch.withColumn("batch_id", lit(bid))
                .write.mode("append").parquet(out)
              ()
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("batch_id").desc)
      s.read.parquet(out)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("event_type").as("et"), col("n"),
          (col("sum_v").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("sum_v"))
        .orderBy(col("et"))
    },

    // Streaming deduplication: dropDuplicates over a key set keeps the
    // first arrival per key in state — the streaming half of the dedup
    // pipeline (batch half: q72/q75). Output = the distinct key set.
    "q89_stream_dedup" -> { (s, dir) =>
      val dedup = eventStream(s, dir)
        .select(col("user_id"), col("event_type"))
        .dropDuplicates("user_id", "event_type")
      drain(dedup, s, "q89_sink",
          org.apache.spark.sql.streaming.OutputMode.Append())
        .orderBy(col("user_id"), col("event_type"))
    },

    // dropDuplicatesWithinWatermark (Spark 3.5+): dedup where the state
    // for a key is EVICTED once the watermark passes it — bounded state
    // for unbounded streams, the production-correct streaming dedup
    // (plain dropDuplicates state grows forever). Bounded fixture:
    // every duplicate pair sits within the delay, so the result equals
    // the batch distinct.
    "q144_stream_dedup_watermark" -> { (s, dir) =>
      val dedup = eventStream(s, dir)
        .withWatermark("ts", "2 hours")
        .select(col("user_id"), col("event_type"), col("ts"))
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select(col("user_id"), col("event_type"))
      drain(dedup, s, "q144_sink", OutputMode.Append())
        .orderBy(col("user_id"), col("event_type"))
    },

    // Stream-stream inner join with a time-range condition: purchases
    // joined to same-user clicks within the preceding 30 minutes.
    // Watermarks bound both join states; draining the bounded stream
    // yields the full deterministic pair set (= the batch range join).
    "q104_stream_stream_join" -> { (s, dir) =>
      val p = eventStream(s, dir)
        .filter(col("event_type") === "purchase")
        .withWatermark("ts", "1 hour")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("p_id"))
      val c = eventStream(s, dir)
        .filter(col("event_type") === "click")
        .withWatermark("ts", "1 hour")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
      val joined = p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("c_ts") <= col("p_ts"))
        .select(col("p_id"), col("c_id"))
      drain(joined, s, "q104_sink",
          org.apache.spark.sql.streaming.OutputMode.Append())
        .orderBy(col("p_id"), col("c_id"))
    },

    // Stream-stream LEFT SEMI join — completes the stream-stream join
    // matrix (q104 inner, q188 left outer, q198 full outer): "purchases
    // with at least one click in the preceding 30 min", emitted ONCE
    // per purchase. Semi rows emit when their first match ARRIVES (not
    // on watermark eviction — the watermark only bounds right-side
    // state), so over a fully-drained bounded input the result equals
    // the batch EXISTS exactly and the oracle needs no end-of-stream
    // boundary cut, unlike the outer variants. State at scale: right
    // side keeps clicks only within the 30-min constraint window,
    // left side drops a purchase the moment it matches.
    "q208_stream_stream_semi" -> { (s, dir) =>
      val p = eventStream(s, dir)
        .filter(col("event_type") === "purchase")
        .withWatermark("ts", "1 hour")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("p_id"))
      val c = eventStream(s, dir)
        .filter(col("event_type") === "click")
        .withWatermark("ts", "1 hour")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
      val joined = p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("c_ts") <= col("p_ts"),
        "left_semi")
        .select(col("p_id"), col("p_user"))
      drain(joined, s, "q208_sink",
          org.apache.spark.sql.streaming.OutputMode.Append())
        .orderBy(col("p_id"))
    },

    // Stream-stream LEFT OUTER join — q104's inner join plus the
    // null-padded unmatched purchases, which the engine can emit only
    // after the WATERMARK closes a row's match window (the state
    // eviction that makes outer stream joins bounded-memory at scale).
    // End-of-stream subtlety: outer rows finalize on a no-data
    // micro-batch advancing the watermark to max(event time) − delay,
    // so this drain keeps noDataMicroBatches ENABLED (the shared drain
    // turns them off), and rows within (delay + margin) of the
    // stream's end are excluded from the comparison ON BOTH SIDES —
    // their emission depends on Spark's exact eviction boundary, which
    // is not a contract worth pinning. Everything older MUST have
    // finalized, and the oracle checks exactly that region. The cut is
    // measured from outerJoinWatermarkBase (least per-side max), which
    // is what actually bounds the final watermark — see its doc.
    "q188_stream_stream_outer" -> { (s, dir) =>
      val p = eventStream(s, dir)
        .filter(col("event_type") === "purchase")
        .withWatermark("ts", "1 hour")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("p_id"))
      val c = eventStream(s, dir)
        .filter(col("event_type") === "click")
        .withWatermark("ts", "1 hour")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
      val joined = p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("c_ts") <= col("p_ts"),
        "left_outer")
        .select(col("p_id"), col("p_ts"), col("c_id"))
      val partKey = "spark.sql.shuffle.partitions"
      val savedParts = s.conf.get(partKey)
      if (savedParts.toInt > 2) s.conf.set(partKey, "2")
      try {
        val q = joined.writeStream
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .format("memory").queryName("q188_sink").start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set(partKey, savedParts)
      s.table("q188_sink")
        .crossJoin(broadcast(outerJoinWatermarkBase(s, dir)))
        .filter(unix_micros(col("p_ts")) <= col("mx") - 7200000000L)
        .select(col("p_id"), col("c_id"))
        .orderBy(col("p_id"), col("c_id"))
    },

    // Stream-stream FULL OUTER join — completes the outer family
    // (q104 inner, q188 left): BOTH sides hold state and BOTH emit
    // null-padded rows on watermark eviction — unmatched purchases
    // (no click in the preceding 30 min) AND unmatched clicks (no
    // purchase in the following 30 min). Same end-of-stream contract
    // as q188, applied per SIDE: a row is compared only if every
    // non-null timestamp in it is older than delay+margin; for matched
    // rows c_ts <= p_ts, so the p-side cut subsumes the c-side one.
    "q198_stream_stream_fullouter" -> { (s, dir) =>
      val p = eventStream(s, dir)
        .filter(col("event_type") === "purchase")
        .withWatermark("ts", "1 hour")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("p_id"))
      val c = eventStream(s, dir)
        .filter(col("event_type") === "click")
        .withWatermark("ts", "1 hour")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
      val joined = p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES") &&
          col("c_ts") <= col("p_ts"),
        "full_outer")
        .select(col("p_id"), col("p_ts"), col("c_id"), col("c_ts"))
      val partKey = "spark.sql.shuffle.partitions"
      val savedParts = s.conf.get(partKey)
      if (savedParts.toInt > 2) s.conf.set(partKey, "2")
      try {
        val q = joined.writeStream
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
          .format("memory").queryName("q198_sink").start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set(partKey, savedParts)
      s.table("q198_sink")
        .crossJoin(broadcast(outerJoinWatermarkBase(s, dir)))
        .filter(
          (col("p_ts").isNull ||
            unix_micros(col("p_ts")) <= col("mx") - 7200000000L) &&
          (col("c_ts").isNull ||
            unix_micros(col("c_ts")) <= col("mx") - 7200000000L))
        .select(col("p_id"), col("c_id"))
        .orderBy(col("p_id").asc_nulls_first, col("c_id").asc_nulls_first)
    },

    // Sessionization via the BUILT-IN session_window construct on the
    // stream (batch analog: q123; custom-state analog: q87): watermarked
    // event-time gap-merge inside the streaming engine, one row per
    // (user, session). The engine owns the session state (merge on
    // arrival, eviction by watermark) instead of mapGroupsWithState's
    // hand-rolled (lastTs, n, n) tuple. The per-user rollup to
    // (n_events, n_sessions) runs as a BATCH aggregation over the
    // drained session rows — streaming allows one stateful aggregation
    // per query, and the rollup needs the final session set anyway.
    "q130_stream_session_window" -> { (s, dir) =>
      val sess = eventStream(s, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("n"))
      drain(sess, s, "q130_sink", OutputMode.Complete())
        .groupBy(col("user_id"))
        .agg(sum(col("n")).cast(LongType).as("n_events"),
          count(lit(1)).as("n_sessions"))
        .orderBy(col("user_id"))
    },

    // transformWithState (Spark 4's arbitrary-state API, successor to
    // mapGroupsWithState): the same sessionization through a
    // StatefulProcessor with named ValueState on the RocksDB state
    // store provider (required by this API — state lives off-heap and
    // checkpoints incrementally, the 100 TB streaming-state design).
    // Same O(1)-per-key state tuple, same oracle as q87.
    "q140_transform_with_state" -> { (s, dir) =>
      import s.implicits._
      val typed = eventStream(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
        .as[(Long, Long)]
      val sessions = typed.groupByKey(_._1)
        .transformWithState(new SessionProcessor(30L * 60 * 1000000),
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "n_events", "n_sessions")
      val provKey = "spark.sql.streaming.stateStore.providerClass"
      val saved = s.conf.getOption(provKey)
      s.conf.set(provKey,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try drain(sessions, s, "q140_sink", OutputMode.Update())
        .orderBy(col("user_id"))
      finally saved match {
        case Some(v) => s.conf.set(provKey, v)
        case None => s.conf.unset(provKey)
      }
    },

    // flatMapGroupsWithState: the MULTI-ROW custom-state surface (q87's
    // mapGroups variant emits one row per group; this emits one row per
    // SESSION). State is the count of sessions already emitted plus the
    // open session's (lastTs, nEvents) — O(1) per key. Bounded fixture
    // -> single batch -> emits the complete per-session breakdown,
    // equal to the batch gap-split oracle.
    "q135_stream_sessions_flat" -> { (s, dir) =>
      import s.implicits._
      val gapUs = 30L * 60 * 1000000
      val typed = eventStream(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
        .as[(Long, Long)]
      val sessions = typed.groupByKey(_._1)
        .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          case (uid, rows, state: GroupState[(Long, Long, Long)]) =>
            var (emitted, lastTs, openN) =
              state.getOption.getOrElse((0L, Long.MinValue, 0L))
            val batch = rows.map(_._2).toArray
            java.util.Arrays.sort(batch)
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Long, Long)]
            batch.foreach { t =>
              if (openN > 0L && t - lastTs > gapUs) {
                emitted += 1L
                out += ((uid, emitted, openN))
                openN = 0L
              }
              openN += 1L
              if (t > lastTs) lastTs = t
            }
            if (openN > 0L) { // bounded stream: close the final session
              emitted += 1L
              out += ((uid, emitted, openN))
              openN = 0L
            }
            state.update((emitted, lastTs, openN))
            out.iterator
        }
        .toDF("user_id", "session_idx", "n_events")
      drain(sessions, s, "q135_sink", OutputMode.Append())
        .orderBy(col("user_id"), col("session_idx"))
    },

    // Stateful sessionization: mapGroupsWithState per user, 30-minute
    // inactivity gap. State is O(1) per key — (lastTs, nEvents,
    // nSessions) — never the event history, so an unbounded stream at
    // any scale holds three longs per user. Each micro-batch's rows are
    // sorted locally (bounded by batch size, not stream length); events
    // older than lastTs arriving in a LATER batch fold into the current
    // session (a real deployment adds a watermark to bound that
    // lateness). Bounded fixture -> single batch -> equals the batch
    // lag-window oracle.
    "q87_stream_sessions" -> { (s, dir) =>
      import s.implicits._
      val gapUs = 30L * 60 * 1000000
      val typed = eventStream(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
        .as[(Long, Long)]
      val sessions = typed.groupByKey(_._1)
        .mapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
          GroupStateTimeout.NoTimeout()) {
          case (uid, rows, state: GroupState[(Long, Long, Long)]) =>
            var (lastTs, nEvents, nSessions) =
              state.getOption.getOrElse((Long.MinValue, 0L, 0L))
            val batch = rows.map(_._2).toArray
            java.util.Arrays.sort(batch)
            batch.foreach { t =>
              if (nEvents == 0L) nSessions = 1L
              else if (t - lastTs > gapUs) nSessions += 1L
              nEvents += 1L
              if (t > lastTs) lastTs = t
            }
            state.update((lastTs, nEvents, nSessions))
            (uid, nEvents, nSessions)
        }
        .toDF("user_id", "n_events", "n_sessions")
      drain(sessions, s, "q87_sink", OutputMode.Update())
        .orderBy(col("user_id"))
    },

    // Streaming AS-OF enrichment — the production shape for "join each
    // incoming fact to the latest reference observation at-or-before
    // it" (quotes-at-trade-time, config-as-of, price-as-of): purchases
    // stream in, each micro-batch runs the NATIVE as-of operator
    // (plans/AsOfJoinNative) against the static click reference, and
    // lands in the lake via foreachBatch. Correct per construction:
    // the static side is complete, so each batch's as-of answer is
    // independent of batching — the union over batches equals the
    // batch-mode as-of (q125's oracle, verbatim). At 100 TB the
    // reference side rides the same broadcast/shuffle/sort-merge size
    // ladder as batch.
    "q180_stream_asof_enrich" -> { (s, dir) =>
      graft.GraftExtensions.register(s)
      // the sink path embeds the SANITIZED fixture path (hashCode
      // collides across dirs) and is deleted up front: a run whose
      // stream produced no batch 0 must fail loudly on read-back, not
      // silently return a previous run's parquet
      val out = "/tmp/graft_stream_sink/q180_" +
        dir.replaceAll("[^A-Za-z0-9._-]", "_")
      val outPath = new org.apache.hadoop.fs.Path(out)
      outPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(outPath, true)
      val clicks = graft.Tables.df(s, dir, "events")
        .filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("c_user"),
          unix_micros(col("ts")).as("click_ts_us"))
      val purchases = eventStream(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"))
      withDrainConfs(s, parts = 8) {
        val q = purchases.writeStream
          .outputMode(OutputMode.Append())
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             id: Long) =>
              graft.plans.AsOfJoinOps
                .asof(batch.toDF(), clicks, "user_id", "c_user",
                  "ts_us", "click_ts_us", "click_id")
                .write.mode(if (id == 0L) "overwrite" else "append")
                .parquet(out)
          }
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      s.read.parquet(out)
        .select(col("purchase_id"), col("user_id"), col("ts_us"),
          col("click_id"), col("click_ts_us"))
        .orderBy(col("purchase_id"))
    }
  )

  override def oracle: Map[String, String] = Map(
    "q362_stream_update_changelog" ->
      """SELECT event_type AS et, count(*) AS n,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
        |    AS DECIMAL(18,2)) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q319_stream_cdc_multibatch" ->
      """SELECT event_type AS et, user_id, count(*) AS n,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
        |    AS DECIMAL(18,2)) AS DOUBLE) AS sum_v
        |FROM events
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q313_stream_cdc_merge" ->
      """SELECT event_type AS et, user_id, count(*) AS n,
        |  CAST(CAST(sum(CAST(value AS DECIMAL(18,2)))
        |    AS DECIMAL(18,2)) AS DOUBLE) AS sum_v
        |FROM events WHERE event_type IN ('click', 'purchase')
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q85_stream_tumbling" ->
      """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS w_start,
        | event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "q159_stream_static_enrich" ->
      """SELECT epoch_us(date_trunc('hour', CAST(e.ts AS TIMESTAMP)))
        |    AS w_start,
        |  c.c_mktsegment AS segment, count(*) AS n,
        |  CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE e.event_type = 'purchase'
        |GROUP BY 1, 2 ORDER BY w_start, segment""".stripMargin,
    "q270_stream_available_now" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q250_stream_sliding_distinct" ->
      """SELECT w_start, count(DISTINCT user_id) AS n_users
        |FROM (
        |  SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))
        |           - h * INTERVAL 1 HOUR) AS w_start, user_id
        |  FROM events, unnest([0, 1, 2]) AS t(h)
        |) GROUP BY w_start ORDER BY w_start""".stripMargin,
    "q86_stream_sliding" ->
      """SELECT w_start, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM (
        |  SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP))
        |           - h * INTERVAL 1 HOUR) AS w_start, value
        |  FROM events, unnest([0, 1]) AS t(h)
        |) GROUP BY w_start ORDER BY w_start""".stripMargin,
    "q188_stream_stream_outer" ->
      """WITH m AS (SELECT least(
        |    max(epoch_us(CAST(ts AS TIMESTAMP)))
        |      FILTER (WHERE event_type = 'purchase'),
        |    max(epoch_us(CAST(ts AS TIMESTAMP)))
        |      FILTER (WHERE event_type = 'click')) AS mx
        |  FROM events)
        |SELECT p.event_id AS p_id, c.event_id AS c_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND CAST(c.ts AS TIMESTAMP)
        |     >= CAST(p.ts AS TIMESTAMP) - INTERVAL 30 MINUTE
        | AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        |CROSS JOIN m
        |WHERE epoch_us(CAST(p.ts AS TIMESTAMP)) <= m.mx - 7200000000
        |ORDER BY p_id, c_id""".stripMargin,
    "q198_stream_stream_fullouter" ->
      """WITH m AS (SELECT least(
        |    max(epoch_us(CAST(ts AS TIMESTAMP)))
        |      FILTER (WHERE event_type = 'purchase'),
        |    max(epoch_us(CAST(ts AS TIMESTAMP)))
        |      FILTER (WHERE event_type = 'click')) AS mx
        |  FROM events)
        |SELECT p.event_id AS p_id, c.event_id AS c_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND CAST(c.ts AS TIMESTAMP)
        |     >= CAST(p.ts AS TIMESTAMP) - INTERVAL 30 MINUTE
        | AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        |CROSS JOIN m
        |WHERE (p.event_id IS NULL
        |       OR epoch_us(CAST(p.ts AS TIMESTAMP)) <= m.mx - 7200000000)
        |  AND (c.event_id IS NULL
        |       OR epoch_us(CAST(c.ts AS TIMESTAMP)) <= m.mx - 7200000000)
        |ORDER BY p_id NULLS FIRST, c_id NULLS FIRST""".stripMargin,
    "q104_stream_stream_join" ->
      """SELECT p.event_id AS p_id, c.event_id AS c_id
        |FROM events p JOIN events c ON p.user_id = c.user_id
        | AND p.event_type = 'purchase' AND c.event_type = 'click'
        | AND CAST(c.ts AS TIMESTAMP)
        |     >= CAST(p.ts AS TIMESTAMP) - INTERVAL 30 MINUTE
        | AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP)
        |ORDER BY p_id, c_id""".stripMargin,
    "q208_stream_stream_semi" ->
      """SELECT p.event_id AS p_id, p.user_id AS p_user
        |FROM events p
        |WHERE p.event_type = 'purchase' AND EXISTS (
        |  SELECT 1 FROM events c
        |  WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |    AND CAST(c.ts AS TIMESTAMP)
        |        >= CAST(p.ts AS TIMESTAMP) - INTERVAL 30 MINUTE
        |    AND CAST(c.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP))
        |ORDER BY p_id""".stripMargin,
    "q89_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    // identical to q103/q125's oracle: three engine paths (window
    // formulation, native batch exec, per-micro-batch native exec) and
    // DuckDB's ASOF JOIN must all agree row-for-row
    "q180_stream_asof_enrich" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  epoch_us(CAST(p.ts AS TIMESTAMP)) AS ts_us,
        |  c.event_id AS click_id,
        |  epoch_us(CAST(c.ts AS TIMESTAMP)) AS click_ts_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND CAST(p.ts AS TIMESTAMP) >= CAST(c.ts AS TIMESTAMP)
        |ORDER BY purchase_id""".stripMargin,
    "q144_stream_dedup_watermark" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    "q88_stream_foreachbatch" ->
      """SELECT event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q140_transform_with_state" ->
      """SELECT user_id, count(*) AS n_events,
        | CAST(1 + sum(CASE WHEN gap > 30*60*1000000 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_sessions
        |FROM (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) -
        |    lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
        |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) AS gap
        |  FROM events
        |) GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q135_stream_sessions_flat" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |  FROM events),
        |g AS (
        |  SELECT user_id, ts_us,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w > 30*60*1000000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
        |s AS (
        |  SELECT user_id, ts_us, sum(new_s) OVER (
        |    PARTITION BY user_id ORDER BY ts_us) AS session_idx
        |  FROM g)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
    "q130_stream_session_window" ->
      """SELECT user_id, count(*) AS n_events,
        | CAST(1 + sum(CASE WHEN gap > 30*60*1000000 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_sessions
        |FROM (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) -
        |    lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
        |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) AS gap
        |  FROM events
        |) GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q87_stream_sessions" ->
      """SELECT user_id, count(*) AS n_events,
        | CAST(1 + sum(CASE WHEN gap > 30*60*1000000 THEN 1 ELSE 0 END)
        |   AS BIGINT) AS n_sessions
        |FROM (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) -
        |    lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
        |      PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) AS gap
        |  FROM events
        |) GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
