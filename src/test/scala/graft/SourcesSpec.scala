package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Connector behavior: the custom DSv2 source must actually push work
  * to the source (filters narrow the planned splits, projections
  * narrow the emitted columns), and the binaryFile staging must be
  * deterministic. */
class SourcesSpec extends AnyFunSuite {
  import TestSession._

  private def dsv2(n: String = "100000") =
    spark.read.format("graft.sources.GraftRangeSource")
      .option("n", n).option("slices", "8").load()

  test("q136 DSv2 scan pushes id-range filters into the source") {
    val df = dsv2().filter(col("id") >= 90000L && col("id") < 90500L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GraftRangeScan range=[90000,90500)"),
      s"filters must narrow the source range:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(id,90000)"), plan)
  }

  test("q136 DSv2 scan prunes columns to the projection") {
    val df = dsv2().select(col("tag"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadColumns: tag"),
      s"projection must reach the source:\n$plan")
  }

  test("DSv2 source partitions the range across splits and computes " +
    "rows correctly") {
    val rows = dsv2(n = "1000").collect()
    assert(rows.length == 1000)
    val r7 = rows.find(_.getLong(0) == 7L).get
    assert(r7.getLong(1) == 49L && r7.getString(2) == "t0")
    // out-of-range splits are never planned
    val pruned = dsv2().filter(col("id") < 10L)
    assert(pruned.rdd.getNumPartitions <= 8)
    assert(pruned.count() == 10)
  }

  test("q139 aggregate pushdown: no engine-side aggregation, one row " +
    "from a billion-row source") {
    val df = SparkEntry.queries("q139_dsv2_agg_pushdown")(spark, sf)
    val t0 = System.nanoTime()
    val r = df.collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(r.length == 1)
    assert(r.head.getLong(0) == 999987655L)
    assert(r.head.getLong(1) == 12345L && r.head.getLong(2) == 999999999L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"), plan)
    assert(!plan.contains("HashAggregate"),
      s"aggregation must not run engine-side:\n$plan")
    assert(secs < 10, s"O(1) source aggregate took ${secs}s")
  }

  test("DSv2 limit pushdown shortens the source range") {
    val df = dsv2().limit(5)
    val rows = df.collect()
    assert(rows.length == 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("range=[0,5)"),
      s"limit must narrow the source range:\n$plan")
  }

  test("q141 sink commit protocol: no temp files survive, rerun is " +
    "idempotent, content round-trips") {
    val a = SparkEntry.queries("q141_dsv2_sink_roundtrip")(spark, sf)
      .collect().map(_.toSeq)
    val b = SparkEntry.queries("q141_dsv2_sink_roundtrip")(spark, sf)
      .collect().map(_.toSeq)
    assert(a.nonEmpty && a.sameElements(b), "rerun must be idempotent")
    val out = java.nio.file.Paths.get("/tmp/graft_csvsink",
      Integer.toHexString(sf.hashCode))
    var tmps = 0
    java.nio.file.Files.list(out).forEach(p =>
      if (p.getFileName.toString.startsWith(".tmp-")) tmps += 1)
    assert(tmps == 0, s"$tmps uncommitted temp files left behind")
  }

  test("catalog DDL: create, show, select-with-pushdown, rename, drop") {
    spark.conf.set("spark.sql.catalog.graft_spec",
      "graft.sources.GraftCatalog")
    spark.sql("CREATE TABLE graft_spec.default.t1 (id BIGINT, sq BIGINT, " +
      "tag STRING) TBLPROPERTIES ('n'='100')")
    val shown = spark.sql("SHOW TABLES IN graft_spec.default").collect()
      .map(_.getString(1))
    assert(shown.contains("t1"))
    val df = spark.sql(
      "SELECT count(*) AS n FROM graft_spec.default.t1 WHERE id >= 40")
    assert(df.collect().head.getLong(0) == 60L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates") ||
      plan.contains("range=[40,100)"),
      s"catalog table must keep the pushdown stack:\n$plan")
    // the new name resolves WITHIN the source catalog: no catalog prefix
    spark.sql("ALTER TABLE graft_spec.default.t1 RENAME TO default.t2")
    assert(spark.sql("SELECT count(*) AS n FROM graft_spec.default.t2")
      .collect().head.getLong(0) == 100L)
    spark.sql("DROP TABLE graft_spec.default.t2")
    assert(spark.sql("SHOW TABLES IN graft_spec.default").collect().isEmpty)
  }

  test("q134 binaryFile staging is deterministic across runs") {
    val a = SparkEntry.queries("q134_binaryfile_source")(spark, sf)
      .collect().map(_.toSeq)
    val b = SparkEntry.queries("q134_binaryfile_source")(spark, sf)
      .collect().map(_.toSeq)
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("partitioned catalog table prunes partitions at RUNTIME from a " +
    "join's dim keys (the DSv2 dynamic-partition-pruning seam)") {
    import org.apache.spark.sql.functions._
    // (re)build the table: q172 drops, creates, inserts
    SparkEntry.queries("q172_partitioned_catalog")(spark, sf).collect()
    val full = spark.table("graft_cat.default.po_q172").count()
    import spark.implicits._
    // The dim must (a) be a real scan with a LIKELY-SELECTIVE predicate
    // — a local Seq folds to a bare LocalRelation and the planner's
    // PartitionPruning rule declines — and (b) filter on a NON-key
    // column, otherwise constraint propagation turns the dim predicate
    // into a STATIC pushed filter on prio and the test would pass
    // without any runtime pruning. o_orderkey = 1 resolves (at runtime
    // only) to the single priority '4-NOT SPECIFIED'.
    val dim = Tables.df(spark, sf, "orders")
      .filter(col("o_orderkey") === 1L)
      .select(col("o_orderpriority").as("dprio")).distinct()
    val joined = spark.table("graft_cat.default.po_q172")
      .join(dim, col("prio") === col("dprio"))
    val rows = joined.collect()
    assert(rows.nonEmpty &&
      rows.forall(_.getAs[String]("prio") == "4-NOT SPECIFIED"))
    val plan = joined.queryExecution.executedPlan
    assert(plan.toString.contains("RuntimeFilters: [dynamicpruning"),
      s"no runtime filter planned:\n${plan.toString.take(2000)}")
    // the scan must have emitted ONLY the surviving partition's rows —
    // source-side pruning, not a post-scan filter. (Adaptive plans and
    // query stages are collect-leaves — recurse through them manually.)
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val more = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case other => other.children
      }
      p +: more.flatMap(nodes)
    }
    val scans = nodes(plan).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
          if b.scan.isInstanceOf[graft.sources.GraftPartitionedScan] => b
    }
    assert(scans.nonEmpty)
    val scanned = scans.map(_.metrics("numOutputRows").value).max
    assert(scanned < full,
      s"runtime filter pruned nothing: scanned $scanned of $full")
    assert(scanned == rows.length.toLong,
      "scan should emit exactly the matching partition's rows")
    spark.sql("DROP TABLE graft_cat.default.po_q172")
  }

  test("partitioned catalog table: INSERT OVERWRITE by static partition " +
    "spec replaces ONLY that partition; full INSERT OVERWRITE truncates") {
    spark.conf.set("spark.sql.catalog.graft_cat",
      "graft.sources.GraftCatalog")
    spark.sql("DROP TABLE IF EXISTS graft_cat.default.ow_spec")
    spark.sql("CREATE TABLE graft_cat.default.ow_spec " +
      "(prio STRING, ok BIGINT) PARTITIONED BY (prio)")
    spark.sql("INSERT INTO graft_cat.default.ow_spec VALUES " +
      "('a', 1), ('a', 2), ('b', 10), ('c', 20)")
    // static-partition overwrite: partition a replaced, b/c untouched
    spark.sql("INSERT OVERWRITE graft_cat.default.ow_spec " +
      "PARTITION (prio = 'a') VALUES (99)")
    val afterPart = spark.sql(
      "SELECT prio, count(*) AS n, max(ok) AS mx " +
        "FROM graft_cat.default.ow_spec GROUP BY prio ORDER BY prio")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(afterPart.toSeq ===
      Seq(("a", 1L, 99L), ("b", 1L, 10L), ("c", 1L, 20L)))
    // unqualified overwrite: truncate-and-load
    spark.sql("INSERT OVERWRITE graft_cat.default.ow_spec VALUES ('z', 7)")
    val afterFull = spark.sql(
      "SELECT prio, ok FROM graft_cat.default.ow_spec")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(afterFull.toSeq === Seq(("z", 7L)))
    spark.sql("DROP TABLE graft_cat.default.ow_spec")
  }

  test("partitioned catalog: DELETE FROM with a conjunction condition " +
    "and TRUNCATE TABLE both resolve as metadata deletes") {
    spark.conf.set("spark.sql.catalog.graft_cat",
      "graft.sources.GraftCatalog")
    spark.sql("DROP TABLE IF EXISTS graft_cat.default.del_spec")
    spark.sql("CREATE TABLE graft_cat.default.del_spec " +
      "(prio STRING, ok BIGINT) PARTITIONED BY (prio)")
    spark.sql("INSERT INTO graft_cat.default.del_spec VALUES " +
      "('a', 1), ('a', 2), ('b', 10), ('c', 20)")
    // conjunction: only ('a', 1) goes
    spark.sql("DELETE FROM graft_cat.default.del_spec " +
      "WHERE prio = 'a' AND ok = 1")
    val afterRow = spark.sql(
      "SELECT prio, ok FROM graft_cat.default.del_spec ORDER BY prio, ok")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(afterRow.toSeq === Seq(("a", 2L), ("b", 10L), ("c", 20L)))
    // whole-partition delete
    spark.sql("DELETE FROM graft_cat.default.del_spec WHERE prio = 'b'")
    assert(spark.table("graft_cat.default.del_spec").count() == 2L)
    // TRUNCATE rides SupportsDelete's default truncateTable()
    spark.sql("TRUNCATE TABLE graft_cat.default.del_spec")
    assert(spark.table("graft_cat.default.del_spec").count() == 0L)
    spark.sql("DROP TABLE graft_cat.default.del_spec")
  }

  test("partitioned catalog: overwrite filters are a CONJUNCTION " +
    "(row-level), and RENAME carries the partitioned store along") {
    spark.conf.set("spark.sql.catalog.graft_cat",
      "graft.sources.GraftCatalog")
    spark.sql("DROP TABLE IF EXISTS graft_cat.default.ow_conj")
    spark.sql("DROP TABLE IF EXISTS graft_cat.default.ow_conj2")
    spark.sql("CREATE TABLE graft_cat.default.ow_conj " +
      "(prio STRING, ok BIGINT) PARTITIONED BY (prio)")
    spark.sql("INSERT INTO graft_cat.default.ow_conj VALUES " +
      "('a', 1), ('a', 2), ('b', 10)")
    // conjunction semantics: prio='a' AND ok=1 must delete ONLY that
    // row — not the whole 'a' partition
    import spark.implicits._
    Seq(("a", 99L)).toDF("prio", "ok")
      .writeTo("graft_cat.default.ow_conj")
      .overwrite(col("prio") === "a" && col("ok") === 1L)
    val after = spark.sql(
      "SELECT prio, ok FROM graft_cat.default.ow_conj ORDER BY prio, ok")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(after.toSeq === Seq(("a", 2L), ("a", 99L), ("b", 10L)))
    // rename: data and schema must follow the identifier
    spark.sql("ALTER TABLE graft_cat.default.ow_conj " +
      "RENAME TO default.ow_conj2")
    val renamed = spark.sql(
      "SELECT prio, ok FROM graft_cat.default.ow_conj2 ORDER BY prio, ok")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(renamed.toSeq === Seq(("a", 2L), ("a", 99L), ("b", 10L)))
    spark.sql("DROP TABLE graft_cat.default.ow_conj2")
  }

  test("q191 MERGE INTO: matched rows update, unmatched insert, " +
    "untouched rows carry over byte-identical") {
    spark.conf.set("spark.sql.catalog.graft_cat",
      "graft.sources.GraftCatalog")
    spark.sql("DROP TABLE IF EXISTS graft_cat.default.mrg_t")
    spark.sql("CREATE TABLE graft_cat.default.mrg_t " +
      "(prio STRING, ok BIGINT, price DOUBLE) PARTITIONED BY (prio)")
    spark.sql("INSERT INTO graft_cat.default.mrg_t VALUES " +
      "('a', 1, 10.0), ('a', 2, 20.0), ('b', 3, 30.0)")
    spark.sql("SELECT 2L AS ok, 'a' AS prio, 99.0 AS price " +
      "UNION ALL SELECT 4L, 'c', 40.0").createOrReplaceTempView("mrg_s")
    spark.sql("""MERGE INTO graft_cat.default.mrg_t t
      USING mrg_s s ON t.ok = s.ok
      WHEN MATCHED THEN UPDATE SET price = s.price
      WHEN NOT MATCHED THEN INSERT (prio, ok, price)
        VALUES (s.prio, s.ok, s.price)""")
    val after = spark.sql("SELECT prio, ok, price " +
      "FROM graft_cat.default.mrg_t ORDER BY ok")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(after.toSeq === Seq(("a", 1L, 10.0), ("a", 2L, 99.0),
      ("b", 3L, 30.0), ("c", 4L, 40.0)))
    spark.sql("DROP TABLE graft_cat.default.mrg_t")
  }

  test("MERGE INTO abort safety: a throwing merge expression leaves " +
    "the table byte-identical (two-phase replace commit)") {
    spark.conf.set("spark.sql.catalog.graft_cat",
      "graft.sources.GraftCatalog")
    spark.sql("DROP TABLE IF EXISTS graft_cat.default.mrg_abort")
    spark.sql("CREATE TABLE graft_cat.default.mrg_abort " +
      "(prio STRING, ok BIGINT, price DOUBLE) PARTITIONED BY (prio)")
    spark.sql("INSERT INTO graft_cat.default.mrg_abort VALUES " +
      "('a', 1, 10.0), ('b', 2, 20.0)")
    spark.sql("SELECT 1L AS ok, 'a' AS prio, 0.0 AS price")
      .createOrReplaceTempView("mrg_abort_s")
    // raise_error evaluates task-side during the replace job: every
    // task fails, the write aborts, and commit never runs
    intercept[Exception] {
      spark.sql("""MERGE INTO graft_cat.default.mrg_abort t
        USING mrg_abort_s s ON t.ok = s.ok
        WHEN MATCHED THEN UPDATE SET
          price = CAST(raise_error('merge boom') AS DOUBLE)""")
    }
    val after = spark.sql("SELECT prio, ok, price " +
      "FROM graft_cat.default.mrg_abort ORDER BY ok")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(after.toSeq === Seq(("a", 1L, 10.0), ("b", 2L, 20.0)),
      "aborted MERGE must not mutate the table")
    spark.sql("DROP TABLE graft_cat.default.mrg_abort")
  }

  test("UPDATE and DELETE with non-equality predicates route through " +
    "the group-based row-level operation") {
    spark.conf.set("spark.sql.catalog.graft_cat",
      "graft.sources.GraftCatalog")
    spark.sql("DROP TABLE IF EXISTS graft_cat.default.rlo_ud")
    spark.sql("CREATE TABLE graft_cat.default.rlo_ud " +
      "(prio STRING, ok BIGINT, price DOUBLE) PARTITIONED BY (prio)")
    spark.sql("INSERT INTO graft_cat.default.rlo_ud VALUES " +
      "('a', 1, 10.0), ('a', 5, 50.0), ('b', 9, 90.0)")
    // ok > 4 is not an equality conjunction: canDeleteWhere declines it
    // and Spark rewrites through the RowLevelOperation seam instead
    spark.sql("UPDATE graft_cat.default.rlo_ud SET price = price + 1.0 " +
      "WHERE ok > 4")
    spark.sql("DELETE FROM graft_cat.default.rlo_ud WHERE ok > 8")
    val after = spark.sql("SELECT prio, ok, price " +
      "FROM graft_cat.default.rlo_ud ORDER BY ok")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(after.toSeq === Seq(("a", 1L, 10.0), ("a", 5L, 51.0)))
    spark.sql("DROP TABLE graft_cat.default.rlo_ud")
  }

  test("q172 partitioned catalog table: partition-key predicate prunes " +
    "partitions source-side; added column reads back null") {
    val df = SparkEntry.queries("q172_partitioned_catalog")(spark, sf)
    val rows = df.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n_note") == 0L,
      "rows written before ADD COLUMN must read the new column as null")
    // the scan plans ONE of the five priority partitions — the pruning
    // a real lakehouse format does with its manifest
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partitions=1/5"), plan.take(2000))
    assert(plan.contains("EqualTo(prio,1-URGENT)"), plan.take(2000))
    // an unfiltered read sees every partition and all columns
    val full = spark.sql(
      "SELECT prio, count(note) AS n FROM graft_cat.default.po_q172 " +
        "GROUP BY prio")
    assert(full.collect().length == 5)
    assert(full.queryExecution.executedPlan.toString
      .contains("partitions=5/5"))
    spark.sql("DROP TABLE graft_cat.default.po_q172")
  }

  test("time travel: VERSION/TIMESTAMP AS OF serve frozen snapshots, " +
    "history does not leak across drop-and-recreate") {
    spark.conf.set("spark.sql.catalog.graft_cat",
      "graft.sources.GraftCatalog")
    val t = "graft_cat.default.tt_spec"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (p STRING, v BIGINT) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $t VALUES ('a', 1), ('a', 2), ('b', 10)")
    val tsAfterV1 = System.currentTimeMillis()
    Thread.sleep(5)
    spark.sql(s"DELETE FROM $t WHERE p = 'a'")
    // v0 empty, v1 three rows, v2 after delete
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 0").count() == 0)
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 1").count() == 3)
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 2").count() == 1)
    assert(spark.table(t).count() == 1)
    // snapshot reads keep the scan stack: partition pruning on v1
    val pruned = spark.sql(
      s"SELECT * FROM $t VERSION AS OF 1 WHERE p = 'b'")
    assert(pruned.count() == 1)
    assert(pruned.queryExecution.executedPlan.toString
      .contains("partitions=1/2"))
    // TIMESTAMP AS OF: a wall time between v1 and v2 reads v1
    assert(spark.sql(
      s"SELECT * FROM $t TIMESTAMP AS OF ${tsAfterV1 / 1000.0}")
      .count() == 3)
    // beyond-history version errors loudly
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $t VERSION AS OF 9").collect())
    assert(e.getMessage.contains("no version"), e.getMessage)
    // drop + recreate: old history must be unreachable
    spark.sql(s"DROP TABLE $t")
    spark.sql(s"CREATE TABLE $t (p STRING, v BIGINT) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $t VALUES ('z', 99)")
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 1").collect()
      .map(_.getString(0)).toSeq == Seq("z"),
      "recreated table must not serve the old table's v1")
    spark.sql(s"DROP TABLE $t")
  }

  test("projection without the partition column stays joinable: " +
    "filterAttributes must not reference pruned-away columns") {
    // Spark's PartitionPruning resolves SupportsRuntimeV2Filtering's
    // filterAttributes against the scan OUTPUT and throws on a column
    // the projection pruned — a scan that always advertises the
    // partition column breaks every `SELECT <non-partition cols> ...
    // JOIN` (this is how q225's snapshot diff first failed).
    spark.conf.set("spark.sql.catalog.graft_cat",
      "graft.sources.GraftCatalog")
    val t = "graft_cat.default.prune_join_t"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (p STRING, v BIGINT) PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $t VALUES ('a', 1), ('b', 2), ('b', 3)")
    val left = spark.sql(s"SELECT v FROM $t")
    val right = spark.sql(s"SELECT v AS w FROM $t")
    // full_outer exercises the same DPP probe path as q225's diff
    assert(left.join(right, left("v") === right("w"), "full_outer")
      .count() == 3)
    spark.sql(s"DROP TABLE $t")
  }
}
