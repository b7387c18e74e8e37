package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.HudiCowLite

/** HudiCowLite contract: copy-on-write timeline replay (latest base
  * file per file group wins), asOfInstant, inflight-commit exclusion,
  * and the LOUD-failure paths — MERGE_ON_READ, replacecommit,
  * deltacommit, malformed commit JSON, unknown instant, missing
  * .hoodie. The happy path against real data is q394/q395's DuckDB
  * oracle. */
class HudiSpec extends AnyFunSuite {
  import TestSession._

  private def rm(p: java.io.File): Unit = {
    if (p.isDirectory) Option(p.listFiles()).foreach(_.foreach(rm))
    p.delete(): Unit
  }

  /** Table with one file group "g" in partition "p=x": instant 001
    * writes ids 0..4, instant 002 rewrites the group with ids 5..9. */
  private def fixture(name: String,
                      tableType: String = "COPY_ON_WRITE"): String = {
    val root = s"/tmp/graft_hudispec/$name"
    rm(new java.io.File(root))
    Files.createDirectories(Paths.get(root, ".hoodie"))
    Files.createDirectories(Paths.get(root, "p=x"))
    Files.writeString(Paths.get(root, ".hoodie", "hoodie.properties"),
      s"hoodie.table.name=t\nhoodie.table.type=$tableType\n")
    val df = spark.range(0, 10).select(col("id"), (col("id") * 2).as("v"))
    def one(filter: org.apache.spark.sql.Column, out: String): Unit = {
      val tmp = s"$root/_tmp"
      df.filter(filter).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith(".")).get
      assert(part.renameTo(new java.io.File(s"$root/$out")))
      rm(new java.io.File(tmp))
    }
    one(col("id") < 5, "p=x/g_0-0_001.parquet")
    one(col("id") >= 5, "p=x/g_0-0_002.parquet")
    def commit(instant: String, path: String): Unit =
      Files.writeString(Paths.get(root, ".hoodie", s"$instant.commit"),
        s"""{"partitionToWriteStats":{"p=x":[{"fileId":"g","path":"$path","numWrites":5}]}}""")
    commit("001", "p=x/g_0-0_001.parquet")
    commit("002", "p=x/g_0-0_002.parquet")
    root
  }

  /** COW table for incremental reads: group gA written at 001 (ids
    * 0..4, _hoodie_commit_time=001) then REWRITTEN at 002 (ids 0..4
    * keep 001 except id 1 upserted at 002 with v=99); group gB (ids
    * 10..12) inserted at 002; group gC (ids 20..21) at 003. */
  private def incFixture(name: String): String = {
    val root = s"/tmp/graft_hudispec/$name"
    rm(new java.io.File(root))
    Files.createDirectories(Paths.get(root, ".hoodie"))
    Files.writeString(Paths.get(root, ".hoodie", "hoodie.properties"),
      "hoodie.table.name=t\nhoodie.table.type=COPY_ON_WRITE\n")
    def one(df: org.apache.spark.sql.DataFrame, out: String): Unit = {
      val tmp = s"$root/_tmp"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith(".")).get
      assert(part.renameTo(new java.io.File(s"$root/$out")))
      rm(new java.io.File(tmp))
    }
    def batch(ids: Range, ct: String) = spark.range(ids.start, ids.end)
      .select(lit(ct).as("_hoodie_commit_time"), col("id"),
        (col("id") * 2).as("v"))
    one(batch(0 until 5, "001"), "gA_0-0_001.parquet")
    one(batch(0 until 5, "001")
      .withColumn("_hoodie_commit_time",
        when(col("id") === 1, "002").otherwise(col("_hoodie_commit_time")))
      .withColumn("v", when(col("id") === 1, 99L).otherwise(col("v"))),
      "gA_0-0_002.parquet")
    one(batch(10 until 13, "002"), "gB_0-0_002.parquet")
    one(batch(20 until 22, "003"), "gC_0-0_003.parquet")
    def commit(instant: String, stats: String): Unit =
      Files.writeString(Paths.get(root, ".hoodie", s"$instant.commit"),
        s"""{"partitionToWriteStats":{"":[$stats]}}""")
    def stat(fid: String, p: String) =
      s"""{"fileId":"$fid","path":"$p","numWrites":1}"""
    commit("001", stat("gA", "gA_0-0_001.parquet"))
    commit("002", stat("gA", "gA_0-0_002.parquet") + "," +
      stat("gB", "gB_0-0_002.parquet"))
    commit("003", stat("gC", "gC_0-0_003.parquet"))
    root
  }

  test("incremental read serves exactly the rows written in " +
    "(begin, end]; untouched file groups are pruned from the scan") {
    import spark.implicits._
    val root = incFixture("incremental")
    // (001, 002]: id 1's upsert + batch B — nothing from 001 or 003
    val got = HudiCowLite.readIncremental(spark, root, "001", Some("002"))
      .select("id", "v").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 99L), (10L, 20L), (11L, 22L), (12L, 24L)))
    // (002, latest]: only batch C
    assert(HudiCowLite.readIncremental(spark, root, "002")
      .select("id").as[Long].collect().sorted.toSeq == Seq(20L, 21L))
    // (001, 003]: gA v2 + gB + gC scanned; 001-rows filtered out
    assert(HudiCowLite.readIncremental(spark, root, "001")
      .count() == 6)
    // file-level pruning: the (002, 003] scan must not list gA/gB
    val plan = HudiCowLite.readIncremental(spark, root, "002")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("gA_0-0") && !plan.contains("gB_0-0"),
      s"untouched groups not pruned:\n$plan")
    // an empty range refuses; begin >= end refuses
    intercept[IllegalArgumentException] {
      HudiCowLite.readIncremental(spark, root, "003")
    }
    // missing _hoodie_commit_time refuses
    val root2 = fixture("incnometa")
    val e = intercept[IllegalStateException] {
      HudiCowLite.readIncremental(spark, root2, "001")
    }
    assert(e.getMessage.contains("_hoodie_commit_time"))
    // mixed-width instants refuse
    intercept[IllegalStateException] {
      HudiCowLite.readIncremental(spark, root, "1")
    }
  }

  test("readChanges infers CDC from the file-group diff: deletes/pre/" +
    "post/inserts exact, carried rows silent; replacecommits and " +
    "key-less files refuse") {
    import spark.implicits._
    def author(name: String, withKey: Boolean = true,
               replace: Boolean = false): String = {
      val root = s"/tmp/graft_hudispec/$name"
      rm(new java.io.File(root))
      Files.createDirectories(Paths.get(root, ".hoodie"))
      Files.writeString(Paths.get(root, ".hoodie", "hoodie.properties"),
        "hoodie.table.name=t\nhoodie.table.type=COPY_ON_WRITE\n")
      def one(df: org.apache.spark.sql.DataFrame, out: String): Unit = {
        val tmp = s"$root/_tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.endsWith(".parquet") &&
            !f.getName.startsWith(".")).get
        assert(part.renameTo(new java.io.File(s"$root/$out")))
        rm(new java.io.File(tmp))
      }
      def batch(ids: Seq[Long], ct: String) = {
        val base = ids.toDF("id")
          .select(lit(ct).as("_hoodie_commit_time"), col("id"))
        (if (withKey) base.withColumn("_hoodie_record_key",
          col("id").cast("string")) else base)
          .withColumn("v", col("id") * 2)
      }
      // gA v1: ids 0..4, v=2id; v2: id 0 deleted, id 1 → v=99,
      // ids 2..4 carried; gB: ids 10..11 new
      one(batch(0L to 4L, "001"), "gA_0-0_001.parquet")
      one(batch(1L to 4L, "001")
        .withColumn("v",
          when(col("id") === 1, 99L).otherwise(col("v")))
        .withColumn("_hoodie_commit_time",
          when(col("id") === 1, "002")
            .otherwise(col("_hoodie_commit_time"))),
        "gA_0-0_002.parquet")
      one(batch(10L to 11L, "002"), "gB_0-0_002.parquet")
      def stat(fid: String, p: String) =
        s"""{"fileId":"$fid","path":"$p","numWrites":1}"""
      Files.writeString(Paths.get(root, ".hoodie", "001.commit"),
        s"""{"partitionToWriteStats":{"":[${
          stat("gA", "gA_0-0_001.parquet")}]}}""")
      val k2 = if (replace) "replacecommit" else "commit"
      val body2 =
        s"""{"partitionToWriteStats":{"":[${
          stat("gA", "gA_0-0_002.parquet")},${
          stat("gB", "gB_0-0_002.parquet")}]}""" +
          (if (replace)
            ""","partitionToReplaceFileIds":{"":["gA"]}}""" else "}")
      Files.writeString(Paths.get(root, ".hoodie", s"002.$k2"), body2)
      root
    }
    val got = HudiCowLite.readChanges(spark, author("cdc"), "001")
      .select(col("id"), col("v"), col("_change_type"),
        col("_commit_time"))
      .as[(Long, Long, String, String)].collect().sorted.toSeq
    assert(got == Seq(
      (0L, 0L, "delete", "002"),
      (1L, 2L, "update_preimage", "002"),
      (1L, 99L, "update_postimage", "002"),
      (10L, 20L, "insert", "002"),
      (11L, 22L, "insert", "002")).sorted)
    // a replacecommit in range refuses (not a data change)
    val e1 = intercept[IllegalStateException] {
      HudiCowLite.readChanges(spark, author("cdcrep", replace = true),
        "001")
    }
    assert(e1.getMessage.contains("replacecommit"))
    // key-less base files refuse
    val e2 = intercept[IllegalStateException] {
      HudiCowLite.readChanges(spark,
        author("cdcnokey", withKey = false), "001").collect()
    }
    assert(e2.getMessage.contains("_hoodie_record_key"))
    // an empty range refuses
    intercept[IllegalArgumentException] {
      HudiCowLite.readChanges(spark, author("cdcempty"), "002")
    }
  }

  test("readChanges serves the WRITTEN CDC when cdcStats names CDC " +
    "log files: records a diff cannot see surface; bad ops refuse; " +
    "cdc-less commits in the same range still infer") {
    import spark.implicits._
    import graft.sources.HudiMorLite
    val root = "/tmp/graft_hudispec/exactcdc"
    rm(new java.io.File(root))
    Files.createDirectories(Paths.get(root, ".hoodie"))
    Files.writeString(Paths.get(root, ".hoodie", "hoodie.properties"),
      "hoodie.table.name=t\nhoodie.table.type=COPY_ON_WRITE\n")
    def one(df: org.apache.spark.sql.DataFrame, out: String): Unit = {
      val tmp = s"$root/_tmp"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith(".")).get
      assert(part.renameTo(new java.io.File(s"$root/$out")))
      rm(new java.io.File(tmp))
    }
    def batch(ids: Seq[Long], ct: String) = ids.toDF("id")
      .select(lit(ct).as("_hoodie_commit_time"),
        col("id").cast("string").as("_hoodie_record_key"),
        col("id"), (col("id") * 2).as("v"))
    one(batch(0L to 2L, "001"), "g_0-0_001.parquet")
    // 002 rewrites g with IDENTICAL content — a diff sees nothing
    one(batch(0L to 2L, "001"), "g_0-0_002.parquet")
    // ...but the WRITTEN CDC declares an update for id 1 (same value)
    // and an insert... no: i with after for id 7 would break read;
    // keep: updates for ids 1 and 2 with unchanged values
    def img(id: Long, v: Long): String = s"""{"id":$id,"v":$v}"""
    HudiMorLite.writeLogFile(s"$root/.g_cdc_002.log.1",
      Seq(HudiMorLite.CdcSchema -> Seq(
        Map[String, Any]("op" -> "u", "before" -> img(1, 2),
          "after" -> img(1, 2)),
        Map[String, Any]("op" -> "u", "before" -> img(2, 4),
          "after" -> img(2, 4)))),
      blockType = HudiMorLite.CdcDataBlockOrdinal)
    def stat(fid: String, p: String, extra: String = "") =
      s"""{"fileId":"$fid","path":"$p","numWrites":1$extra}"""
    Files.writeString(Paths.get(root, ".hoodie", "001.commit"),
      s"""{"partitionToWriteStats":{"":[${
        stat("g", "g_0-0_001.parquet")}]}}""")
    Files.writeString(Paths.get(root, ".hoodie", "002.commit"),
      s"""{"partitionToWriteStats":{"":[${
        stat("g", "g_0-0_002.parquet",
          ""","cdcStats":{".g_cdc_002.log.1":1}""")}]}}""")
    // a cdc-less commit 003 inserts group h — inferred leg
    one(batch(Seq(9L), "003"), "h_0-0_003.parquet")
    Files.writeString(Paths.get(root, ".hoodie", "003.commit"),
      s"""{"partitionToWriteStats":{"":[${
        stat("h", "h_0-0_003.parquet")}]}}""")
    val got = HudiCowLite.readChanges(spark, root, "001")
      .select(col("id"), col("v"), col("_change_type"),
        col("_commit_time"))
      .as[(Long, Long, String, String)].collect().sorted.toSeq
    // the unchanged-value updates are ONLY visible via the written
    // CDC; the inferred path contributes 003's insert
    assert(got == Seq(
      (1L, 2L, "update_preimage", "002"),
      (1L, 2L, "update_postimage", "002"),
      (2L, 4L, "update_preimage", "002"),
      (2L, 4L, "update_postimage", "002"),
      (9L, 18L, "insert", "003")).sorted, got.toString)
    // an unknown op refuses loudly
    HudiMorLite.writeLogFile(s"$root/.g_cdc_bad.log.1",
      Seq(HudiMorLite.CdcSchema -> Seq(
        Map[String, Any]("op" -> "x", "before" -> img(1, 2),
          "after" -> img(1, 2)))),
      blockType = HudiMorLite.CdcDataBlockOrdinal)
    val e = intercept[Exception] {
      HudiMorLite.decodeCdcFile(s"$root/.g_cdc_bad.log.1")
    }
    assert(e.getMessage.contains("op 'x'"))
    // a missing image refuses at read time (raise_error in the plan)
    HudiMorLite.writeLogFile(s"$root/.g_cdc_noimg.log.1",
      Seq(HudiMorLite.CdcSchema -> Seq(
        Map[String, Any]("op" -> "u", "before" -> img(1, 2)))),
      blockType = HudiMorLite.CdcDataBlockOrdinal)
    Files.writeString(Paths.get(root, ".hoodie", "004.commit"),
      s"""{"partitionToWriteStats":{"":[${
        stat("g", "g_0-0_002.parquet",
          ""","cdcStats":{".g_cdc_noimg.log.1":1}""")}]}}""")
    val e2 = intercept[Exception] {
      HudiCowLite.readChanges(spark, root, "003").collect()
    }
    assert(e2.getMessage.contains("lacks its after image") ||
      Option(e2.getCause).exists(
        _.getMessage.contains("lacks its after image")))
  }

  test("cdcStats is PER FILE GROUP: a commit logging CDC for one " +
    "group while creating an insert-only group keeps BOTH — the " +
    "written record for the logged group, the inferred diff for the " +
    "rest") {
    import spark.implicits._
    import graft.sources.HudiMorLite
    val root = "/tmp/graft_hudispec/mixedcdc"
    rm(new java.io.File(root))
    Files.createDirectories(Paths.get(root, ".hoodie"))
    Files.writeString(Paths.get(root, ".hoodie", "hoodie.properties"),
      "hoodie.table.name=t\nhoodie.table.type=COPY_ON_WRITE\n")
    def one(df: org.apache.spark.sql.DataFrame, out: String): Unit = {
      val tmp = s"$root/_tmp"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith(".")).get
      assert(part.renameTo(new java.io.File(s"$root/$out")))
      rm(new java.io.File(tmp))
    }
    def batch(ids: Seq[Long], ct: String) = ids.toDF("id")
      .select(lit(ct).as("_hoodie_commit_time"),
        col("id").cast("string").as("_hoodie_record_key"),
        col("id"), (col("id") * 2).as("v"))
    one(batch(0L to 2L, "001"), "g_0-0_001.parquet")
    // ONE commit 002: rewrites g with identical content (CDC logged —
    // unchanged-value updates a diff cannot see) AND creates the
    // insert-only group h, which writes NO CDC file
    one(batch(0L to 2L, "001"), "g_0-0_002.parquet")
    one(batch(Seq(7L), "002"), "h_0-0_002.parquet")
    def img(id: Long, v: Long): String = s"""{"id":$id,"v":$v}"""
    HudiMorLite.writeLogFile(s"$root/.g_cdc_002.log.1",
      Seq(HudiMorLite.CdcSchema -> Seq(
        Map[String, Any]("op" -> "u", "before" -> img(1, 2),
          "after" -> img(1, 2)))),
      blockType = HudiMorLite.CdcDataBlockOrdinal)
    def stat(fid: String, p: String, extra: String = "") =
      s"""{"fileId":"$fid","path":"$p","numWrites":1$extra}"""
    Files.writeString(Paths.get(root, ".hoodie", "001.commit"),
      s"""{"partitionToWriteStats":{"":[${
        stat("g", "g_0-0_001.parquet")}]}}""")
    Files.writeString(Paths.get(root, ".hoodie", "002.commit"),
      s"""{"partitionToWriteStats":{"":[${
        stat("g", "g_0-0_002.parquet",
          ""","cdcStats":{".g_cdc_002.log.1":1}""")},${
        stat("h", "h_0-0_002.parquet")}]}}""")
    val got = HudiCowLite.readChanges(spark, root, "001")
      .select(col("id"), col("v"), col("_change_type"),
        col("_commit_time"))
      .as[(Long, Long, String, String)].collect().sorted.toSeq
    // commit-global CDC handling would LOSE h's insert; group-grain
    // inference without the CDC leg would LOSE the unchanged update
    assert(got == Seq(
      (1L, 2L, "update_preimage", "002"),
      (1L, 2L, "update_postimage", "002"),
      (7L, 14L, "insert", "002")).sorted, got.toString)
  }

  test("file:-qualified URI root: cluster and clean run end-to-end " +
    "through Hadoop FS (a java.io walk of a scheme-prefixed root " +
    "finds nothing and silently reclaims nothing)") {
    import spark.implicits._
    val bare = "/tmp/graft_hudispec/uriroot"
    rm(new java.io.File(bare))
    Files.createDirectories(Paths.get(bare, ".hoodie"))
    Files.writeString(Paths.get(bare, ".hoodie", "hoodie.properties"),
      "hoodie.table.name=t\nhoodie.table.type=COPY_ON_WRITE\n")
    def one(df: org.apache.spark.sql.DataFrame, out: String): Unit = {
      val tmp = s"$bare/_tmp"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith(".")).get
      assert(part.renameTo(new java.io.File(s"$bare/$out")))
      rm(new java.io.File(tmp))
    }
    def batch(ids: Seq[Long], ct: String) = ids.toDF("id")
      .select(lit(ct).as("_hoodie_commit_time"),
        col("id").cast("string").as("_hoodie_record_key"),
        lit("").as("_hoodie_partition_path"),
        col("id"), (col("id") * 2).as("v"))
    one(batch(0L to 4L, "001"), "gA_0-0_001.parquet")
    one(batch(5L to 7L, "002"), "gB_0-0_002.parquet")
    def stat(fid: String, p: String) =
      s"""{"fileId":"$fid","path":"$p","numWrites":1}"""
    Files.writeString(Paths.get(bare, ".hoodie", "001.commit"),
      s"""{"partitionToWriteStats":{"":[${
        stat("gA", "gA_0-0_001.parquet")}]}}""")
    Files.writeString(Paths.get(bare, ".hoodie", "002.commit"),
      s"""{"partitionToWriteStats":{"":[${
        stat("gB", "gB_0-0_002.parquet")}]}}""")
    val root = s"file:$bare"
    val before = HudiCowLite.read(spark, root)
      .select("id", "v").as[(Long, Long)].collect().sorted.toSeq
    assert(before.size == 8)
    assert(HudiCowLite.cluster(spark, root) == "003")
    assert(HudiCowLite.read(spark, root)
      .select("id", "v").as[(Long, Long)].collect().sorted.toSeq ==
      before)
    // clean reclaims the two superseded bases through Hadoop FS
    val deleted = HudiCowLite.clean(spark, root)
    assert(deleted.map(_.split('/').last).sorted ==
      Seq("gA_0-0_001.parquet", "gB_0-0_002.parquet"),
      s"deleted: $deleted")
    assert(HudiCowLite.read(spark, root)
      .select("id", "v").as[(Long, Long)].collect().sorted.toSeq ==
      before)
    assert(HudiCowLite.clean(spark, root) == Nil)
  }

  test("upsert rewrites touched groups by record key, routes new keys " +
    "to a fresh group, and the inferred CDC reports exactly the " +
    "changes; writeCdc additionally surfaces unchanged-value " +
    "rewrites; delete advances fully-dead groups to empty bases") {
    import spark.implicits._
    def author(name: String): String = {
      val root = s"/tmp/graft_hudispec/$name"
      rm(new java.io.File(root))
      Files.createDirectories(Paths.get(root, ".hoodie"))
      Files.writeString(Paths.get(root, ".hoodie", "hoodie.properties"),
        "hoodie.table.name=t\nhoodie.table.type=COPY_ON_WRITE\n")
      def one(df: org.apache.spark.sql.DataFrame, out: String): Unit = {
        val tmp = s"$root/_tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.endsWith(".parquet") &&
            !f.getName.startsWith(".")).get
        assert(part.renameTo(new java.io.File(s"$root/$out")))
        rm(new java.io.File(tmp))
      }
      def batch(ids: Seq[Long], ct: String) = ids.toDF("id")
        .select(lit(ct).as("_hoodie_commit_time"),
          col("id").cast("string").as("_hoodie_record_key"),
          col("id"), (col("id") * 2).as("v"))
      one(batch(0L to 4L, "001"), "gA_0-0_001.parquet")
      one(batch(10L to 11L, "002"), "gB_0-0_002.parquet")
      def stat(fid: String, p: String) =
        s"""{"fileId":"$fid","path":"$p","numWrites":1}"""
      Files.writeString(Paths.get(root, ".hoodie", "001.commit"),
        s"""{"partitionToWriteStats":{"":[${
          stat("gA", "gA_0-0_001.parquet")}]}}""")
      Files.writeString(Paths.get(root, ".hoodie", "002.commit"),
        s"""{"partitionToWriteStats":{"":[${
          stat("gB", "gB_0-0_002.parquet")}]}}""")
      root
    }
    // updates: id 1 → v=99 (gA), id 10 → v=20 UNCHANGED (gB),
    // id 20 → NEW key
    def updates = Seq((1L, 99L), (10L, 20L), (20L, 40L)).toDF("id", "v")
      .withColumn("_hoodie_record_key", col("id").cast("string"))
    val root = author("upsert")
    assert(HudiCowLite.upsert(spark, root, updates) == "003")
    val got = HudiCowLite.read(spark, root)
      .select("id", "v").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((0L, 0L), (1L, 99L), (2L, 4L), (3L, 6L),
      (4L, 8L), (10L, 20L), (11L, 22L), (20L, 40L)))
    // carried rows KEEP their commit time; upserted rows stamp 003
    val times = HudiCowLite.read(spark, root)
      .select(col("id"), col("_hoodie_commit_time"))
      .as[(Long, String)].collect().toMap
    assert(times(1L) == "003" && times(2L) == "001" &&
      times(10L) == "003" && times(20L) == "003")
    // inferred CDC: id 1's update + id 20's insert; id 10's
    // unchanged-value rewrite is invisible to a diff
    val cdc = HudiCowLite.readChanges(spark, root, "002")
      .select(col("id"), col("v"), col("_change_type"))
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(cdc == Seq((1L, 2L, "update_preimage"),
      (1L, 99L, "update_postimage"), (20L, 40L, "insert")).sorted,
      cdc.toString)
    // writeCdc: the WRITTEN record surfaces id 10's unchanged rewrite
    val root2 = author("upsertcdc")
    assert(HudiCowLite.upsert(spark, root2, updates,
      writeCdc = true) == "003")
    val cdc2 = HudiCowLite.readChanges(spark, root2, "002")
      .select(col("id"), col("v"), col("_change_type"))
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(cdc2 == Seq((1L, 2L, "update_preimage"),
      (1L, 99L, "update_postimage"), (10L, 20L, "update_preimage"),
      (10L, 20L, "update_postimage"), (20L, 40L, "insert")).sorted,
      cdc2.toString)
    // duplicate keys in one batch refuse
    val eDup = intercept[IllegalStateException] {
      HudiCowLite.upsert(spark, root,
        updates.unionByName(updates))
    }
    assert(eDup.getMessage.contains("DUPLICATE"))
    // DELETE: kill id 0 (partial gA) and ALL of gB — gB advances to
    // an empty base, its rows gone, the group intact
    val root3 = author("hudidelete")
    assert(HudiCowLite.delete(spark, root3,
      col("id") === 0 || col("id") >= 10) == "003")
    val got3 = HudiCowLite.read(spark, root3)
      .select("id", "v").as[(Long, Long)].collect().sorted.toSeq
    assert(got3 == Seq((1L, 2L), (2L, 4L), (3L, 6L), (4L, 8L)))
    val cdc3 = HudiCowLite.readChanges(spark, root3, "002")
      .select(col("id"), col("_change_type"))
      .as[(Long, String)].collect().sorted.toSeq
    assert(cdc3 == Seq((0L, "delete"), (10L, "delete"),
      (11L, "delete")), cdc3.toString)
    // a no-match delete commits NOTHING
    assert(HudiCowLite.delete(spark, root3, col("id") > 100) == "003")
    // NULL predicate rows survive (DELETE WHERE semantics)
    val root4 = author("hudidelnull")
    assert(HudiCowLite.delete(spark, root4,
      when(col("id") < 2, lit(true))) == "003")
    assert(HudiCowLite.read(spark, root4).select("id").as[Long]
      .collect().sorted.toSeq == Seq(2L, 3L, 4L, 10L, 11L))
  }

  test("upsert refuses a record key living in MULTIPLE file groups " +
    "(non-global index: keys are only unique per partition — a " +
    "key-only route would duplicate the row into every group)") {
    import spark.implicits._
    val root = "/tmp/graft_hudispec/multigroupkey"
    rm(new java.io.File(root))
    Files.createDirectories(Paths.get(root, ".hoodie"))
    Files.writeString(Paths.get(root, ".hoodie", "hoodie.properties"),
      "hoodie.table.name=t\nhoodie.table.type=COPY_ON_WRITE\n")
    def one(df: org.apache.spark.sql.DataFrame, out: String): Unit = {
      val tmp = s"$root/_tmp"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith(".")).get
      Files.createDirectories(Paths.get(s"$root/$out").getParent)
      assert(part.renameTo(new java.io.File(s"$root/$out")))
      rm(new java.io.File(tmp))
    }
    // the SAME record key "7" in two partitions — legal under Hudi's
    // default non-global index
    def batch(part: String) = Seq(7L).toDF("id")
      .select(lit("001").as("_hoodie_commit_time"),
        col("id").cast("string").as("_hoodie_record_key"),
        lit(part).as("_hoodie_partition_path"),
        col("id"), (col("id") * 2).as("v"))
    one(batch("p=x"), "p=x/gX_0-0_001.parquet")
    one(batch("p=y"), "p=y/gY_0-0_001.parquet")
    Files.writeString(Paths.get(root, ".hoodie", "001.commit"),
      """{"partitionToWriteStats":{"p=x":[{"fileId":"gX","path":"p=x/gX_0-0_001.parquet","numWrites":1}],"p=y":[{"fileId":"gY","path":"p=y/gY_0-0_001.parquet","numWrites":1}]}}""")
    val updates = Seq((7L, 99L)).toDF("id", "v")
      .withColumn("_hoodie_record_key", col("id").cast("string"))
      .withColumn("_hoodie_partition_path", lit("p=x"))
    val e = intercept[IllegalStateException] {
      HudiCowLite.upsert(spark, root, updates)
    }
    assert(e.getMessage.contains("MULTIPLE file groups"), e.getMessage)
    // the refusal left the table untouched
    assert(HudiCowLite.read(spark, root).select("v").as[Long]
      .collect().sorted.toSeq == Seq(14L, 14L))
  }

  test("randomized maintenance model check: reads stay model-equal " +
    "through insert/UPSERT/DELETE/cluster/clean sequences over two " +
    "partitions, across seeds") {
    import spark.implicits._
    for (seed <- Seq(31, 507, 948)) {
      val rnd = new scala.util.Random(seed)
      val root = s"/tmp/graft_hudispec/maint$seed"
      rm(new java.io.File(root))
      Files.createDirectories(Paths.get(root, ".hoodie"))
      Files.writeString(Paths.get(root, ".hoodie", "hoodie.properties"),
        "hoodie.table.name=t\nhoodie.table.type=COPY_ON_WRITE\n")
      val partitions = Seq("p=x", "p=y")
      def writeGroup(rows: Seq[(Long, Long)], part: String, ct: String,
                     out: String): Unit = {
        val tmp = s"$root/_tmp"
        rows.toDF("id", "v")
          .select(lit(ct).as("_hoodie_commit_time"),
            col("id").cast("string").as("_hoodie_record_key"),
            lit(part).as("_hoodie_partition_path"),
            col("id"), col("v"))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val f = new java.io.File(tmp).listFiles()
          .find(f => f.getName.endsWith(".parquet") &&
            !f.getName.startsWith(".")).get
        Files.createDirectories(Paths.get(s"$root/$out").getParent)
        assert(f.renameTo(new java.io.File(s"$root/$out")))
        rm(new java.io.File(tmp))
      }
      // model: the live rows per partition (clustering and cleaning
      // must never change them); instants minted in order
      var model = Map.empty[String, Set[(Long, Long)]]
        .withDefaultValue(Set.empty)
      var nextKey = 0L
      var instant = 0
      def check(): Unit = {
        val got = HudiCowLite.read(spark, root)
          .select(col("_hoodie_partition_path"), col("id"), col("v"))
          .as[(String, Long, Long)].collect()
          .groupBy(_._1).map { case (p, rs) =>
            p -> rs.map(r => (r._2, r._3)).toSet
          }
        assert(got == model.filter(_._2.nonEmpty),
          s"seed $seed after instant $instant")
      }
      val nOps = 6 + rnd.nextInt(4)
      for (_ <- 1 to nOps) {
        instant += 1
        val ct = f"$instant%03d"
        val op =
          if (model.values.forall(_.isEmpty)) "insert"
          else Seq("insert", "insert", "cluster", "clean",
            "upsert", "rowdelete")(rnd.nextInt(6))
        op match {
          case "insert" =>
            val part = partitions(rnd.nextInt(2))
            val n = 2 + rnd.nextInt(4)
            val rows = (nextKey until nextKey + n).map(k => k -> k * 3)
            nextKey += 100
            val fid = s"g$ct"
            val rel = s"$part/${fid}_0-0_$ct.parquet"
            writeGroup(rows, part, ct, rel)
            Files.writeString(Paths.get(root, ".hoodie", s"$ct.commit"),
              s"""{"partitionToWriteStats":{"$part":[{"fileId":"$fid","path":"$rel","numWrites":${rows.size}}]}}""")
            model += part -> (model(part) ++ rows)
          case "cluster" =>
            assert(HudiCowLite.cluster(spark, root) == ct)
            // per-partition packing: one group per non-empty partition
            val snap = HudiCowLite.snapshot(spark, root)
            val perPart = snap.groups.keys.toSeq.groupBy(_._1)
            assert(perPart.forall(_._2.size == 1),
              s"seed $seed: $perPart")
          case "upsert" =>
            // the REAL writer: updated keys rewrite their groups in
            // place, new keys land in a fresh group per partition
            val existing = model.toSeq.flatMap { case (p, rs) =>
              rs.toSeq.map(r => (p, r)) }
            val picks = rnd.shuffle(existing).take(1 + rnd.nextInt(3))
            val newN = rnd.nextInt(2)
            val newRows = (nextKey until nextKey + newN)
              .map(k => k -> k * 7)
            nextKey += 100
            val newPart = partitions(rnd.nextInt(2))
            val upd = (picks.map { case (p, (k, _)) =>
              (k, k * 5 + 1, p) } ++
              newRows.map { case (k, v) => (k, v, newPart) })
              .toDF("id", "v", "_hoodie_partition_path")
              .withColumn("_hoodie_record_key",
                col("id").cast("string"))
            assert(HudiCowLite.upsert(spark, root, upd) == ct,
              s"seed $seed upsert instant")
            model = picks.foldLeft(model) { case (m, (p, (k, v))) =>
              m + (p -> (m(p) - ((k, v)) + ((k, k * 5 + 1))))
            }
            model += newPart -> (model(newPart) ++ newRows)
          case "rowdelete" =>
            // the REAL writer: matching rows die, a fully-matched
            // group advances to an empty base; no match → NO commit
            val r = rnd.nextInt(3)
            val matching = model.toSeq.flatMap { case (p, rs) =>
              rs.toSeq.filter(_._1 % 3 == r).map(p -> _) }
            val got = HudiCowLite.delete(spark, root,
              col("id") % 3 === r)
            if (matching.isEmpty) {
              instant -= 1 // a no-op delete is not a table change
              assert(got != ct, s"seed $seed no-op delete committed")
            } else {
              assert(got == ct, s"seed $seed delete instant")
              model = matching.foldLeft(model) { case (m, (p, row)) =>
                m + (p -> (m(p) - row))
              }
            }
          case "clean" =>
            instant -= 1 // clean mints its own marker, not a commit
            HudiCowLite.clean(spark, root): Unit
        }
        check()
      }
      // a final cluster + clean leaves exactly one file per live
      // partition on disk (plus the timeline)
      instant += 1
      HudiCowLite.cluster(spark, root): Unit
      HudiCowLite.clean(spark, root): Unit
      check()
      val live = HudiCowLite.snapshot(spark, root).files.toSet
      def walk(d: java.io.File): Seq[java.io.File] =
        Option(d.listFiles()).toSeq.flatten.flatMap { f =>
          if (f.getName.startsWith(".") || f.getName.startsWith("_")) Nil
          else if (f.isDirectory) walk(f)
          else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
        }
      assert(walk(new java.io.File(root))
        .map(_.getCanonicalPath).toSet ==
        live.map(p => new java.io.File(p).getCanonicalPath))
    }
  }

  test("randomized model check: the inferred CDC of every commit " +
    "range equals the in-memory key-diff model, across seeds") {
    import spark.implicits._
    for (seed <- Seq(19, 244, 871)) {
      val rnd = new scala.util.Random(seed)
      val root = s"/tmp/graft_hudispec/cdcmodel$seed"
      rm(new java.io.File(root))
      Files.createDirectories(Paths.get(root, ".hoodie"))
      Files.writeString(Paths.get(root, ".hoodie", "hoodie.properties"),
        "hoodie.table.name=t\nhoodie.table.type=COPY_ON_WRITE\n")
      def writeGroup(rows: Seq[(Long, Long)], ct: String,
                     out: String): Unit = {
        val tmp = s"$root/_tmp"
        rows.toDF("id", "v")
          .select(lit(ct).as("_hoodie_commit_time"),
            col("id").cast("string").as("_hoodie_record_key"),
            col("id"), col("v"))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.endsWith(".parquet") &&
            !f.getName.startsWith(".")).get
        assert(part.renameTo(new java.io.File(s"$root/$out")))
        rm(new java.io.File(tmp))
      }
      var groups = Map.empty[String, Map[Long, Long]]
      var nextKey = 0L
      val nCommits = 3 + rnd.nextInt(3)
      val instants = (1 to nCommits).map(i => f"$i%03d")
      val expected = scala.collection.mutable.ArrayBuffer
        .empty[(String, Seq[(Long, Long, String)])]
      for ((ct, i) <- instants.zipWithIndex) {
        val op = if (groups.isEmpty) "add"
          else Seq("add", "rewrite")(rnd.nextInt(2))
        val (fid, changes) = op match {
          case "add" =>
            val g = s"g$ct"
            val n = 3 + rnd.nextInt(4)
            val rows = (nextKey until nextKey + n).map(k => k -> k * 2)
            nextKey += 100
            groups += g -> rows.toMap
            writeGroup(rows, ct, s"${g}_0-0_$ct.parquet")
            (g, rows.map { case (k, v) => (k, v, "insert") })
          case "rewrite" =>
            val g = groups.keys.toSeq.sorted.apply(rnd.nextInt(groups.size))
            val old = groups(g)
            val fates = old.toSeq.sortBy(_._1).map { case (k, v) =>
              (k, v, rnd.nextInt(10))
            }
            val kept = fates.collect {
              case (k, v, f) if f >= 3 && f < 7 => k -> v // carried
              case (k, v, f) if f >= 7 => k -> (v + 1000L * (i + 1))
            }
            groups += g -> kept.toMap
            writeGroup(kept, ct, s"${g}_0-0_$ct.parquet")
            (g, fates.flatMap {
              case (k, v, f) if f < 3 => Seq((k, v, "delete"))
              case (k, v, f) if f >= 7 =>
                Seq((k, v, "update_preimage"),
                  (k, v + 1000L * (i + 1), "update_postimage"))
              case _ => Nil
            })
        }
        Files.writeString(Paths.get(root, ".hoodie", s"$ct.commit"),
          s"""{"partitionToWriteStats":{"":[{"fileId":"$fid","path":"${fid}_0-0_$ct.parquet","numWrites":1}]}}""")
        expected += ((ct, changes))
      }
      for (from <- instants.init) {
        val want = expected.filter(_._1 > from).flatMap {
          case (ct, chs) => chs.map { case (k, v, t) => (k, v, t, ct) }
        }.sorted.toSeq
        // every commit writes a file, so the range always reads — a
        // commit whose rewrite only carried rows contributes zero
        // change rows, which the model must agree with
        val got = HudiCowLite.readChanges(spark, root, from)
          .select(col("id"), col("v"), col("_change_type"),
            col("_commit_time"))
          .as[(Long, Long, String, String)].collect().sorted.toSeq
        assert(got == want,
          s"seed $seed range ($from, ${instants.last}]: got $got, " +
            s"want $want")
      }
    }
  }

  test("cluster packs all groups under one replacecommit: read " +
    "unchanged, incremental still commit-filters, CDC across refuses") {
    import spark.implicits._
    val root = incFixture("cluster")
    val before = HudiCowLite.read(spark, root)
      .select("id", "v").as[(Long, Long)].collect().sorted.toSeq
    val instant = HudiCowLite.cluster(spark, root)
    assert(instant == "004")
    val after = HudiCowLite.read(spark, root)
      .select("id", "v").as[(Long, Long)].collect().sorted.toSeq
    assert(after == before)
    val snap = HudiCowLite.snapshot(spark, root)
    assert(snap.groups.size == 1 && snap.hasReplace)
    // incremental across the replacecommit: the widened scan's
    // commit-time filter still serves exactly the (002, 004] writes
    assert(HudiCowLite.readIncremental(spark, root, "002")
      .select("id").as[Long].collect().sorted.toSeq == Seq(20L, 21L))
    // the CDC read refuses a range crossing the replacecommit
    val e = intercept[IllegalStateException] {
      HudiCowLite.readChanges(spark, root, "002")
    }
    assert(e.getMessage.contains("replacecommit"))
    // clustering twice stays content-identical
    assert(HudiCowLite.cluster(spark, root) == "005")
    assert(HudiCowLite.read(spark, root)
      .select("id", "v").as[(Long, Long)].collect().sorted.toSeq ==
      after)
    // CLEAN reclaims every superseded base file (gA's two versions,
    // gB, gC, the first clustering's file) and never the live one;
    // the clean marker is NOT a completed data commit
    val deleted = HudiCowLite.clean(spark, root)
    assert(deleted.size == 5, s"deleted: $deleted")
    assert(deleted.exists(_.contains("gA_0-0_001")) &&
      deleted.exists(_.contains("cl004")))
    assert(HudiCowLite.read(spark, root)
      .select("id", "v").as[(Long, Long)].collect().sorted.toSeq ==
      after)
    assert(!HudiCowLite.completedCommits(spark, root).contains("006"))
    // clean twice: nothing left
    assert(HudiCowLite.clean(spark, root) == Nil)
  }

  test("multi-partition cluster packs per partition via " +
    "_hoodie_partition_path; tables lacking the meta column refuse") {
    import spark.implicits._
    def build(name: String, withMeta: Boolean): String = {
      val root = s"/tmp/graft_hudispec/$name"
      rm(new java.io.File(root))
      Files.createDirectories(Paths.get(root, ".hoodie"))
      Files.writeString(Paths.get(root, ".hoodie", "hoodie.properties"),
        "hoodie.table.name=t\nhoodie.table.type=COPY_ON_WRITE\n")
      def one(df: org.apache.spark.sql.DataFrame, out: String): Unit = {
        val tmp = s"$root/_tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.endsWith(".parquet") &&
            !f.getName.startsWith(".")).get
        Files.createDirectories(Paths.get(s"$root/$out").getParent)
        assert(part.renameTo(new java.io.File(s"$root/$out")))
        rm(new java.io.File(tmp))
      }
      def batch(ids: Range, part: String) = {
        val b = spark.range(ids.start, ids.end)
          .select(col("id"), (col("id") * 2).as("v"))
        if (withMeta)
          b.withColumn("_hoodie_partition_path", lit(s"p=$part"))
        else b
      }
      one(batch(0 until 3, "x"), "p=x/gx1_0-0_001.parquet")
      one(batch(3 until 5, "x"), "p=x/gx2_0-0_001.parquet")
      one(batch(10 until 14, "y"), "p=y/gy1_0-0_001.parquet")
      one(batch(14 until 15, "y"), "p=y/gy2_0-0_001.parquet")
      def stat(fid: String, p: String) =
        s"""{"fileId":"$fid","path":"$p","numWrites":1}"""
      Files.writeString(Paths.get(root, ".hoodie", "001.commit"),
        s"""{"partitionToWriteStats":{"p=x":[${stat("gx1",
          "p=x/gx1_0-0_001.parquet")},${stat("gx2",
          "p=x/gx2_0-0_001.parquet")}],"p=y":[${stat("gy1",
          "p=y/gy1_0-0_001.parquet")},${stat("gy2",
          "p=y/gy2_0-0_001.parquet")}]}}""")
      root
    }
    val root = build("clusterpart", withMeta = true)
    val before = HudiCowLite.read(spark, root)
      .select("id", "v").as[(Long, Long)].collect().sorted.toSeq
    assert(before.size == 10)
    val instant = HudiCowLite.cluster(spark, root)
    assert(instant == "002")
    assert(HudiCowLite.read(spark, root)
      .select("id", "v").as[(Long, Long)].collect().sorted.toSeq ==
      before)
    val snap = HudiCowLite.snapshot(spark, root)
    // one new file group per partition, placed under its partition dir
    assert(snap.groups.size == 2)
    assert(snap.groups.keys.map(_._1).toSet == Set("p=x", "p=y"))
    assert(snap.files.forall(f =>
      f.contains("/p=x/cl002") || f.contains("/p=y/cl002")))
    // write stats carry REAL row counts per partition
    val commitJson = Files.readString(
      Paths.get(root, ".hoodie", "002.replacecommit"))
    assert(commitJson.contains("\"numWrites\":5"))
    assert(!commitJson.contains("\"numWrites\":1,") &&
      !commitJson.contains("\"numWrites\":1}"))
    // without the meta column, multi-partition clustering refuses
    val root2 = build("clusterpartbare", withMeta = false)
    val e = intercept[IllegalStateException] {
      HudiCowLite.cluster(spark, root2)
    }
    assert(e.getMessage.contains("_hoodie_partition_path"))
  }

  test("latest base file per file group wins; older one is never read") {
    val root = fixture("happy")
    val snap = HudiCowLite.snapshot(spark, root)
    assert(snap.instant == "002")
    assert(snap.files == Seq(s"$root/p=x/g_0-0_002.parquet"))
    assert(HudiCowLite.read(spark, root)
      .agg(min(col("id")), count(lit(1))).head().toSeq == Seq(5L, 5L))
  }

  test("asOfInstant replays to the older base file; unknown instant " +
    "refuses") {
    val root = fixture("asof")
    assert(HudiCowLite.read(spark, root, Some("001"))
      .agg(max(col("id"))).head().getLong(0) == 4L)
    val e = intercept[IllegalArgumentException] {
      HudiCowLite.snapshot(spark, root, Some("000"))
    }
    assert(e.getMessage.contains("instant 000"))
  }

  test("inflight and requested instants are never read") {
    val root = fixture("inflight")
    Files.writeString(
      Paths.get(root, ".hoodie", "003.commit.inflight"), "")
    Files.writeString(
      Paths.get(root, ".hoodie", "003.commit.requested"), "")
    assert(HudiCowLite.snapshot(spark, root).instant == "002")
  }

  test("MOR snapshot query and COW deltacommit refuse loudly") {
    // MOR WITHOUT readOptimized: the snapshot query needs log merging
    val e1 = intercept[IllegalStateException] {
      HudiCowLite.snapshot(spark, fixture("mor", "MERGE_ON_READ"))
    }
    assert(e1.getMessage.contains("readOptimized"))
    // a deltacommit inside a COPY_ON_WRITE timeline is malformed
    val r3 = fixture("delta")
    Files.writeString(Paths.get(r3, ".hoodie", "004.deltacommit"), "{}")
    val e3 = intercept[IllegalStateException] {
      HudiCowLite.snapshot(spark, r3)
    }
    assert(e3.getMessage.contains("deltacommit"))
  }

  /** MOR fixture: deltacommit 001 inserts base ids 0..4; deltacommit
    * 002 logs a junk `.log` write for the same group; commit 003
    * (compaction) rewrites the base to ids 0..9. */
  private def morFixture(name: String, compact: Boolean): String = {
    val root = s"/tmp/graft_hudispec/$name"
    rm(new java.io.File(root))
    Files.createDirectories(Paths.get(root, ".hoodie"))
    Files.createDirectories(Paths.get(root, "p=x"))
    Files.writeString(Paths.get(root, ".hoodie", "hoodie.properties"),
      "hoodie.table.name=t\nhoodie.table.type=MERGE_ON_READ\n")
    val df = spark.range(0, 10).select(col("id"), (col("id") * 2).as("v"))
    def one(filter: org.apache.spark.sql.Column, out: String): Unit = {
      val tmp = s"$root/_tmp"
      df.filter(filter).coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith(".")).get
      assert(part.renameTo(new java.io.File(s"$root/$out")))
      rm(new java.io.File(tmp))
    }
    one(col("id") < 5, "p=x/g_0-0_001.parquet")
    def instant(name: String, path: String): Unit =
      Files.writeString(Paths.get(root, ".hoodie", name),
        s"""{"partitionToWriteStats":{"p=x":[{"fileId":"g","path":"$path","numWrites":5}]}}""")
    instant("001.deltacommit", "p=x/g_0-0_001.parquet")
    Files.writeString(Paths.get(root, "p=x", ".g_001.log.1"),
      "NOT-A-PARQUET-LOG-BLOCK")
    instant("002.deltacommit", "p=x/.g_001.log.1")
    if (compact) {
      one(col("id") >= 0, "p=x/g_0-0_003.parquet")
      instant("003.commit", "p=x/g_0-0_003.parquet")
    }
    root
  }

  test("MOR read-optimized serves deltacommit base inserts, never logs") {
    val root = morFixture("morro", compact = false)
    val snap = HudiCowLite.snapshot(spark, root, readOptimized = true)
    assert(snap.instant == "002")
    // the 002 log write did NOT clobber the group's base file
    assert(snap.files == Seq(s"$root/p=x/g_0-0_001.parquet"))
    assert(HudiCowLite.read(spark, root, readOptimized = true)
      .agg(max(col("id")), count(lit(1))).head().toSeq == Seq(4L, 5L))
  }

  test("MOR read-optimized advances at compaction") {
    val root = morFixture("morcompact", compact = true)
    val snap = HudiCowLite.snapshot(spark, root, readOptimized = true)
    assert(snap.instant == "003")
    assert(snap.files == Seq(s"$root/p=x/g_0-0_003.parquet"))
    assert(HudiCowLite.read(spark, root, readOptimized = true)
      .agg(max(col("id")), count(lit(1))).head().toSeq == Seq(9L, 10L))
    // time travel to the pre-compaction instant: base-only view again
    assert(HudiCowLite.read(spark, root, Some("002"),
      readOptimized = true).agg(max(col("id"))).head().getLong(0) == 4L)
  }

  test("ORC base files read natively (hoodie base.file.format=ORC)") {
    val root = s"/tmp/graft_hudispec/orc"
    rm(new java.io.File(root))
    Files.createDirectories(Paths.get(root, ".hoodie"))
    Files.createDirectories(Paths.get(root, "p=x"))
    Files.writeString(Paths.get(root, ".hoodie", "hoodie.properties"),
      "hoodie.table.name=t\nhoodie.table.type=COPY_ON_WRITE\n" +
        "hoodie.table.base.file.format=ORC\n")
    val tmp = s"$root/_tmp"
    spark.range(0, 7).select(col("id"), (col("id") * 2).as("v"))
      .coalesce(1).write.mode("overwrite").orc(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.endsWith(".orc") &&
        !f.getName.startsWith(".")).get
    assert(part.renameTo(new java.io.File(s"$root/p=x/g_0-0_001.orc")))
    rm(new java.io.File(tmp))
    Files.writeString(Paths.get(root, ".hoodie", "001.commit"),
      """{"partitionToWriteStats":{"p=x":[{"fileId":"g","path":"p=x/g_0-0_001.orc","numWrites":7}]}}""")
    assert(HudiCowLite.read(spark, root)
      .agg(max(col("id")), count(lit(1))).head().toSeq == Seq(6L, 7L))
  }

  test("readOptimized is a no-op on COPY_ON_WRITE") {
    val root = fixture("cowro")
    assert(HudiCowLite.snapshot(spark, root, readOptimized = true).files ==
      HudiCowLite.snapshot(spark, root).files)
  }

  test("replacecommit replaces file groups; asOf before it still " +
    "reads the replaced generation") {
    val root = fixture("repl")
    // instant 003 clusters group g away, writing group h whose base
    // file is the 001 parquet (ids 0..4) — replay must read ONLY h
    Files.writeString(Paths.get(root, ".hoodie", "003.replacecommit"),
      """{"partitionToReplaceFileIds":{"p=x":["g"]},
        |"partitionToWriteStats":{"p=x":[
        | {"fileId":"h","path":"p=x/g_0-0_001.parquet","numWrites":5}]}}"""
        .stripMargin)
    val snap = HudiCowLite.snapshot(spark, root)
    assert(snap.instant == "003")
    assert(snap.files == Seq(s"$root/p=x/g_0-0_001.parquet"))
    assert(HudiCowLite.read(spark, root)
      .agg(max(col("id")), count(lit(1))).head().toSeq == Seq(4L, 5L))
    // time travel to 002 still serves the pre-clustering generation
    assert(HudiCowLite.read(spark, root, Some("002"))
      .agg(min(col("id"))).head().getLong(0) == 5L)
    // a replacecommit without partitionToReplaceFileIds is malformed
    Files.writeString(Paths.get(root, ".hoodie", "004.replacecommit"),
      """{"partitionToWriteStats":{}}""")
    val e = intercept[IllegalStateException] {
      HudiCowLite.snapshot(spark, root)
    }
    assert(e.getMessage.contains("partitionToReplaceFileIds"))
  }

  test("instants order numerically, not lexicographically") {
    // variable-width instants "9" < "10" numerically but "10" < "9"
    // lexicographically — the missort this guards: a lexicographic
    // replay would leave instant "9"'s (older) base file live
    val root = fixture("numorder")
    for (old <- Seq("001", "002"))
      Files.delete(Paths.get(root, ".hoodie", s"$old.commit"))
    def commit(instant: String, path: String): Unit =
      Files.writeString(Paths.get(root, ".hoodie", s"$instant.commit"),
        s"""{"partitionToWriteStats":{"p=x":[{"fileId":"g","path":"$path","numWrites":5}]}}""")
    commit("9", "p=x/g_0-0_001.parquet")
    commit("10", "p=x/g_0-0_002.parquet")
    val snap = HudiCowLite.snapshot(spark, root)
    assert(snap.instant == "10")
    assert(snap.files == Seq(s"$root/p=x/g_0-0_002.parquet"))
    // numeric takeWhile: asOf("9") replays ONLY instant 9 (a
    // lexicographic replay would include "10" ≤ "9" and serve 002)
    assert(HudiCowLite.snapshot(spark, root, Some("9"))
      .files == Seq(s"$root/p=x/g_0-0_001.parquet"))
  }

  test("zero-base-file snapshot refuses loudly on read") {
    val root = s"/tmp/graft_hudispec/emptysnap"
    rm(new java.io.File(root))
    Files.createDirectories(Paths.get(root, ".hoodie"))
    Files.writeString(Paths.get(root, ".hoodie", "hoodie.properties"),
      "hoodie.table.name=t\nhoodie.table.type=COPY_ON_WRITE\n")
    Files.writeString(Paths.get(root, ".hoodie", "001.commit"),
      """{"partitionToWriteStats":{}}""")
    val e = intercept[IllegalStateException] {
      HudiCowLite.read(spark, root)
    }
    assert(e.getMessage.contains("zero base"))
  }

  test("malformed commit JSON and missing .hoodie refuse loudly") {
    val root = fixture("bad")
    Files.writeString(Paths.get(root, ".hoodie", "003.commit"), "{nope")
    val e = intercept[IllegalStateException] {
      HudiCowLite.snapshot(spark, root)
    }
    assert(e.getMessage.contains("malformed commit 003"))
    intercept[IllegalStateException] {
      HudiCowLite.snapshot(spark, "/tmp/graft_hudispec/nope")
    }
  }
}
