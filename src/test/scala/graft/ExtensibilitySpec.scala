package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensibilitySpec extends AnyFunSuite {
  import TestSession._

  test("q90 kmv sketch estimates distinct tokens within 20% of exact") {
    // the 20% bound is computed inside the query as `approx_ok`
    // (that's what makes the oracle row hash-matchable)
    val rows = SparkEntry.queries("q90_kmv_sketch")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_ok"),
        s"lang=${r.getAs[String]("lang")}: " +
          s"exact=${r.getAs[Long]("exact_distinct")} outside 20% bound")
    }
  }

  test("custom functions work from plain SQL via GraftExtensions") {
    GraftExtensions.register(spark)
    Tables.registerAll(spark, sf)
    val rows = spark.sql(
      """SELECT lang, kmv_distinct(split(text, ' ')) AS est,
        |       count(DISTINCT simhash64(split(text, ' '))) AS n_sigs
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getAs[Double]("est") > 0))
  }

  test("misra_gries works from plain SQL and rejects a non-literal k") {
    GraftExtensions.register(spark)
    Tables.registerAll(spark, sf)
    val rows = spark.sql(
      """SELECT e.token, e.weight
        |FROM (SELECT misra_gries(lang, 8) AS s FROM documents)
        |  LATERAL VIEW explode(s) t AS e
        |ORDER BY e.weight DESC, e.token""".stripMargin).collect()
    // 5 languages, k=8 >= distinct: the sketch is the exact census
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Long]("weight")).sum ==
      spark.table("documents").count())
    val err = intercept[Exception](spark.sql(
      "SELECT misra_gries(lang, CAST(n_chars AS INT)) FROM documents")
      .collect())
    assert(err.getMessage.toLowerCase.contains("literal"),
      err.getMessage)
  }

  test("dedup/ANN primitive kernels compose the q75 shape from plain " +
    "SQL (and knob arguments must be literals)") {
    GraftExtensions.register(spark)
    Tables.registerAll(spark, sf)
    // a SQL-only user's LSH candidate query: band the corpus, self-join
    // on the band key, verify with the exact kernel
    val rows = spark.sql(
      """WITH banded AS (
        |  SELECT doc_id,
        |    posexplode(minhash_bands(split(text, ' '), 4, 8))
        |      AS (band, bh)
        |  FROM documents WHERE doc_id <= 60)
        |SELECT x.doc_id AS a_id, y.doc_id AS b_id
        |FROM banded x JOIN banded y
        |  ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin).collect()
    assert(rows.nonEmpty, "LSH bands from SQL found no candidates")
    val scalar = spark.sql(
      """SELECT
        |  size(minhash_signature(array('a','b'), 16)) AS sig_n,
        |  lsh_bucket(array(1.0d, -2.0d), 6, 7) AS bucket,
        |  jaccard_sorted_longs(array(1L, 2L, 3L), array(2L, 3L, 4L))
        |    AS jac,
        |  char_class_counts('Ab1 !') AS ccc""".stripMargin).collect().head
    assert(scalar.getAs[Int]("sig_n") == 16)
    assert(math.abs(scalar.getAs[Double]("jac") - 0.5) < 1e-12)
    assert(scalar.getAs[Seq[Long]]("ccc").sum == 5L,
      "char classes must cover every char of 'Ab1 !'")
    // knobs are part of the generated kernel — non-literal rejected
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_signature(array('a'), doc_id) " +
        "FROM documents LIMIT 1").collect()
    }
    assert(e.getMessage.contains("INT literal") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("INT literal"))
  }

  test("withExtensions session builder injects the functions") {
    import org.apache.spark.sql.SparkSession
    val prev = spark // keep the shared session alive
    // getOrCreate only applies extensions to a NEW session: detach the
    // current default first, then restore it after.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val n = s2.sql("SELECT simhash64(array('a','b')) AS h").collect()
      assert(n.head.getLong(0) != 0L)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("q67 approx_count_distinct within 10% of exact") {
    val rows = SparkEntry.queries("q67_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_ok"),
        s"exact=${r.getAs[Long]("exact_parts")} outside 10% bound")
    }
  }

  test("q105 brickhouse: combine_unique dedups, bh_collect keeps duplicates") {
    val rows = SparkEntry.queries("q105_brickhouse")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val uniq = r.getAs[String]("uniq_toks").split(' ')
      val all = r.getAs[String]("all_toks").split(' ')
      assert(uniq.distinct.sameElements(uniq), "combine_unique must dedup")
      assert(uniq.sorted.sameElements(uniq) && all.sorted.sameElements(all),
        "both outputs must be sorted")
      assert(all.length >= uniq.length)
      assert(all.distinct.sorted.sameElements(uniq),
        "bh_collect's element set must equal combine_unique's output")
    }
  }

  test("brickhouse aggregators are merge-invariant across partitions") {
    import org.apache.spark.sql.functions._
    import graft.functions.Brickhouse
    val cu = udaf(Brickhouse.CombineUnique)
    val docs = Tables.df(spark, sf, "documents")
      .select(split(col("text"), " ").as("toks"))
    val one = docs.repartition(1).agg(cu(col("toks"))).collect().head.getSeq[String](0)
    val many = docs.repartition(8).agg(cu(col("toks"))).collect().head.getSeq[String](0)
    assert(one == many, "combine_unique must be merge-invariant")
  }

  test("kmv sketch merge across partitions is consistent") {
    import org.apache.spark.sql.functions._
    import graft.functions.KmvDistinctSketch.kmvDistinct
    import graft.functions.TextOps.tokens
    val docs = Tables.df(spark, sf, "documents")
    val onePart = docs.repartition(1)
      .agg(kmvDistinct(tokens(col("text"))).as("est")).collect().head.getDouble(0)
    val manyParts = docs.repartition(8)
      .agg(kmvDistinct(tokens(col("text"))).as("est")).collect().head.getDouble(0)
    assert(onePart == manyParts,
      s"sketch must be merge-invariant: $onePart vs $manyParts")
  }
}

/** Pin Spark-native hash outputs (murmur3 seed 42, xxhash64 seed 42L,
  * crc32) to known constants so q44's rows-only gate still has a strong
  * in-engine anchor across Spark upgrades. */
class SparkHashPinSpec extends org.scalatest.funsuite.AnyFunSuite {
  import TestSession._
  test("murmur3/xxhash64/crc32 of 'abc' match pinned values") {
    import org.apache.spark.sql.functions._
    val r = spark.range(1).select(
      hash(lit("abc")).as("m3"),
      xxhash64(lit("abc")).as("xx"),
      crc32(lit("abc").cast("binary")).as("crc")).collect().head
    assert(r.getAs[Int]("m3") == 1322437556)
    assert(r.getAs[Long]("xx") == 1423657621850124518L)
    assert(r.getAs[Long]("crc") == 891568578L)
  }

  test("Hive UDF bridge: detects both protocols, evaluates with null " +
    "semantics, rejects non-UDF classes") {
    import graft.functions.HiveUdfBridge
    // old-style UDF protocol (reflective evaluate)
    HiveUdfBridge.register(spark, "h_bin",
      "org.apache.hadoop.hive.ql.udf.UDFBin")
    // GenericUDF protocol (ObjectInspector negotiation)
    HiveUdfBridge.register(spark, "h_lpad",
      "org.apache.hadoop.hive.ql.udf.generic.GenericUDFLpad")
    val r = spark.sql(
      "SELECT h_bin(10L) AS b, h_lpad('7', 4, '0') AS p, " +
        "h_bin(CAST(NULL AS BIGINT)) AS bn").collect().head
    assert(r.getString(0) == "1010")
    assert(r.getString(1) == "0007")
    assert(r.isNullAt(2), "Hive null-in null-out must survive the bridge")
    // a random class must be rejected at registration, not at runtime
    intercept[IllegalArgumentException] {
      HiveUdfBridge.register(spark, "h_bad", "java.lang.String")
    }
  }
}
