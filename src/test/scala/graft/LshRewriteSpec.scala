package graft

import graft.functions.CosineSimilarity.cosineSim
import graft.functions.VectorOps.asDouble
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GraftLshRewrite: the cosine-threshold cross join must become a bucket
  * equi-join (no nested loop) and return a subset of the exact result. */
class LshRewriteSpec extends AnyFunSuite {
  import TestSession._

  private def pairsQuery() = {
    val c = Tables.df(spark, sf, "embeddings")
      .filter(col("vec_id") <= 200)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val a = c.select(col("vec_id").as("a_id"), col("v").as("va"))
    val b = c.select(col("vec_id").as("b_id"), col("v").as("vb"))
    a.join(b, col("a_id") < col("b_id") &&
      cosineSim(col("va"), col("vb")) >= 0.25)
      .select(col("a_id"), col("b_id"))
  }

  test("rewrite fires, plans an equi-join on lsh buckets, result is a " +
    "subset of exact") {
    val exact = pairsQuery().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "need some exact pairs for the comparison")

    spark.experimental.extraOptimizations =
      Seq(graft.plans.GraftLshRewrite)
    spark.conf.set("spark.graft.ann.lshRewrite.enabled", "true")
    try {
      val df = pairsQuery()
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("lsh_bucket"), plan.take(2000))
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"rewrite must eliminate the nested loop:\n${plan.take(2000)}")
      val approx = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(approx.subsetOf(exact),
        s"LSH result must be a subset (got ${approx.size} vs ${exact.size})")
    } finally {
      spark.conf.unset("spark.graft.ann.lshRewrite.enabled")
      spark.experimental.extraOptimizations = Nil
    }
  }

  private def jaccardPairsQuery() = {
    import graft.functions.TextOps
    val t = Tables.df(spark, sf, "documents")
      .filter(col("doc_id") <= 150)
      .select(col("doc_id"), TextOps.uniqueTokens(col("text")).as("tok"))
    val a = t.select(col("doc_id").as("a_id"), col("tok").as("tok_a"))
    val b = t.select(col("doc_id").as("b_id"), col("tok").as("tok_b"))
    a.join(b, col("a_id") < col("b_id") &&
      TextOps.jaccard(col("tok_a"), col("tok_b")) >= 0.9)
      .select(col("a_id"), col("b_id"))
  }

  test("jaccard threshold join rewrites to a minhash-band equi-join, " +
    "result is a high-recall subset of exact") {
    val exact = jaccardPairsQuery().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "need some exact pairs for the comparison")

    spark.experimental.extraOptimizations =
      Seq(graft.plans.GraftLshRewrite)
    spark.conf.set("spark.graft.ann.lshRewrite.enabled", "true")
    try {
      val df = jaccardPairsQuery()
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("minhash_signature"), plan.take(2000))
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rewrite must eliminate the nested loop:\n${plan.take(2000)}")
      val approx = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(approx.subsetOf(exact),
        s"band-joined result must be a subset (${approx.size} vs ${exact.size})")
      // fixture dups sit at jaccard ~1.0, where a 4-row band recalls
      // essentially everything; demand a non-trivial fraction
      assert(approx.size.toDouble / exact.size >= 0.5,
        s"recall too low: ${approx.size}/${exact.size}")
    } finally {
      spark.conf.unset("spark.graft.ann.lshRewrite.enabled")
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("rewrite and the hand-built pipelines read band length from the " +
    "ONE shared LshKnobs table") {
    import graft.functions.LshKnobs
    // the rewrite's single-band key for the θ=0.9 query above must be
    // exactly what the table prescribes...
    val expectRows = LshKnobs.singleBandRows(0.9)
    spark.experimental.extraOptimizations =
      Seq(graft.plans.GraftLshRewrite)
    spark.conf.set("spark.graft.ann.lshRewrite.enabled", "true")
    try {
      val plan = jaccardPairsQuery().queryExecution.optimizedPlan.toString
      assert(s"minhash_signature\\(.*, $expectRows\\)".r
        .findFirstIn(plan).isDefined,
        s"expected $expectRows-row band key in:\n${plan.take(2000)}")
    } finally {
      spark.conf.unset("spark.graft.ann.lshRewrite.enabled")
      spark.experimental.extraOptimizations = Nil
    }
    // ...and the explode pipeline's fused banding must carry the
    // table's (bands, rows) for ITS default verify threshold
    val (b, r) = LshKnobs.bandsRows(
      graft.queries.Pipeline.defaultVerifyThreshold)
    val pipelinePlan = SparkEntry.queries("q75_minhash_lsh")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(s"minhash_bands\\(.*, $b, $r\\)".r
      .findFirstIn(pipelinePlan).isDefined,
      s"expected minhash_bands(_, $b, $r) in:\n${pipelinePlan.take(2000)}")
  }

  test("spark.graft.ann.lshRewrite.jaccardRows overrides the LshKnobs " +
    "table per session") {
    spark.experimental.extraOptimizations =
      Seq(graft.plans.GraftLshRewrite)
    spark.conf.set("spark.graft.ann.lshRewrite.enabled", "true")
    spark.conf.set("spark.graft.ann.lshRewrite.jaccardRows", "7")
    try {
      val plan = jaccardPairsQuery().queryExecution.optimizedPlan.toString
      assert("minhash_signature\\(.*, 7\\)".r.findFirstIn(plan).isDefined,
        s"expected the 7-row override in:\n${plan.take(2000)}")
    } finally {
      spark.conf.unset("spark.graft.ann.lshRewrite.jaccardRows")
      spark.conf.unset("spark.graft.ann.lshRewrite.enabled")
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("spark.graft.dedup.lsh.{bands,rows} retune the explode " +
    "pipeline's banding per session") {
    import graft.functions.LshKnobs
    val tuned = spark.newSession()
    tuned.conf.set(LshKnobs.bandsConf, "16")
    tuned.conf.set(LshKnobs.rowsConf, "16")
    assert(LshKnobs.bandsRows(0.95, tuned) === ((16, 16)))
    // ...and the conf reaches the physical banding expression through
    // lshCandidates (the q170b path)
    val plan = graft.queries.Pipeline.lshCandidates(
        graft.Tables.df(tuned, sf, "documents"))
      .queryExecution.optimizedPlan.toString
    assert("minhash_bands\\(.*, 16, 16\\)".r.findFirstIn(plan).isDefined,
      s"expected minhash_bands(_, 16, 16) in:\n${plan.take(2000)}")
    // a lone override fails loudly instead of silently retuning half
    // the recall model
    val half = spark.newSession()
    half.conf.set(LshKnobs.bandsConf, "16")
    intercept[IllegalArgumentException] {
      LshKnobs.bandsRows(0.95, half)
    }
    // an unset session still resolves to the theta-keyed table
    assert(LshKnobs.bandsRows(0.95, spark.newSession()) ===
      LshKnobs.bandsRows(0.95))
  }

  test("rule is inert when disabled") {
    spark.experimental.extraOptimizations =
      Seq(graft.plans.GraftLshRewrite)
    try {
      val plan = pairsQuery().queryExecution.optimizedPlan.toString
      assert(!plan.contains("lsh_bucket"), plan.take(1000))
    } finally spark.experimental.extraOptimizations = Nil
  }
}
