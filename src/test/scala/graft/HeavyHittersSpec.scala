package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGriesSketch.misraGries

/** Misra-Gries sketch contract (functions/HeavyHitters.scala):
  *  - with k >= distinct items the sketch IS the exact census;
  *  - for any stream and any partitioning, every item with true count
  *    > n/(k+1) survives, with weight in [c(x) - n/(k+1), c(x)] — the
  *    mergeable-summaries bound, so partial/final aggregation over any
  *    layout keeps the guarantee;
  *  - the q206 2-pass pattern (sketch -> exact recount of candidates)
  *    returns exactly the brute-force heavy hitters regardless of how
  *    the input is partitioned.
  */
class HeavyHittersSpec extends AnyFunSuite {
  import TestSession._

  private def sketch(items: Seq[String], k: Int, parts: Int)
      : Map[String, Long] = {
    import spark.implicits._
    items.toDF("tok").repartition(parts)
      .agg(misraGries(col("tok"), k).as("s"))
      .selectExpr("explode(s) AS e").select("e.token", "e.weight")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  // deterministic zipf-ish stream: item i appears ~N/i times
  private def zipf(nItems: Int, scale: Int): Seq[String] =
    (1 to nItems).flatMap(i => Seq.fill(scale / i)(s"item$i"))

  test("k >= distinct: the sketch is the exact census") {
    val items = zipf(20, 1000)
    for (parts <- Seq(1, 7)) {
      val s = sketch(items, k = 64, parts = parts)
      val exact = items.groupBy(identity).map { case (t, g) =>
        t -> g.size.toLong }
      assert(s === exact, s"parts=$parts")
    }
  }

  test("any partitioning: freq > n/(k+1) items always survive, " +
    "weights within the mergeable-summaries bound") {
    val items = new scala.util.Random(42).shuffle(
      zipf(500, 2000) ++ (1 to 3000).map(i => s"noise$i"))
    val n = items.size
    val k = 16
    val exact = items.groupBy(identity).map { case (t, g) =>
      t -> g.size.toLong }
    val guaranteed = exact.filter { case (_, c) => c > n.toLong / (k + 1) }
    for (parts <- Seq(1, 3, 13)) {
      val s = sketch(items, k, parts)
      assert(s.size <= k)
      guaranteed.foreach { case (t, c) =>
        assert(s.contains(t),
          s"parts=$parts: $t (count $c > ${n / (k + 1)}) must survive")
      }
      s.foreach { case (t, w) =>
        val c = exact(t)
        assert(w <= c, s"parts=$parts: $t overcounted ($w > $c)")
        assert(w >= c - n.toLong / (k + 1) - 1,
          s"parts=$parts: $t undercut the bound ($w vs $c - n/(k+1))")
      }
    }
  }

  test("2-pass sketch-then-exact equals brute force under any layout") {
    import spark.implicits._
    val items = zipf(100, 3000) ++ (1 to 2000).map(i => s"tail$i")
    val n = items.size
    val thresh = n / 50 // inside the k=256 guarantee n/257
    val brute = items.groupBy(identity).collect {
      case (t, g) if g.size > thresh => t -> g.size.toLong
    }.toMap
    for (parts <- Seq(1, 8)) {
      val toks = items.toDF("tok").repartition(parts)
      val cands = toks.agg(misraGries(col("tok"), 256).as("s"))
        .selectExpr("explode(s) AS e").select(col("e.token").as("cand"))
      val got = toks.join(broadcast(cands), col("tok") === col("cand"))
        .groupBy("tok").agg(count(lit(1)).as("freq"))
        .filter(col("freq") > thresh)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === brute, s"parts=$parts")
    }
  }
}
