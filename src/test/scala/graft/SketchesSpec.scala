package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties behind the Sketches/Functions3 query families: the
  * moment formulas Spark actually implements, the bitmap-distinct ==
  * exact-distinct identity across bucket boundaries, the HLL sketch
  * MERGE contract, width_bucket edge cells, and collation-aware
  * grouping. These pin semantics independent of the fixture oracle. */
class SketchesSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("skewness/kurtosis are population g1 / excess g2 " +
    "(m3/m2^1.5, m4/m2^2 - 3)") {
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 10.0)
    val n = xs.size
    val mu = xs.sum / n
    def m(k: Int) = xs.map(x => math.pow(x - mu, k)).sum / n
    val expSkew = m(3) / math.pow(m(2), 1.5)
    val expKurt = m(4) / (m(2) * m(2)) - 3.0
    val row = xs.toDF("x")
      .agg(skewness($"x").as("s"), kurtosis($"x").as("k"))
      .head()
    assert(math.abs(row.getDouble(0) - expSkew) < 1e-9)
    assert(math.abs(row.getDouble(1) - expKurt) < 1e-9)
  }

  test("segment-bitmap distinct equals exact distinct across " +
    "bucket boundaries, through the OR-merge path") {
    // keys straddle several 32768-position bitmap buckets, with dups
    val keys = (0 until 5000).map(i => (i * 37L) % 90000L) ++
      Seq(1L, 1L, 89999L)
    val df = keys.toDF("k")
    val exact = df.select(countDistinct($"k")).head().getLong(0)
    val seg = df
      .groupBy(expr("bitmap_bucket_number(k)").as("bkt"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(k))").as("bm"))
    assert(seg.select(expr("bitmap_bucket_number(90000)")).head() !=
      seg.select(expr("bitmap_bucket_number(1)")).head(),
      "test data must span more than one bucket")
    val viaSum = seg.agg(sum(expr("bitmap_count(bm)"))).head().getLong(0)
    assert(viaSum === exact)
    // OR-merging two halves of the data must reach the same count
    val halves = df.withColumn("h", $"k" % 2)
      .groupBy($"h", expr("bitmap_bucket_number(k)").as("bkt"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(k))").as("bm"))
      .groupBy($"bkt").agg(expr("bitmap_or_agg(bm)").as("bm"))
    val viaOr = halves.agg(sum(expr("bitmap_count(bm)"))).head().getLong(0)
    assert(viaOr === exact)
  }

  test("HLL sketch union estimates the distinct of the combined " +
    "stream (mergeable-sketch contract)") {
    val a = (1L to 4000L).toDF("k").withColumn("g", lit("a"))
    val b = (3001L to 7000L).toDF("k").withColumn("g", lit("b"))
    val sk = a.union(b).groupBy($"g").agg(hll_sketch_agg($"k").as("sk"))
    val est = sk.agg(hll_sketch_estimate(hll_union_agg($"sk")))
      .head().getLong(0)
    assert(math.abs(est - 7000L) <= 0.05 * 7000, s"est=$est")
  }

  test("width_bucket: below-range -> 0, at/above hi -> n+1, " +
    "lo boundary -> 1") {
    val rows = Seq(-5.0, 0.0, 9.999, 10.0, 25.0).toDF("x")
      .select(width_bucket($"x", lit(0.0), lit(10.0), lit(5)).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(rows === Seq(0L, 1L, 5L, 6L, 6L))
  }

  test("UTF8_LCASE grouping merges case variants into one group") {
    val df = Seq("Alpha", "ALPHA", "alpha", "Beta", "beta", "Gamma")
      .toDF("s")
    val grouped = df.groupBy(collate($"s", "UTF8_LCASE").as("sk"))
      .agg(count(lit(1)).as("n"))
      .select(lower($"sk").as("k"), $"n")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(grouped === Map("alpha" -> 3L, "beta" -> 2L, "gamma" -> 1L))
  }
}
