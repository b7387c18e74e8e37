package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cross-validation for the queries whose DuckDB oracle is inexpressible
  * (q75 MinHash-LSH, q76 SimHash, q78 LSH-ANN): check them against their
  * exact in-engine counterparts instead. */
class PipelineSpec extends AnyFunSuite {
  import TestSession._

  test("q75 minhash-lsh finds a high-recall subset of q73 exact jaccard pairs") {
    val exact = SparkEntry.queries("q73_jaccard_pairs")(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("q75_minhash_lsh")(spark, sf)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH pairs must pass the exact-jaccard verify")
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall too low: $recall (${lsh.size}/${exact.size})")
  }

  test("q76 simhash: identical docs get identical signatures, and near-dup " +
    "pairs from q73 are close in hamming distance") {
    import org.apache.spark.sql.functions.col
    import graft.functions.{SimHash64, TextOps}
    // per-doc signatures straight from the kernel (the q76 query reduces
    // them to a pinned checksum row for the oracle)
    val rows = Tables.df(spark, sf, "documents")
      .select(col("doc_id"),
        SimHash64.simhash64(TextOps.tokens(col("text"))).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = SparkEntry.queries("q73_jaccard_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val hams = pairs.flatMap { case (a, b) =>
      for (x <- rows.get(a); y <- rows.get(b))
        yield java.lang.Long.bitCount(x ^ y)
    }
    val meanHam = hams.sum.toDouble / hams.length
    assert(meanHam < 16.0,
      s"jaccard>=0.95 pairs should be hamming-close, mean=$meanHam")
  }

  test("q78 lsh-ann returns valid (probe, neighbor) rows with true cosines") {
    val exact = SparkEntry.queries("q77_ann_bruteforce")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = SparkEntry.queries("q78_ann_lsh")(spark, sf).collect()
    assert(lsh.nonEmpty)
    // every LSH sim must equal the exact cosine for that pair when the
    // pair is also in the exact top-5 (same rounding, same formula)
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exact.get(key).foreach { c =>
        assert(math.abs(c - r.getDouble(2)) < 1e-9, s"cosine mismatch at $key")
      }
    }
  }

  test("q78 candidate volume scales sublinearly with corpus size") {
    // corpus grows 4x (sf0.01: 500 vectors -> sf0.1: 2000); lshBits
    // widens the bucket space with log2(n), keeping expected occupancy
    // ~constant — so candidates for the fixed probe set must grow well
    // below the 4x a fixed bit-width would produce.
    import graft.queries.Similarity
    assert(Similarity.lshBits(500) < Similarity.lshBits(2000))
    assert(Similarity.lshBits(1L << 30) <= 48)
    val small = Similarity.annCandidates(spark, "/root/testdata/sf0.01")
      .count().toDouble
    val big = Similarity.annCandidates(spark, "/root/testdata/sf0.1")
      .count().toDouble
    assert(big / small < 3.0,
      s"candidates grew ~linearly with corpus: $small -> $big")
  }

  test("q111 ivf prunes the search space and finds real near neighbors") {
    val exact = SparkEntry.queries("q77_ann_bruteforce")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = SparkEntry.queries("q111_ann_ivf")(spark, sf).collect()
    assert(ivf.nonEmpty)
    // same formula + rounding as the exact path wherever the pair overlaps
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exact.get(key).foreach { c =>
        assert(math.abs(c - r.getDouble(2)) < 1e-9, s"cosine mismatch at $key")
      }
    }
    // the point of IVF: a probe visits nprobe=2 of 16 cells, so even the
    // two LARGEST cells together must leave most of the corpus untouched
    import graft.queries.Similarity
    val corpusN = Tables.df(spark, sf, "embeddings").count().toDouble
    val cellSizes = Similarity.ivfAssigned(spark, sf)
      .groupBy("cell").count().collect().map(_.getLong(1))
    assert(cellSizes.length > 8, "assignment collapsed into too few cells")
    val worstTwo = cellSizes.sorted.reverse.take(2).sum.toDouble
    assert(worstTwo / corpusN < 0.5,
      s"worst 2 cells hold ${worstTwo / corpusN} of the corpus — no pruning")
  }

  test("q133 semantic dedup: valid labels, and exact cosine>=0.4 pairs " +
    "on the probe slice land in the same cluster (LSH recall)") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorOps._
    val rows = SparkEntry.queries("q133_semantic_dedup")(spark, sf).collect()
    val n = Tables.df(spark, sf, "embeddings").count()
    assert(rows.length == n, "one row per corpus vector")
    val label = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getLong(1)).foreach { case (c, members) =>
      assert(members.map(_.getLong(0)).min == c)
      assert(members.count(_.getBoolean(2)) == 1)
    }
    // exact all-pairs edges on a bounded slice: how many end up
    // co-clustered through the LSH path
    val c = Tables.df(spark, sf, "embeddings")
      .filter(col("vec_id") <= 300)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val a = c.select(col("vec_id").as("a_id"), col("v").as("va"))
    val b = c.select(col("vec_id").as("b_id"), col("v").as("vb"))
    val exact = a.join(b, col("a_id") < col("b_id"))
      .filter(round(cosine(col("va"), col("vb")), 6) >= 0.4)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.nonEmpty, "slice has no near-dup pairs to check")
    val agree = exact.count { case (x, y) => label(x) == label(y) }
    assert(agree.toDouble / exact.length >= 0.6,
      s"cluster-level recall too low: $agree/${exact.length}")
  }

  test("q143 PQ codes rank real L2 neighbors far above chance") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorOps._
    val pq = SparkEntry.queries("q143_ann_pq")(spark, sf).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    // exact L2 top-5 per probe (same metric PQ approximates)
    val c = Tables.df(spark, sf, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val probes = c.filter(col("vec_id") < 20)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val l2 = aggregate(zip_with(col("pv"), col("v"),
      (x, y) => (x - y) * (x - y)), lit(0.0), (a, b) => a + b)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("d"), col("vec_id"))
    val exact = c.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"), l2.as("d"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .collect().groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet)
    val n = Tables.df(spark, sf, "embeddings").count().toDouble
    val overlaps = exact.map { case (p, ex) => (pq(p) & ex).size }.toSeq
    val mean = overlaps.sum.toDouble / overlaps.size
    // random top-5 would overlap ~ 5*5/n per probe; PQ on a
    // structureless corpus is coarse (its worst case) but must carry
    // far-above-chance signal
    val chance = 5.0 * 5.0 / n
    assert(mean >= math.max(0.25, 5 * chance),
      s"PQ overlap $mean is not above chance ($chance)")
  }

  test("q80 decode stub is deterministic across runs") {
    val a = SparkEntry.queries("q80_multimodal_decode")(spark, sf).collect()
    val b = SparkEntry.queries("q80_multimodal_decode")(spark, sf).collect()
    assert(a.sameElements(b))
  }

  test("q128 char-class histogram is computed ONCE per row inside codegen") {
    val df = SparkEntry.queries("q128_multimodal_features")(spark, sf)
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
      .split("\\+- == Initial Plan ==").head // AQE prints the plan twice
    val evals = "char_class_counts".r.findAllIn(plan).length
    assert(evals == 1,
      s"histogram must appear exactly once (one text pass), got $evals:\n$plan")
    assert(plan.split("\n").exists(l =>
      l.contains("char_class_counts") && l.contains("*(")), plan)
  }

  test("simhash64 projection stays inside whole-stage codegen") {
    import org.apache.spark.sql.functions.col
    import graft.functions.{SimHash64, TextOps}
    val df = Tables.df(spark, sf, "documents")
      .select(col("doc_id"),
        SimHash64.simhash64(TextOps.tokens(col("text"))).as("sim"))
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    // whole-stage-codegen'd operators print as "*(n) Op"; the simhash
    // projection must carry the marker (doGenCode worked, no fallback)
    assert(plan.split("\n").exists(l =>
      l.contains("simhash64") && l.contains("*(")), plan)
  }

  test("q189 simhash banding is recall-LOSSLESS for hamming <= 3 " +
    "(pigeonhole: 4 bands, so <=3 flipped bits leave one band intact)") {
    import org.apache.spark.sql.functions._
    import graft.functions.SimHash64
    import graft.functions.TextOps.tokens
    val sigs = Tables.df(spark, sf, "documents")
      .filter(col("doc_id") <= 300)
      .select(col("doc_id"), SimHash64.simhash64(tokens(col("text")))
        .as("sig"))
    val bruteClose = sigs.as("a").join(sigs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .filter(expr("bit_count(a.sig ^ b.sig)") <= 3)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bruteClose.nonEmpty, "fixture has no hamming<=3 pairs <=300")
    val banded = sigs.select(col("doc_id"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("sig"), i * 16) % 65536): _*))
        .as(Seq("band", "bh")))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = bruteClose -- cands
    assert(missed.isEmpty,
      s"pigeonhole violated — hamming<=3 pairs not in candidates: $missed")
  }

  test("q228 int8 quantization: round-to-nearest error bound " +
    "|err| <= scale/2 and near-unit cosine fidelity hold for every vector") {
    val rows = SparkEntry.queries("q228_int8_quant")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (scale, maxErr, cos) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(4))
      // both sides are 6dp-rounded, so allow one ulp of that rounding
      assert(maxErr <= scale / 2 + 1e-6,
        s"vec ${r.getLong(0)}: err $maxErr > scale/2 ${scale / 2}")
      assert(cos >= 0.99,
        s"vec ${r.getLong(0)}: int8 cosine fidelity $cos")
    }
  }

  test("q229 corpus overlap: counts are consistent " +
    "(inclusion-exclusion, containment in [0,1])") {
    val r = SparkEntry.queries("q229_corpus_overlap")(spark, sf)
      .collect().head
    val (na, nb, ni, nu) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(na + nb - ni === nu, "inclusion-exclusion")
    assert(ni <= math.min(na, nb) && ni >= 0)
    assert(r.getDouble(4) >= 0 && r.getDouble(4) <= 1)
  }
}
