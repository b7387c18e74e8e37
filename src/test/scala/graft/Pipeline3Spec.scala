package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavior checks for the clustering / mixing / export operators beyond
  * their DuckDB oracles: graph invariants for the connected-components
  * dedup (q118), layout-independence for the export sharding (q120), and
  * the k-means census sanity (q121). */
class Pipeline3Spec extends AnyFunSuite {
  import TestSession._

  test("q118 connected components: labels are valid cluster assignments") {
    val rows = SparkEntry.queries("q118_dedup_clusters")(spark, sf).collect()
    val label = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    // canonical flag consistent, cluster id is a member and the min
    rows.foreach { r =>
      assert(r.getBoolean(2) == (r.getLong(0) == r.getLong(1)))
      assert(label.contains(r.getLong(1)), "cluster id must be a node")
      assert(r.getLong(1) <= r.getLong(0), "label is the component min")
    }
    // every similarity edge connects nodes with the SAME label (the
    // defining CC invariant), checked against the exact pair source
    val pairs = SparkEntry.queries("q73_jaccard_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val covered = pairs.filter { case (a, b) =>
      label.contains(a) && label.contains(b)
    }
    assert(covered.nonEmpty)
    covered.foreach { case (a, b) =>
      assert(label(a) == label(b), s"edge ($a,$b) split across clusters")
    }
  }

  test("connected components converges on a diameter-128 path graph " +
    "(beyond any fixed hop-count budget)") {
    import org.apache.spark.sql.functions.col
    // path 0-1-2-...-128: worst case for one-hop label propagation
    // (the old 20-round cap silently under-merged this); pointer
    // doubling settles it in ~log2(128) rounds
    val fwd = spark.range(0, 128).toDF("src")
      .select(col("src"), (col("src") + 1).as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"),
      col("src").as("dst")))
    val labels = graft.queries.Pipeline3.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 129, "every path node labeled")
    labels.foreach { case (n, root) =>
      assert(root == 0L, s"node $n labeled $root, expected 0")
    }
    // two disjoint deep paths must NOT merge
    val fwd2 = spark.range(0, 200).toDF("src")
      .filter(col("src") % 100 =!= 99)
      .select(col("src"), (col("src") + 1).as("dst"))
    val edges2 = fwd2.union(fwd2.select(col("dst").as("src"),
      col("src").as("dst")))
    val labels2 = graft.queries.Pipeline3.connectedComponents(edges2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    labels2.foreach { case (n, root) =>
      assert(root == n - n % 100, s"node $n labeled $root")
    }
  }

  test("connected components equals a driver-side union-find on " +
    "randomized graphs (incl. hashed-magnitude node ids)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    (1 to 3).foreach { trial =>
      // node ids up to 2^62 on the last trial: exercises the
      // decimal-sum convergence probe far beyond bigint-sum territory
      val idSpace: Long => Long =
        if (trial == 3) n => n * 4611686018427387L else n => n
      val nodes = (0L until 60L).map(idSpace)
      val fwd = Seq.fill(70)((nodes(rnd.nextInt(60)),
        nodes(rnd.nextInt(60)))).filter(e => e._1 != e._2)
      // driver-side union-find ground truth
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      fwd.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = fwd.flatMap(e => Seq(e._1, e._2)).distinct
        .map(n => n -> find(n)).toMap
      val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
      val got = graft.queries.Pipeline3.connectedComponents(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.keySet == expected.keySet, s"trial $trial node set")
      got.foreach { case (n, root) =>
        assert(root == expected(n),
          s"trial $trial: node $n got $root want ${expected(n)}")
      }
    }
  }

  test("q129 dedup pipeline on the q118 slice reproduces the " +
    "oracle-checked clusters (cluster-level LSH recall)") {
    import org.apache.spark.sql.functions.col
    val slice = Tables.df(spark, sf, "documents").filter(col("doc_id") <= 200)
    val pipe = graft.queries.Pipeline3.dedupPipeline(slice).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oracle = SparkEntry.queries("q118_dedup_clusters")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(oracle.nonEmpty)
    // every node the exact-edge CC covers must land in the SAME cluster
    // via the LSH path (pipeline edges are exact-verified, so they are a
    // subset of q118's — equality means the LSH missed no needed edge)
    oracle.foreach { case (d, c) =>
      assert(pipe(d) == c, s"doc $d: pipeline cluster ${pipe(d)} != $c")
    }
    // docs in no dup group are their own singleton keepers
    pipe.filterNot { case (d, _) => oracle.contains(d) }
      .foreach { case (d, c) => assert(c == d, s"doc $d not a singleton") }
  }

  test("q129 full-corpus pipeline: every doc labeled, cluster id is the " +
    "member min, exactly one keeper per cluster") {
    val rows = SparkEntry.queries("q129_dedup_pipeline")(spark, sf).collect()
    val n = Tables.df(spark, sf, "documents").count()
    assert(rows.length == n, "one row per corpus doc")
    rows.groupBy(_.getLong(1)).foreach { case (c, members) =>
      assert(members.map(_.getLong(0)).min == c,
        s"cluster $c id is not its member min")
      assert(members.count(_.getBoolean(2)) == 1,
        s"cluster $c keeper count != 1")
    }
    assert(rows.exists(r => !r.getBoolean(2)), "full corpus has dup drops")
  }

  test("q120 export shards: deterministic across partition layouts, " +
    "dense positions per shard") {
    val a = SparkEntry.queries("q120_export_shards")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // same result from a deliberately different input layout
    val again = SparkEntry.queries("q120_export_shards")(spark, sf)
      .repartition(7).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.sorted.sameElements(again), "sharding must be layout-stable")
    // positions within each shard are 1..n with no gaps
    a.groupBy(_._2).foreach { case (shard, rows) =>
      val pos = rows.map(_._3).sorted
      assert(pos.sameElements(1L to rows.length),
        s"shard $shard positions not dense")
    }
    assert(a.map(_._2).distinct.length == 4, "all 4 shards populated")
  }

  test("q121 k-means census covers the corpus and improves cohesion over " +
    "the seed assignment") {
    val census = SparkEntry.queries("q121_kmeans")(spark, sf).collect()
    val total = census.map(_.getLong(1)).sum
    val n = Tables.df(spark, sf, "embeddings").count()
    assert(total == n, s"every vector assigned exactly once ($total != $n)")
    assert(census.length <= 16 && census.nonEmpty)
  }
}
