package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ZOrder

/** Z-order clustering (q226): the magic-bits interleave must equal the
  * per-bit definition, and the clustered layout must actually deliver
  * the 2-D locality the operator exists for — a box predicate's matched
  * rows concentrate in a small fraction of the files, where a
  * single-column layout scatters them. */
class ZOrderSpec extends AnyFunSuite {
  import TestSession._

  test("interleave16 matches the per-bit Morton definition") {
    import spark.implicits._
    def naive(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val rnd = new scala.util.Random(42)
    val pairs = Seq.tabulate(200)(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L))
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.interleave16(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === naive(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z-value ordering is monotone in each coordinate (same other coord)") {
    // interleaving preserves per-dimension order: needed so parquet
    // min/max footers of a z-sorted file bound BOTH dimensions tightly
    import spark.implicits._
    val rows = for (x <- 0L to 63L) yield (x, 17L)
    val z = rows.toDF("x", "y")
      .select(ZOrder.interleave16(col("x"), col("y")))
      .collect().map(_.getLong(0))
    assert(z.sameElements(z.sorted))
  }

  test("box query touches far fewer files under z-order than a " +
    "single-column sort layout") {
    val li = Tables.df(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .withColumn("zval",
        ZOrder.interleave16(col("l_partkey"), col("l_suppkey")))
    val nFiles = 8
    val zPath = "/tmp/graft_warehouse/spec_zorder"
    val oPath = "/tmp/graft_warehouse/spec_orderkey_sort"
    li.repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(zPath)
    // baseline: clustered on an UNRELATED column (orderkey) — the box
    // dimensions are uniformly scattered through every file
    li.repartitionByRange(nFiles, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(oPath)
    // box = first quarter of the partkey domain x first half of the
    // suppkey domain (~1/8 of rows): a z-curve region with 3 fixed
    // leading bits -> few files; computed from the data so the spec
    // holds at any fixture scale
    val b = li.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).collect().head
    val (pLo, pHi) = (b.getLong(0), b.getLong(0) +
      (b.getLong(1) - b.getLong(0)) / 4)
    val (sLo, sHi) = (b.getLong(2), b.getLong(2) +
      (b.getLong(3) - b.getLong(2)) / 2)
    def filesHit(path: String): Long =
      spark.read.parquet(path)
        .filter(col("l_partkey").between(pLo, pHi) &&
          col("l_suppkey").between(sLo, sHi))
        .select(col("_metadata.file_path")).distinct().count()
    val zHit = filesHit(zPath)
    val oHit = filesHit(oPath)
    assert(oHit >= nFiles - 1, s"baseline should scatter, hit $oHit")
    assert(zHit * 2 <= oHit,
      s"z-order box locality: hit $zHit of $nFiles files vs $oHit scattered")
  }

  test("interleave3 matches the per-bit 3-D Morton definition") {
    import spark.implicits._
    def naive(x: Long, y: Long, z: Long): Long =
      (0 until 10).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (3 * i)) |
          (((y >> i) & 1L) << (3 * i + 1)) |
          (((z >> i) & 1L) << (3 * i + 2))
      }
    val rnd = new scala.util.Random(7)
    val triples = Seq.tabulate(150)(_ => (rnd.nextInt(1024).toLong,
      rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong)) ++
      Seq((0L, 0L, 0L), (1023L, 1023L, 1023L), (1023L, 0L, 0L))
    val got = triples.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        ZOrder.interleave3(col("x"), col("y"), col("z")).as("m"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(3) ===
        naive(r.getLong(0), r.getLong(1), r.getLong(2)),
        s"(${r.getLong(0)}, ${r.getLong(1)}, ${r.getLong(2)})")
    }
  }

  test("hilbert index is bijective onto [0, n²) with unit-step " +
    "adjacency — the locality property Morton lacks — and the Column " +
    "chain matches the JVM reference cell-for-cell") {
    import graft.functions.Hilbert
    for (bits <- Seq(3, 5)) {
      val n = 1 << bits
      val grid = spark.range(n.toLong * n)
        .selectExpr(s"id div $n AS x", s"id % $n AS y")
      val cells = Hilbert.withIndex(grid, col("x"), col("y"), bits, "d")
        .collect()
        .map(r => r.getAs[Long]("d") ->
          (r.getAs[Long]("x"), r.getAs[Long]("y"))).toMap
      assert(cells.size == n * n, "bijective")
      assert(cells.keys.min == 0L && cells.keys.max == n.toLong * n - 1)
      (0 until n * n - 1).foreach { d =>
        val (x1, y1) = cells(d.toLong)
        val (x2, y2) = cells(d + 1L)
        assert((x1 - x2).abs + (y1 - y2).abs == 1,
          s"curve teleports at d=$d (bits=$bits)")
      }
      cells.foreach { case (d, (x, y)) =>
        assert(d == Hilbert.index(bits, x, y),
          s"column chain != reference at ($x, $y)")
      }
    }
    // Morton, for contrast: the 4x4 grid already teleports (d=3: (1,1)
    // -> d=4: (2,0) is manhattan distance 3) — documents WHY a second
    // curve exists next to q226's interleave.
    val mortonCells = (0 until 16).map { d =>
      ((d & 1) | ((d >> 1) & 2), ((d >> 1) & 1) | ((d >> 2) & 2))
    }
    val teleports = (0 until 15).count { d =>
      val (x1, y1) = mortonCells(d); val (x2, y2) = mortonCells(d + 1)
      (x1 - x2).abs + (y1 - y2).abs > 1
    }
    assert(teleports > 0, "Morton should teleport where Hilbert cannot")
  }

  test("q247 compaction actually reduces the file count (64-shard " +
    "landing zone -> <= 4 range-clustered files)") {
    def parquetFiles(p: String): Int =
      new java.io.File(p).listFiles()
        .count(f => f.getName.endsWith(".parquet"))
    SparkEntry.queries("q247_compaction")(spark, sf).collect()
    val before = parquetFiles("/tmp/graft_warehouse/li_fragmented")
    val after = parquetFiles("/tmp/graft_warehouse/li_compacted")
    assert(before >= 32, s"landing zone should be fragmented: $before")
    assert(after <= 4, s"compacted file count: $after")
  }
}
