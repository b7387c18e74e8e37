package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hilbert-curve index for 2-D data clustering — the locality-stronger
  * alternative to [[ZOrder]]'s Morton code: consecutive curve positions
  * are ALWAYS grid-adjacent (no Morton "teleports" across the plane), so
  * a range-partitioned write covers compact blobs of the key space and a
  * box predicate touches fewer files on elongated query boxes.
  *
  * Same seam as ZOrder: the reference engine only consumes whatever file
  * layout the writer produced (its scan pruning rides pushed predicates,
  * native-engine/datafusion-ext-plans/src/parquet_exec.rs); producing a
  * skippable layout is writer-side work, which is exactly where this
  * operator lives.
  *
  * Algorithm: the classic xy2d walk (one quadrant decision per bit
  * level, then a reflect+transpose re-orientation) using the FULL-GRID
  * (n−1) flip so coordinates stay in [0, n) at every step — no negative
  * intermediates to worry about across engines. HilbertSpec proves the
  * two properties that define the curve (bijectivity onto [0, n²) and
  * unit-step adjacency) by brute force, and pins the Column
  * implementation to the JVM reference cell-for-cell.
  */
object Hilbert {

  /** JVM reference implementation (spec ground truth). */
  def index(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Append the Hilbert index of two `bits`-bit coordinate columns as
    * `out`. One chained projection per bit level keeps the expression
    * tree LINEAR in `bits` (a single nested expression would duplicate
    * the x/y sub-trees ~4^bits times); whole-stage codegen fuses the
    * chain into one pass, so the index is map-side, shuffle-free work
    * just like ZOrder's magic-bits ladder. */
  def withIndex(df: DataFrame, x: Column, y: Column, bits: Int,
                out: String): DataFrame = {
    val n = 1L << bits
    var cur = df
      .withColumn("_hx", x.cast("long").bitwiseAND(lit(n - 1)))
      .withColumn("_hy", y.cast("long").bitwiseAND(lit(n - 1)))
      .withColumn("_hd", lit(0L))
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      cur = cur
        .withColumn("_rx",
          when(col("_hx").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("_ry",
          when(col("_hy").bitwiseAND(lit(s)) > 0, 1L).otherwise(0L))
        .withColumn("_hd", col("_hd") + lit(s * s) *
          ((lit(3L) * col("_rx")).bitwiseXOR(col("_ry"))))
        .withColumn("_nx",
          when(col("_ry") === 0,
            when(col("_rx") === 1, lit(n - 1) - col("_hy"))
              .otherwise(col("_hy")))
            .otherwise(col("_hx")))
        .withColumn("_ny",
          when(col("_ry") === 0,
            when(col("_rx") === 1, lit(n - 1) - col("_hx"))
              .otherwise(col("_hx")))
            .otherwise(col("_hy")))
        .withColumn("_hx", col("_nx"))
        .withColumn("_hy", col("_ny"))
    }
    cur.withColumn(out, col("_hd"))
      .drop("_hx", "_hy", "_hd", "_rx", "_ry", "_nx", "_ny")
  }
}
