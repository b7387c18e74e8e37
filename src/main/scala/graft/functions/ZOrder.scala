package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve interleaving for multi-dimensional data
  * clustering — the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER
  * BY`: rows close in (x, y) land close on the 1-D curve, so a
  * range-partitioned + sorted write yields files whose parquet min/max
  * footers are tight boxes in BOTH dimensions, and a box predicate
  * prunes most files instead of just the leading sort column's.
  *
  * The reference engine only consumes whatever file layout Spark gives
  * it (scan pruning in
  * native-engine/datafusion-ext-plans/src/parquet_exec.rs rides the
  * pushed predicates); producing a skippable layout is left to the
  * writer — which is exactly the seam this operator fills.
  *
  * Implementation is the branch-free "magic bits" bit-spread (public
  * domain Stanford bit-twiddling hacks) built from codegen'd column
  * ops — no UDF, stays inside whole-stage codegen.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` so bit i lands at position 2*i
    * (result occupies even bit positions of a 32-bit span). */
  private def spread16(c: Column): Column = {
    val a = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val b1 = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b2 = b1.bitwiseOR(shiftleft(b1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val b3 = b2.bitwiseOR(shiftleft(b2, 2)).bitwiseAND(lit(0x33333333L))
    b3.bitwiseOR(shiftleft(b3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit coordinates: x on even bits,
    * y on odd bits. Larger domains first quantile-quantize to 16 bits
    * (65k cells per dimension is plenty for file-level clustering). */
  def interleave16(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Spread the low 10 bits of `c` so bit i lands at position 3*i
    * (the 3-D magic-bits ladder). */
  private def spread10x3(c: Column): Column = {
    val a = c.cast("long").bitwiseAND(lit(0x3FFL))
    val b1 = a.bitwiseOR(shiftleft(a, 16)).bitwiseAND(lit(0x030000FFL))
    val b2 = b1.bitwiseOR(shiftleft(b1, 8)).bitwiseAND(lit(0x0300F00FL))
    val b3 = b2.bitwiseOR(shiftleft(b2, 4)).bitwiseAND(lit(0x030C30C3L))
    b3.bitwiseOR(shiftleft(b3, 2)).bitwiseAND(lit(0x09249249L))
  }

  /** 30-bit Morton code of three 10-bit coordinates (1024 cells per
    * dimension — file-level clustering never needs more). */
  def interleave3(x: Column, y: Column, z: Column): Column =
    spread10x3(x)
      .bitwiseOR(shiftleft(spread10x3(y), 1))
      .bitwiseOR(shiftleft(spread10x3(z), 2))
}
