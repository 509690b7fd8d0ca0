package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout keys — the multi-dimensional clustering
  * lever: interleaving the bits of N bucket ids gives a single sort
  * key whose ranges are tight in EVERY dimension, so a
  * range-partitioned + sorted parquet write keeps row-group min/max
  * statistics narrow on each dim and a filter on ANY keyed column
  * skips row groups at read time. A single-column sort only ever
  * serves its own column; Z-order serves all N at an N-th-root cost
  * each — the standard layout trade for multi-dim scan-heavy tables.
  *
  * Built entirely from builtin bitwise functions (the magic-number
  * spreads), so the key stays inside whole-stage codegen — no custom
  * Expression, no UDF.
  *
  * Capacity per dimension falls with N (the 64 key bits are shared):
  * 2 dims → 2³² tiles each, 3 dims → 2²¹, 4 dims → 2¹⁶. Callers
  * bucket raw values first (e.g. `floor(col / width)`) into
  * NON-NEGATIVE ids below the capacity; ids at/above it are masked
  * (high bits dropped), which silently aliases far-apart tiles — keep
  * bucket widths coarse enough. Even 2¹⁶ tiles per dim is far past
  * any practical layout (4 dims × 2¹⁶ = 2⁶⁴ cells).
  */
object ZOrder {

  /** Per-arity spread plans: initial mask (the dimension capacity)
    * then (shift, mask) steps — the standard Morton magic numbers
    * that walk each bit of dim j to position N·i + j. */
  private val plans: Map[Int, (Long, Seq[(Int, Long)])] = Map(
    2 -> (0xFFFFFFFFL, Seq(
      16 -> 0x0000FFFF0000FFFFL,
      8 -> 0x00FF00FF00FF00FFL,
      4 -> 0x0F0F0F0F0F0F0F0FL,
      2 -> 0x3333333333333333L,
      1 -> 0x5555555555555555L)),
    3 -> (0x1FFFFFL, Seq(
      32 -> 0x001F00000000FFFFL,
      16 -> 0x001F0000FF0000FFL,
      8 -> 0x100F00F00F00F00FL,
      4 -> 0x10C30C30C30C30C3L,
      2 -> 0x1249249249249249L)),
    4 -> (0xFFFFL, Seq(
      24 -> 0x000000FF000000FFL,
      12 -> 0x000F000F000F000FL,
      6 -> 0x0303030303030303L,
      3 -> 0x1111111111111111L)))

  /** Bits available per dimension at arity `n`. */
  private[graft] def bitsPerDim(n: Int): Int = n match {
    case 2 => 32; case 3 => 21; case 4 => 16
  }

  private def checkArity(n: Int): Unit =
    require(n >= 2 && n <= 4,
      s"zorder_key takes 2 to 4 columns; got $n")

  /** Spread the low bits of `c` so bit i lands at position n·i. */
  private def spread(c: Column, n: Int): Column = {
    val (init, steps) = plans(n)
    var v = c.cast("long").bitwiseAND(lit(init))
    steps.foreach { case (s, m) =>
      v = v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(m))
    }
    v
  }

  /** Morton-interleave N ∈ [2,4] non-negative bucket ids into one
    * long: column j takes bit positions N·i + j. */
  def zorderKey(cols: Seq[Column]): Column = {
    checkArity(cols.length)
    val n = cols.length
    cols.zipWithIndex.map { case (c, j) =>
      shiftleft(spread(c, n), j)
    }.reduce(_.bitwiseOR(_))
  }

  /** 2-D form (the common layout pair). */
  def zorderKey(x: Column, y: Column): Column = zorderKey(Seq(x, y))

  /** 3-D / 4-D convenience forms. */
  def zorderKey(x: Column, y: Column, z: Column): Column =
    zorderKey(Seq(x, y, z))
  def zorderKey(x: Column, y: Column, z: Column, w: Column): Column =
    zorderKey(Seq(x, y, z, w))

  /** Catalyst rendering of [[zorderKey]] for the SQL function registry
    * (`zorder_key(c1, ..., cN)` via GraftExtensions) — the identical
    * builtin composition at the Expression level. */
  private[graft] def zorderKeyExpr(
      cols: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.LongType
    checkArity(cols.length)
    val n = cols.length
    val (init, steps) = plans(n)
    def spreadE(e: Expression): Expression = {
      var v: Expression = BitwiseAnd(Cast(e, LongType), Literal(init))
      steps.foreach { case (s, m) =>
        v = BitwiseAnd(BitwiseOr(v, ShiftLeft(v, Literal(s))), Literal(m))
      }
      v
    }
    cols.zipWithIndex.map { case (c, j) =>
      ShiftLeft(spreadE(c), Literal(j)): Expression
    }.reduce(BitwiseOr(_, _))
  }

  /** Reference interleave for tests and documentation. */
  private[graft] def interleaveRef(vals: Seq[Long]): Long = {
    val n = vals.length
    val bits = bitsPerDim(n)
    var z = 0L
    for (j <- 0 until n; i <- 0 until bits)
      z |= ((vals(j) >> i) & 1L) << (n * i + j)
    z
  }
  private[graft] def interleaveRef(x: Long, y: Long): Long =
    interleaveRef(Seq(x, y))
}
