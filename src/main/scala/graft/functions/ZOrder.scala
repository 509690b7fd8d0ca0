package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout keys — the multi-dimensional clustering
  * lever: interleaving the bits of two bucket ids gives a single sort
  * key whose ranges are tight in BOTH dimensions, so a
  * range-partitioned + sorted parquet write keeps row-group min/max
  * statistics narrow on each dim and a filter on EITHER column skips
  * row groups at read time. A single-column sort only ever serves its
  * own column; Z-order serves both at a √-factor cost each —
  * the standard layout trade for multi-dim scan-heavy tables.
  *
  * Built entirely from builtin bitwise functions (the magic-number
  * spread), so the key stays inside whole-stage codegen — no custom
  * Expression, no UDF.
  */
object ZOrder {

  /** Spread the low 32 bits of `c` so bit i lands at position 2·i. */
  private def spread(c: Column): Column = {
    var v = c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))
    v = v.bitwiseOR(shiftleft(v, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x3333333333333333L))
    v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** Morton-interleave two NON-NEGATIVE bucket ids (each < 2³¹ — y's
    * bit 31 would land in the long's SIGN bit and negative keys sort
    * before everything, silently un-tiling the layout) into one long:
    * x takes the even bit positions, y the odd. Callers bucket raw
    * values first (e.g. `floor(col / width)`); 2³¹ tiles per dimension
    * is far past any practical layout. */
  def zorderKey(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** Catalyst rendering of [[zorderKey]] for the SQL function registry
    * (`zorder_key(x, y)` via GraftExtensions) — the identical builtin
    * composition at the Expression level. */
  private[graft] def zorderKeyExpr(
      x: org.apache.spark.sql.catalyst.expressions.Expression,
      y: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.LongType
    def step(v: Expression, s: Int, m: Long): Expression =
      BitwiseAnd(BitwiseOr(v, ShiftLeft(v, Literal(s))), Literal(m))
    def spreadE(e: Expression): Expression = {
      var v: Expression = BitwiseAnd(Cast(e, LongType),
        Literal(0xFFFFFFFFL))
      v = step(v, 16, 0x0000FFFF0000FFFFL)
      v = step(v, 8, 0x00FF00FF00FF00FFL)
      v = step(v, 4, 0x0F0F0F0F0F0F0F0FL)
      v = step(v, 2, 0x3333333333333333L)
      step(v, 1, 0x5555555555555555L)
    }
    BitwiseOr(spreadE(x), ShiftLeft(spreadE(y), Literal(1)))
  }

  /** Reference interleave for tests and documentation. */
  private[graft] def interleaveRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
