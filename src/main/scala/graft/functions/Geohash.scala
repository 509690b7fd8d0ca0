package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geohash encoding — the standard public-domain spatial bucketing
  * key (Niemeyer 2008): quantize latitude/longitude, interleave the
  * bits longitude-first, render 5-bit groups in the geohash base-32
  * alphabet. Prefix containment makes it THE layout/blocking key for
  * spatial data at scale: truncating to p characters is a grid cell,
  * so equality on a prefix is a bucketed spatial join and a sorted
  * parquet write on the key keeps row-group min/max tight in both
  * dimensions at once (the 2-D special case of [[ZOrder]], with a
  * portable string rendering).
  *
  * Like [[ZOrder]], built ENTIRELY from builtin functions — the
  * Morton interleave is [[ZOrder.zorderKey]], the base-32 rendering
  * is `element_at` over a 32-element literal array — so the whole key
  * stays inside whole-stage codegen with no custom Expression and no
  * UDF.
  */
object Geohash {

  private[graft] val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  private def checkPrecision(p: Int): Unit =
    require(p >= 1 && p <= 12,
      s"geohash precision must be in [1, 12]; got $p")

  /** Quantize a coordinate to `bits` bits over `[lo, lo + span)`,
    * clamped into range (the +90/+180 edge maps to the top cell). */
  private def quantize(c: Column, lo: Double, span: Double,
      bits: Int): Column = {
    val cells = 1L << bits
    least(lit(cells - 1), greatest(lit(0L),
      floor((c - lit(lo)) / lit(span) * lit(cells.toDouble))
        .cast("long")))
  }

  /** Geohash of `(lat, lon)` at `precision` characters (1–12), as a
    * string column. Codegen'd builtins end to end. */
  def geohash(lat: Column, lon: Column, precision: Int): Column = {
    checkPrecision(precision)
    val bits = 5 * precision
    val lonBits = (bits + 1) / 2 // lon leads, so it takes the extra bit
    val latBits = bits / 2
    val lonId = quantize(lon, -180.0, 360.0, lonBits)
    val latId = quantize(lat, -90.0, 180.0, latBits)
    // Morton positions run 2i+j from the LSB; the geohash bit string
    // alternates lon-first from the MSB (bit position bits-1). With an
    // even bit count the MSB is odd → lon rides dimension 1; with an
    // odd count the MSB is even → lon rides dimension 0.
    val z =
      if (bits % 2 == 0) ZOrder.zorderKey(Seq(latId, lonId))
      else ZOrder.zorderKey(Seq(lonId, latId))
    val alphabet = array(Base32.map(ch => lit(ch.toString)): _*)
    concat((0 until precision).map { i =>
      val group = shiftrightunsigned(z, 5 * (precision - 1 - i))
        .bitwiseAND(lit(31L))
      element_at(alphabet, (group + lit(1L)).cast("int"))
    }: _*)
  }

  /** Catalyst rendering of [[geohash]] for the SQL function registry
    * (`geohash(lat, lon, precision)` via GraftExtensions) — the
    * identical builtin composition at the Expression level. */
  private[graft] def geohashExpr(
      lat: org.apache.spark.sql.catalyst.expressions.Expression,
      lon: org.apache.spark.sql.catalyst.expressions.Expression,
      precision: Int)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}
    checkPrecision(precision)
    val bits = 5 * precision
    val lonBits = (bits + 1) / 2
    val latBits = bits / 2
    def quantizeE(e: Expression, lo: Double, span: Double,
        nb: Int): Expression = {
      val cells = 1L << nb
      val scaled = Cast(Floor(Multiply(
        Divide(Subtract(Cast(e, DoubleType), Literal(lo)), Literal(span)),
        Literal(cells.toDouble))), LongType)
      Least(Seq(Literal(cells - 1),
        Greatest(Seq(Literal(0L), scaled))))
    }
    val lonId = quantizeE(lon, -180.0, 360.0, lonBits)
    val latId = quantizeE(lat, -90.0, 180.0, latBits)
    val z =
      if (bits % 2 == 0) ZOrder.zorderKeyExpr(Seq(latId, lonId))
      else ZOrder.zorderKeyExpr(Seq(lonId, latId))
    val alphabet = CreateArray(Base32.map(ch =>
      Literal(ch.toString): Expression))
    Concat((0 until precision).map { i =>
      val group = BitwiseAnd(
        ShiftRightUnsigned(z, Literal(5 * (precision - 1 - i))),
        Literal(31L))
      ElementAt(alphabet,
        Cast(Add(group, Literal(1L)), IntegerType)): Expression
    })
  }

  /** Reference decode for tests: the center `(lat, lon)` of the cell
    * named by `hash` — pure Scala, the textbook bit-walk. */
  private[graft] def decodeRef(hash: String): (Double, Double) = {
    var (latLo, latHi) = (-90.0, 90.0)
    var (lonLo, lonHi) = (-180.0, 180.0)
    var evenBit = true // geohash bit streams start with longitude
    hash.foreach { ch =>
      val idx = Base32.indexOf(ch)
      require(idx >= 0, s"bad geohash char '$ch'")
      (4 to 0 by -1).foreach { b =>
        val bit = (idx >> b) & 1
        if (evenBit) {
          val mid = (lonLo + lonHi) / 2
          if (bit == 1) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bit == 1) latLo = mid else latHi = mid
        }
        evenBit = !evenBit
      }
    }
    ((latLo + latHi) / 2, (lonLo + lonHi) / 2)
  }

  /** Reference encode for tests — the textbook bisection loop,
    * independent of the Morton-interleave spelling above. */
  private[graft] def encodeRef(lat: Double, lon: Double,
      precision: Int): String = {
    checkPrecision(precision)
    var (latLo, latHi) = (-90.0, 90.0)
    var (lonLo, lonHi) = (-180.0, 180.0)
    var evenBit = true
    val sb = new StringBuilder
    var idx = 0
    var bit = 0
    while (sb.length < precision) {
      if (evenBit) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { idx = idx * 2 + 1; lonLo = mid }
        else { idx = idx * 2; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { idx = idx * 2 + 1; latLo = mid }
        else { idx = idx * 2; latHi = mid }
      }
      evenBit = !evenBit
      bit += 1
      if (bit == 5) { sb.append(Base32(idx)); bit = 0; idx = 0 }
    }
    sb.toString
  }
}
