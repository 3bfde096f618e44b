package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Geohash (Niemeyer 2008, the de-facto public spec): interleaved
  * bisection of the lat/lon intervals, 5 bits per base32 character,
  * longitude first. The string face of [[graft.ops.Geo.mortonCellId]]'s
  * integer cell — same bit layout, human/URL-friendly rendering; pinned
  * against the published test vectors (e.g. (57.64911, 10.40744) →
  * "u4pruydqqvj") in GeoSpec.
  */
object Geohash {
  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz".toCharArray

  /** Base32 geohash of (lat, lon) degrees at `chars` characters. */
  def encode(lat: Double, lon: Double, chars: Int): String = {
    val out = new java.lang.StringBuilder(chars)
    var latLo = -90.0; var latHi = 90.0
    var lonLo = -180.0; var lonHi = 180.0
    var isLon = true
    var bit = 0
    var ch = 0
    while (out.length < chars) {
      if (isLon) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      isLon = !isLon
      bit += 1
      if (bit == 5) { out.append(Base32(ch)); bit = 0; ch = 0 }
    }
    out.toString
  }

  def geohash(lat: Column, lon: Column, chars: Int): Column =
    column(GeohashEncode(expression(lat), expression(lon), chars))
}

/** string geohash of (lat, lon) double-degree columns at fixed precision. */
case class GeohashEncode(left: Expression, right: Expression, chars: Int)
    extends BinaryExpression with CodegenFallback {
  require(chars > 0 && chars <= 12, s"geohash precision must be in [1,12]: $chars")
  override def dataType: DataType = StringType
  override def prettyName: String = "geohash"
  override def nullSafeEval(lat: Any, lon: Any): Any =
    UTF8String.fromString(Geohash.encode(
      lat.asInstanceOf[Double], lon.asInstanceOf[Double], chars))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
