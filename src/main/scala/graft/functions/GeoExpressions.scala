package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Geo scalar functions — the reference's GEO family tail
  * (datastore/function_definitions.py:4687-4912): geohashEncode/Decode and
  * pointInPolygon (haversine/greatCircle already exist as column aliases).
  * Standard public algorithms: geohash base-32 bit interleaving, ray-casting
  * point-in-polygon. All are per-row scalar kernels (no shuffle impact);
  * CodegenFallback is acceptable off the hot aggregate paths.
  */
object Geohash {
  val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  def encode(lon: Double, lat: Double, precision: Int): String = {
    val sb = new java.lang.StringBuilder(precision)
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    var evenBit = true
    var bits = 0
    var ch = 0
    while (sb.length < precision) {
      if (evenBit) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid } else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid } else { ch = ch << 1; latHi = mid }
      }
      evenBit = !evenBit
      bits += 1
      if (bits == 5) { sb.append(Base32.charAt(ch)); bits = 0; ch = 0 }
    }
    sb.toString
  }

  /** cell-center (lon, lat) of a geohash string. */
  def decode(hash: String): (Double, Double) = {
    var lonLo = -180.0; var lonHi = 180.0
    var latLo = -90.0; var latHi = 90.0
    var evenBit = true
    var i = 0
    while (i < hash.length) {
      val cd = Base32.indexOf(hash.charAt(i).toLower)
      require(cd >= 0, s"invalid geohash char '${hash.charAt(i)}'")
      var b = 4
      while (b >= 0) {
        val bit = (cd >> b) & 1
        if (evenBit) {
          val mid = (lonLo + lonHi) / 2
          if (bit == 1) lonLo = mid else lonHi = mid
        } else {
          val mid = (latLo + latHi) / 2
          if (bit == 1) latLo = mid else latHi = mid
        }
        evenBit = !evenBit
        b -= 1
      }
      i += 1
    }
    ((lonLo + lonHi) / 2, (latLo + latHi) / 2)
  }
}

/** geohashEncode(longitude, latitude[, precision = 12]) → base-32 string. */
case class GeohashEncode(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullSafeEval(lon: Any, lat: Any, prec: Any): Any =
    UTF8String.fromString(Geohash.encode(
      lon.asInstanceOf[Number].doubleValue(),
      lat.asInstanceOf[Number].doubleValue(),
      math.max(1, math.min(12, prec.asInstanceOf[Number].intValue()))))

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): GeohashEncode = copy(f, s, t)
}

/** geohashDecode(str) → struct(longitude, latitude) — the cell center. */
case class GeohashDecode(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("longitude", DoubleType), StructField("latitude", DoubleType)))

  override def nullSafeEval(input: Any): Any = {
    val (lon, lat) = Geohash.decode(input.asInstanceOf[UTF8String].toString)
    InternalRow(lon, lat)
  }

  override protected def withNewChildInternal(c: Expression): GeohashDecode = copy(child = c)
}

/** pointInPolygon(struct(x, y), array(struct(x, y)...)) → boolean, by
  * ray casting (boundary points count as inside on the crossing rule's
  * standard behavior). Polygon is closed implicitly.
  */
case class PointInPolygon(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType

  private def num(row: InternalRow, i: Int, dt: DataType): Double = dt match {
    case DoubleType => row.getDouble(i)
    case FloatType => row.getFloat(i).toDouble
    case IntegerType => row.getInt(i).toDouble
    case LongType => row.getLong(i).toDouble
    case ShortType => row.getShort(i).toDouble
    case d: DecimalType => row.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new IllegalArgumentException(s"non-numeric point field: $other")
  }

  override def nullSafeEval(point: Any, polygon: Any): Any = {
    val pType = left.dataType.asInstanceOf[StructType]
    val p = point.asInstanceOf[InternalRow]
    val px = num(p, 0, pType(0).dataType)
    val py = num(p, 1, pType(1).dataType)
    val arr = polygon.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val elemType = right.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType]
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val a = arr.getStruct(i, elemType.length)
      val b = arr.getStruct(j, elemType.length)
      val (xi, yi) = (num(a, 0, elemType(0).dataType), num(a, 1, elemType(1).dataType))
      val (xj, yj) = (num(b, 0, elemType(0).dataType), num(b, 1, elemType(1).dataType))
      if ((yi > py) != (yj > py) &&
          px < (xj - xi) * (py - yi) / (yj - yi) + xi)
        inside = !inside
      j = i
      i += 1
    }
    inside
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PointInPolygon =
    copy(left = l, right = r)
}
