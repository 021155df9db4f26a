package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, LongType}

/** Geodesy + planar geometry kernels.
  *
  * Polar stereographic follows EPSG method 9829 (Variant B, south
  * aspect) on WGS84 — the reference's `lonlat_to_xy` wraps proj
  * EPSG:3031 (/root/reference/deepicedrain/spatiotemporal.py:179-216).
  * Implementation validated against the published EPSG Guidance Note
  * 7-2 worked example (lat_ts=-71, lon0=70E: (120E, 75S) ->
  * E 7255380.79, N 7053389.56) in GeoSpec.
  *
  * All kernels are pure static double math — called from codegen'd
  * Catalyst expressions below.
  */
object Geo {

  /** Spread the low 32 bits of `v` to the even bit positions (the
    * standard magic-number Morton spread; 5 shift-mask rounds).
    */
  def zspread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton/Z-order interleave: x at even bit positions, y at odd. */
  def zorder(x: Long, y: Long): Long =
    zspread(x) | (zspread(y) << 1)

  // WGS84
  private val A = 6378137.0
  private val Flat = 1.0 / 298.257223563
  private val E2 = 2.0 * Flat - Flat * Flat
  private val E = math.sqrt(E2)
  private val PowE = math.sqrt(math.pow(1 + E, 1 + E) * math.pow(1 - E, 1 - E))

  private def tOf(phi: Double): Double =
    math.tan(math.Pi / 4 + phi / 2) /
      math.pow((1 + E * math.sin(phi)) / (1 - E * math.sin(phi)), E / 2)

  /** Scale factor at the pole implied by the true-scale latitude. */
  def k0(latTsDeg: Double): Double = {
    val phiF = math.toRadians(latTsDeg)
    val mF = math.cos(phiF) / math.sqrt(1 - E2 * math.sin(phiF) * math.sin(phiF))
    mF * PowE / (2 * tOf(phiF))
  }

  /** Parameterized forward projection (south aspect), returns (E, N). */
  def forward(lonDeg: Double, latDeg: Double, lon0Deg: Double,
      latTsDeg: Double, fe: Double, fn: Double): (Double, Double) = {
    val rho = 2 * A * k0(latTsDeg) * tOf(math.toRadians(latDeg)) / PowE
    val th = math.toRadians(lonDeg) - math.toRadians(lon0Deg)
    (fe + rho * math.sin(th), fn + rho * math.cos(th))
  }

  /** Parameterized inverse projection, returns (lon, lat) degrees. */
  def inverse(x: Double, y: Double, lon0Deg: Double, latTsDeg: Double,
      fe: Double, fn: Double): (Double, Double) = {
    val rho = math.hypot(x - fe, y - fn)
    val t = rho * PowE / (2 * A * k0(latTsDeg))
    var phi = 2 * math.atan(t) - math.Pi / 2
    var i = 0
    while (i < 8) {
      phi = 2 * math.atan(t * math.pow(
        (1 + E * math.sin(phi)) / (1 - E * math.sin(phi)), E / 2)) - math.Pi / 2
      i += 1
    }
    val lam = math.toRadians(lon0Deg) + math.atan2(x - fe, y - fn)
    (math.toDegrees(lam), math.toDegrees(phi))
  }

  // EPSG:3031 constants (lon0=0, lat_ts=-71, FE=FN=0)
  private val K3031 = k0(-71.0)

  def ps3031X(lonDeg: Double, latDeg: Double): Double = {
    val rho = 2 * A * K3031 * tOf(math.toRadians(latDeg)) / PowE
    rho * math.sin(math.toRadians(lonDeg))
  }

  def ps3031Y(lonDeg: Double, latDeg: Double): Double = {
    val rho = 2 * A * K3031 * tOf(math.toRadians(latDeg)) / PowE
    rho * math.cos(math.toRadians(lonDeg))
  }

  def ps3031Lon(x: Double, y: Double): Double =
    math.toDegrees(math.atan2(x, y))

  def ps3031Lat(x: Double, y: Double): Double = {
    val t = math.hypot(x, y) * PowE / (2 * A * K3031)
    var phi = 2 * math.atan(t) - math.Pi / 2
    var i = 0
    while (i < 8) {
      phi = 2 * math.atan(t * math.pow(
        (1 + E * math.sin(phi)) / (1 - E * math.sin(phi)), E / 2)) - math.Pi / 2
      i += 1
    }
    math.toDegrees(phi)
  }

  /** Ray-casting point-in-polygon over parallel coordinate arrays
    * (ring NOT closed — last->first edge is implicit). Strict
    * even-odd rule; replaces the reference's cuspatial
    * point_in_polygon (spatiotemporal.py:219-307) without its
    * 31-polygon GPU batching workaround.
    */
  def pointInPolygon(xs: ArrayData, ys: ArrayData, px: Double, py: Double): Boolean = {
    val n = xs.numElements()
    // getDouble past an UnsafeArrayData's end is an unchecked read of
    // adjacent buffer memory, not an exception — reject malformed
    // rings loudly instead of returning garbage containment
    require(ys.numElements() == n,
      s"ring arrays length mismatch: xs=$n ys=${ys.numElements()}")
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = xs.getDouble(i); val yi = ys.getDouble(i)
      val xj = xs.getDouble(j); val yj = ys.getDouble(j)
      if (((yi > py) != (yj > py)) &&
        (px < (xj - xi) * (py - yi) / (yj - yi) + xi)) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Squared distance from point to the polygon boundary (for the
    * reference's 5 km buffer-ring "donut" membership,
    * atlxi_lake.py:251-256).
    */
  def distToRingSq(xs: ArrayData, ys: ArrayData, px: Double, py: Double): Double = {
    val n = xs.numElements()
    require(ys.numElements() == n,
      s"ring arrays length mismatch: xs=$n ys=${ys.numElements()}")
    var best = Double.MaxValue
    var i = 0
    var j = n - 1
    while (i < n) {
      val x1 = xs.getDouble(j); val y1 = ys.getDouble(j)
      val x2 = xs.getDouble(i); val y2 = ys.getDouble(i)
      val dx = x2 - x1; val dy = y2 - y1
      val len2 = dx * dx + dy * dy
      val t = if (len2 == 0) 0.0
        else math.max(0.0, math.min(1.0, ((px - x1) * dx + (py - y1) * dy) / len2))
      val ex = x1 + t * dx - px
      val ey = y1 + t * dy - py
      val d = ex * ex + ey * ey
      if (d < best) best = d
      j = i
      i += 1
    }
    best
  }
}

/** EPSG:3031 forward easting. Children: lon, lat (degrees, double). */
case class PsX(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ps3031_x"
  override protected def nullSafeEval(lon: Any, lat: Any): Any =
    Geo.ps3031X(lon.asInstanceOf[Double], lat.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Geo.ps3031X($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PsX =
    copy(left = l, right = r)
}

/** EPSG:3031 forward northing. Children: lon, lat (degrees, double). */
case class PsY(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ps3031_y"
  override protected def nullSafeEval(lon: Any, lat: Any): Any =
    Geo.ps3031Y(lon.asInstanceOf[Double], lat.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Geo.ps3031Y($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PsY =
    copy(left = l, right = r)
}

/** EPSG:3031 inverse longitude. Children: x, y (metres, double). */
case class PsLon(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ps3031_lon"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    Geo.ps3031Lon(x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Geo.ps3031Lon($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PsLon =
    copy(left = l, right = r)
}

/** EPSG:3031 inverse latitude. Children: x, y (metres, double). */
case class PsLat(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ps3031_lat"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    Geo.ps3031Lat(x.asInstanceOf[Double], y.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Geo.ps3031Lat($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PsLat =
    copy(left = l, right = r)
}

/** Ray-casting containment predicate. Children: xs, ys (array<double>
  * polygon ring, unclosed), px, py (point coords).
  */
case class PointInPolygon(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "point_in_polygon"
  override protected def nullSafeEval(xs: Any, ys: Any, px: Any, py: Any): Any =
    Geo.pointInPolygon(xs.asInstanceOf[ArrayData], ys.asInstanceOf[ArrayData],
      px.asInstanceOf[Double], py.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (xs, ys, px, py) =>
      s"graft.functions.Geo.pointInPolygon($xs, $ys, $px, $py)")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): PointInPolygon =
    copy(first = a, second = b, third = c, fourth = d)
}

/** Distance from point to polygon boundary (metres). Same children
  * shape as [[PointInPolygon]].
  */
case class DistToRing(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dist_to_ring"
  override protected def nullSafeEval(xs: Any, ys: Any, px: Any, py: Any): Any =
    math.sqrt(Geo.distToRingSq(xs.asInstanceOf[ArrayData], ys.asInstanceOf[ArrayData],
      px.asInstanceOf[Double], py.asInstanceOf[Double]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (xs, ys, px, py) =>
      s"java.lang.Math.sqrt(graft.functions.Geo.distToRingSq($xs, $ys, $px, $py))")
  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): DistToRing =
    copy(first = a, second = b, third = c, fourth = d)
}

/** Morton/Z-order interleave of two non-negative cell indices — the
  * data-layout key that makes spatial range scans cheap at 100 TB:
  * sorting (or range-partitioning) a write by this key clusters
  * spatially adjacent points into the same files/row groups, so the
  * ordinary parquet min/max stats on the ORIGINAL x/y columns prune a
  * bbox query down to the touched tiles. Children: xcell, ycell
  * (long; low 32 bits each are interleaved, x at even bit positions).
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    Geo.zorder(x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.Geo.zorder($x, $y)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrderKey =
    copy(left = l, right = r)
}
