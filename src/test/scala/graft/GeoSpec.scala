package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Geo, dist_to_ring, point_in_polygon, ps3031_x, ps3031_y}
import graft.ops.SpatioTemporal

/** Geodesy + planar geometry validation.
  *
  * Forward/inverse polar stereographic checked against the EPSG
  * Guidance Note 7-2 worked example for method 9829 (Variant B, south
  * aspect): lat_ts=-71, lon0=70E, FE=FN=6000000 → (120°E, 75°S) maps
  * to E 7255380.79 m, N 7053389.56 m. EPSG:3031 uses the same method
  * with lon0=0, FE=FN=0.
  */
class GeoSpec extends SparkSpec {

  test("EPSG 9829 worked example (GN7-2): forward") {
    val (e, n) = graft.functions.Geo.forward(
      lonDeg = 120.0, latDeg = -75.0,
      lon0Deg = 70.0, latTsDeg = -71.0, fe = 6000000.0, fn = 6000000.0)
    assert(math.abs(e - 7255380.79) < 0.02, s"easting $e")
    assert(math.abs(n - 7053389.56) < 0.02, s"northing $n")
  }

  test("EPSG 9829 worked example: inverse") {
    val (lon, lat) = graft.functions.Geo.inverse(
      7255380.79, 7053389.56, lon0Deg = 70.0, latTsDeg = -71.0,
      fe = 6000000.0, fn = 6000000.0)
    assert(math.abs(lon - 120.0) < 1e-7, s"lon $lon")
    assert(math.abs(lat - (-75.0)) < 1e-7, s"lat $lat")
  }

  test("EPSG:3031 forward/inverse round-trip over Antarctica") {
    for (lon <- Seq(-180.0, -120.0, -45.0, 0.0, 60.0, 135.0, 179.5);
         lat <- Seq(-60.0, -71.0, -80.0, -89.0)) {
      val x = Geo.ps3031X(lon, lat)
      val y = Geo.ps3031Y(lon, lat)
      val lat2 = Geo.ps3031Lat(x, y)
      val lon2 = Geo.ps3031Lon(x, y)
      assert(math.abs(lat2 - lat) < 1e-9, s"lat rt ($lon,$lat)")
      val dLon = math.abs((lon2 - lon + 540) % 360 - 180)
      assert(dLon < 1e-9, s"lon rt ($lon,$lat) -> $lon2")
    }
  }

  test("EPSG:3031 as Catalyst expressions matches scalar kernels") {
    val df = spark.range(1).select(
      ps3031_x(lit(-56.7), lit(-71.3)).as("x"),
      ps3031_y(lit(-56.7), lit(-71.3)).as("y"))
    val r = df.head()
    assert(math.abs(r.getDouble(0) - Geo.ps3031X(-56.7, -71.3)) == 0.0)
    assert(math.abs(r.getDouble(1) - Geo.ps3031Y(-56.7, -71.3)) == 0.0)
  }

  test("point_in_polygon: unit square incl. edge cases") {
    // unclosed ring: (0,0) (4,0) (4,4) (0,4)
    val schema = StructType(Seq(
      StructField("xs", ArrayType(DoubleType)),
      StructField("ys", ArrayType(DoubleType)),
      StructField("px", DoubleType),
      StructField("py", DoubleType),
      StructField("expect", BooleanType)))
    val ring = (Seq(0.0, 4.0, 4.0, 0.0), Seq(0.0, 0.0, 4.0, 4.0))
    val cases = Seq(
      (2.0, 2.0, true),   // interior
      (5.0, 2.0, false),  // outside right
      (-1.0, 2.0, false), // outside left
      (2.0, 8.0, false),  // above
      (3.999999, 3.999999, true),
      (4.000001, 2.0, false))
    val rows = cases.map { case (px, py, e) => Row(ring._1, ring._2, px, py, e) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val bad = df.filter(
      point_in_polygon(col("xs"), col("ys"), col("px"), col("py")) =!= col("expect"))
    assert(bad.count() === 0)
  }

  test("point_in_polygon agrees with brute-force on a random concave ring") {
    // deterministic pseudo-random star polygon + point grid
    val n = 12
    val rng = new scala.util.Random(42)
    val rs = Array.fill(n)(1.0 + rng.nextDouble() * 3.0)
    val xs = Array.tabulate(n)(i => rs(i) * math.cos(2 * math.Pi * i / n))
    val ys = Array.tabulate(n)(i => rs(i) * math.sin(2 * math.Pi * i / n))
    def brute(px: Double, py: Double): Boolean = {
      var inside = false; var j = n - 1
      for (i <- 0 until n) {
        if (((ys(i) > py) != (ys(j) > py)) &&
          (px < (xs(j) - xs(i)) * (py - ys(i)) / (ys(j) - ys(i)) + xs(i)))
          inside = !inside
        j = i
      }
      inside
    }
    val pts = for (gx <- -8 to 8; gy <- -8 to 8) yield (gx * 0.5 + 0.01, gy * 0.5 + 0.02)
    val schema = StructType(Seq(
      StructField("px", DoubleType), StructField("py", DoubleType),
      StructField("expect", BooleanType)))
    val rows = pts.map { case (px, py) => Row(px, py, brute(px, py)) }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
      .withColumn("xs", lit(xs)).withColumn("ys", lit(ys))
    val bad = df.filter(
      point_in_polygon(col("xs"), col("ys"), col("px"), col("py")) =!= col("expect"))
    assert(bad.count() === 0)
  }

  test("dist_to_ring: exact distances on the unit square") {
    val df = spark.range(1).select(
      dist_to_ring(lit(Array(0.0, 4.0, 4.0, 0.0)), lit(Array(0.0, 0.0, 4.0, 4.0)),
        lit(6.0), lit(2.0)).as("d1"),   // 2 right of edge x=4
      dist_to_ring(lit(Array(0.0, 4.0, 4.0, 0.0)), lit(Array(0.0, 0.0, 4.0, 4.0)),
        lit(7.0), lit(8.0)).as("d2"))   // corner (4,4) -> 5
    val r = df.head()
    assert(math.abs(r.getDouble(0) - 2.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 5.0) < 1e-12)
  }

  test("deltatimeToUtc: exact µs at year-scale ns offsets (integer div)") {
    // 2^53-breaking offset: 500 days in ns + 1.5 µs
    val deltaNs = 500L * 86400L * 1000000000L + 1500L
    val df = spark.range(1).select(
      SpatioTemporal.deltatimeToUtc(lit(deltaNs)).as("t"))
    val got = df.head().getTimestamp(0).toInstant
    val wantUs = SpatioTemporal.AtlasEpochUs + deltaNs / 1000L
    assert(got.getEpochSecond === wantUs / 1000000L)
    assert(got.getNano === (wantUs % 1000000L) * 1000L)
  }
}
