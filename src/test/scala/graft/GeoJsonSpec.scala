package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Geo
import graft.sources.GeoJson

class GeoJsonSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("name", StringType),
    StructField("xs", ArrayType(DoubleType)),
    StructField("ys", ArrayType(DoubleType))))

  private def polys = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row("alpha", Seq(0.0, 100.5, 100.5, 0.0), Seq(0.0, 0.0, 50.25, 50.25)),
      Row("beta", Seq(-1000.0, -900.0, -950.0), Seq(10.0, 10.0, 99.9)))),
    schema)

  test("write -> read round-trip preserves names, order, exact coordinates") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_geojson_spec.json"
    GeoJson.writePolygons(polys, path)
    val back = GeoJson.readPolygons(spark, path)
      .orderBy("name").collect()
    assert(back.length == 2)
    val a = back(0)
    assert(a.getString(0) == "alpha")
    assert(a.getSeq[Double](1) == Seq(0.0, 100.5, 100.5, 0.0))
    assert(a.getSeq[Double](2) == Seq(0.0, 0.0, 50.25, 50.25))
    val b = back(1)
    assert(b.getSeq[Double](1) == Seq(-1000.0, -900.0, -950.0))
  }

  test("unclosed rings in source files are accepted as-is") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_geojson_open.json"
    val json =
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"name":"open"},
        | "geometry":{"type":"Polygon","coordinates":[[[1,2],[3,4],[5,6]]]}}]}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(path), json.getBytes)
    val back = GeoJson.readPolygons(spark, path).collect()
    assert(back.head.getSeq[Double](1) == Seq(1.0, 3.0, 5.0))
    assert(back.head.getSeq[Double](2) == Seq(2.0, 4.0, 6.0))
  }

  test("3031 -> 4326 ring reprojection matches the scalar inverse kernels") {
    val ring = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("r", Seq(0.0, 100000.0, 200000.0), Seq(-2000000.0, -2100000.0, -1900000.0)))),
      schema)
    val out = GeoJson.withLonLatRings(ring).head()
    val lons = out.getSeq[Double](3)
    val lats = out.getSeq[Double](4)
    for (i <- 0 until 3) {
      val x = out.getSeq[Double](1)(i); val y = out.getSeq[Double](2)(i)
      assert(math.abs(lons(i) - Geo.ps3031Lon(x, y)) == 0.0)
      assert(math.abs(lats(i) - Geo.ps3031Lat(x, y)) == 0.0)
    }
    // sanity: deep-south latitudes
    assert(lats.forall(l => l < -70 && l > -90))
  }
}
