package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{ps3031_lat, ps3031_lon}

/** GeoJSON polygon source/sink (SURVEY.md §2.1 S6/S7; reference reads
  * basin/lake polygons via geopandas at atlxi_lake.py:90-93 and writes
  * detected lakes in EPSG:3031 + 4326 at atlxi_lake.py:304-310).
  *
  * Contract: polygon tables are SMALL (basins/lakes, 10^1-10^3 rows).
  * The source parses distributed (spark.read.json) and yields the
  * engine's ring-array layout (xs/ys double arrays, unclosed); the
  * sink collects to the driver — matching the reference, which also
  * single-file-writes via geopandas — so it must never be pointed at
  * a large table.
  */
object GeoJson {

  /** Read a FeatureCollection of Polygon features into (props..., xs,
    * ys) — outer ring only, closing vertex dropped. Coordinate arrays
    * are cast to array<double> so the source's declared type never
    * depends on what literals happen to be in the file (an all-integral
    * polygon would otherwise be inferred as bigint by spark.read.json).
    *
    * @param props property fields to surface as columns (inferred
    *        types). The default matches this engine's own sink; the
    *        reference's published lake files carry basin_name/
    *        refgtracks/num_points + the dhdt stats instead
    *        (atlxi_lake.py:304-310).
    * @param withIndex prepend a `_fid` column (0-based feature
    *        position). Feature order is the only reliable join key
    *        between a reprojected twin pair of files — the published
    *        lake data has non-unique property tuples (7 duplicated
    *        maxabsdhdt values across its 193 features).
    */
  def readPolygons(spark: SparkSession, path: String,
      props: Seq[String] = Seq("name"), withIndex: Boolean = false): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(path)
    val feats = raw.select(posexplode(col("features")).as(Seq("_fid", "f")))
    // geometry.coordinates: Polygon = ring[][2]; outer ring = [0]
    val ring = element_at(col("f.geometry.coordinates"), 1)
    val open = when(
      element_at(ring, 1) === element_at(ring, size(ring)),
      slice(ring, lit(1), size(ring) - 1)).otherwise(ring)
    feats.select(
      (if (withIndex) Seq(col("_fid").cast("long")) else Nil) ++
        props.map(p => col(s"f.properties.`$p`").as(p)) ++ Seq(
        transform(open, p => element_at(p, 1)).cast("array<double>").as("xs"),
        transform(open, p => element_at(p, 2)).cast("array<double>").as("ys")): _*)
  }

  /** Add lon/lat ring arrays reprojected from EPSG:3031 metres to
    * EPSG:4326 degrees — elementwise inverse polar stereographic,
    * fully columnar (no UDF, no driver round-trip).
    */
  def withLonLatRings(df: DataFrame, xs: String = "xs", ys: String = "ys"): DataFrame =
    df.withColumn("lons", zip_with(col(xs), col(ys), (x, y) => ps3031_lon(x, y)))
      .withColumn("lats", zip_with(col(xs), col(ys), (x, y) => ps3031_lat(x, y)))

  /** Write (name, xs, ys [, props...]) as a GeoJSON FeatureCollection.
    * Driver-side by design (small geometry tables only). Rings are
    * closed on write. Coordinates are emitted with full double
    * round-trip precision.
    */
  def writePolygons(df: DataFrame, path: String,
      xsCol: String = "xs", ysCol: String = "ys", nameCol: String = "name"): Unit = {
    val rows = df.select(col(nameCol).cast("string"), col(xsCol), col(ysCol)).collect()
    // Always emit a decimal point: an all-integral coordinate list would
    // otherwise read back as bigint (JSON schema inference is literal-
    // driven), making the sink's effective schema depend on the data.
    def fmt(d: Double): String =
      if (d == d.toLong.toDouble && math.abs(d) < 1e15) s"${d.toLong}.0" else d.toString
    // JSON string escape for the name property: quotes, backslashes,
    // and control chars would otherwise produce malformed GeoJSON
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val feats = rows.map { r =>
      val name = esc(r.getString(0))
      val xs = r.getSeq[Double](1)
      val ys = r.getSeq[Double](2)
      require(xs.nonEmpty && xs.length == ys.length,
        s"polygon '$name' needs matching non-empty coordinate arrays")
      val closedX = xs :+ xs.head
      val closedY = ys :+ ys.head
      val coords = closedX.zip(closedY)
        .map { case (x, y) => s"[${fmt(x)},${fmt(y)}]" }.mkString("[", ",", "]")
      s"""{"type":"Feature","properties":{"name":"$name"},""" +
        s""""geometry":{"type":"Polygon","coordinates":[$coords]}}"""
    }
    val json = feats.mkString(
      """{"type":"FeatureCollection","features":[""", ",", "]}")
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path), json.getBytes(StandardCharsets.UTF_8))
  }
}
