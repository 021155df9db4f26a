package graft

import graft.functions.Geo

class GraftFunctionsSpec extends SparkSpec {

  test("custom expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT ps3031_x(-56.7D, -71.3D) AS x,
        |       ps3031_y(-56.7D, -71.3D) AS y,
        |       point_in_polygon(array(0D,4D,4D,0D), array(0D,0D,4D,4D), 2D, 2D) AS inside,
        |       dist_to_ring(array(0D,4D,4D,0D), array(0D,0D,4D,4D), 6D, 2D) AS d,
        |       round(t_cdf(0D, 5D), 6) AS half,
        |       zorder_key(5, 9) AS zk
        |""".stripMargin).head()
    assert(r.getDouble(0) == Geo.ps3031X(-56.7, -71.3))
    assert(r.getDouble(1) == Geo.ps3031Y(-56.7, -71.3))
    assert(r.getBoolean(2))
    assert(math.abs(r.getDouble(3) - 2.0) < 1e-12)
    assert(math.abs(r.getDouble(4) - 0.5) < 1e-12)
    assert(r.getLong(5) == Geo.zorder(5, 9))
  }

  test("nfc_normalize: decomposed recomposes, NFC text passes through, SQL-callable") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT nfc_normalize('café') AS recomposed,
        |       nfc_normalize('café') AS untouched,
        |       nfc_normalize('plain ascii') AS ascii,
        |       nfc_normalize(CAST(NULL AS STRING)) AS n
        |""".stripMargin).head()
    assert(r.getString(0) == "caf\u00e9")
    assert(r.getString(1) == "caf\u00e9")
    assert(r.getString(2) == "plain ascii")
    assert(r.isNullAt(3))
    // wrong arity is a named error, not an IndexOutOfBoundsException
    val e = intercept[Exception] { spark.sql("SELECT nfc_normalize('a', 'b')").head() }
    assert(e.getMessage.contains("nfc_normalize"))
    // the SQL path casts inputs like the Column wrappers do: a
    // non-string argument resolves via cast instead of throwing a
    // runtime ClassCastException
    assert(spark.sql("SELECT nfc_normalize(123) AS s").head().getString(0) == "123")
    assert(spark.sql("SELECT t_cdf(0, 5) AS c").head().getDouble(0) == 0.5)
  }

  test("registered functions round-trip through SQL on a temp view") {
    GraftFunctions.register(spark)
    Tables(spark, sf001, "lineitem").limit(100).createOrReplaceTempView("li_100")
    val n = spark.sql(
      """SELECT count(*) FROM li_100
        |WHERE point_in_polygon(array(0D, 100D, 100D, 0D), array(0D, 0D, 60D, 60D),
        |                       l_quantity, l_discount * 100)
        |""".stripMargin).head().getLong(0)
    assert(n > 0, "some lineitem rows must fall in the test polygon")
  }
}
