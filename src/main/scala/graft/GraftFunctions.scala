package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.Bridge

import graft.functions._

/** SQL surface for the engine's custom Catalyst expressions: register
  * them in a session (`GraftFunctions.register(spark)`) or install
  * globally via `spark.sql.extensions=graft.GraftExtensions` — after
  * which `spark.sql("SELECT ps3031_x(lon, lat) ...")` works exactly
  * like a built-in (codegen included).
  */
object GraftFunctions {

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "ps3031_x" -> (a => PsX(a(0), a(1))),
    "ps3031_y" -> (a => PsY(a(0), a(1))),
    "ps3031_lon" -> (a => PsLon(a(0), a(1))),
    "ps3031_lat" -> (a => PsLat(a(0), a(1))),
    "point_in_polygon" -> (a => PointInPolygon(a(0), a(1), a(2), a(3))),
    "dist_to_ring" -> (a => DistToRing(a(0), a(1), a(2), a(3))),
    "t_pvalue" -> (a => TPValue(a(0), a(1))),
    "t_cdf" -> (a => TCdf(a(0), a(1))),
    "vec_dot" -> (a => VecDot(a(0), a(1))))

  def register(spark: SparkSession): Unit =
    all.foreach { case (n, b) => Bridge.registerFunction(spark, n, b) }
}

/** `--conf spark.sql.extensions=graft.GraftExtensions` installer:
  * SQL functions + the PIP bbox-injection optimizer rule.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (n, b) =>
      ext.injectFunction((FunctionIdentifier(n),
        new ExpressionInfo("graft", n), b))
    }
    ext.injectOptimizerRule(_ => graft.plans.PipBboxInjection)
  }
}
