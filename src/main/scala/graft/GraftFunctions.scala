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

  // arity-checked builders: a wrong-arity SQL call gets a message
  // naming the function, not an IndexOutOfBoundsException from a(1)
  private def arity1(n: String)(f: Expression => Expression)
      : Seq[Expression] => Expression = {
    case Seq(x) => f(x)
    case args => throw new IllegalArgumentException(
      s"$n expects 1 argument, got ${args.length}")
  }
  private def arity2(n: String)(f: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(x, y) => f(x, y)
    case args => throw new IllegalArgumentException(
      s"$n expects 2 arguments, got ${args.length}")
  }
  private def arity4(n: String)(
      f: (Expression, Expression, Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b, c, d) => f(a, b, c, d)
    case args => throw new IllegalArgumentException(
      s"$n expects 4 arguments, got ${args.length}")
  }

  // The SQL path must apply the same input casts the Column wrappers
  // in graft.functions do (ExpectsInputTypes is closed to third-party
  // packages in Spark 4 — AbstractDataType is private[sql]): without
  // them a call like nfc_normalize(123) passes analysis and dies at
  // runtime with a ClassCastException instead of resolving via cast.
  private def dbl(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.DoubleType)
  private def str(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.StringType)
  private def lng(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.LongType)

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "ps3031_x" -> arity2("ps3031_x")((a, b) => PsX(dbl(a), dbl(b))),
    "ps3031_y" -> arity2("ps3031_y")((a, b) => PsY(dbl(a), dbl(b))),
    "ps3031_lon" -> arity2("ps3031_lon")((a, b) => PsLon(dbl(a), dbl(b))),
    "ps3031_lat" -> arity2("ps3031_lat")((a, b) => PsLat(dbl(a), dbl(b))),
    "point_in_polygon" -> arity4("point_in_polygon")(
      (xs, ys, px, py) => PointInPolygon(xs, ys, dbl(px), dbl(py))),
    "dist_to_ring" -> arity4("dist_to_ring")(
      (xs, ys, px, py) => DistToRing(xs, ys, dbl(px), dbl(py))),
    "t_pvalue" -> arity2("t_pvalue")((a, b) => TPValue(dbl(a), dbl(b))),
    "t_cdf" -> arity2("t_cdf")((a, b) => TCdf(dbl(a), dbl(b))),
    "vec_dot" -> arity2("vec_dot")(VecDot),
    "nfc_normalize" -> arity1("nfc_normalize")(e => NfcNormalize(str(e))),
    "zorder_key" -> arity2("zorder_key")((a, b) => ZOrderKey(lng(a), lng(b))))

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
