package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.DoubleType

import graft.functions.PointInPolygon

/** Optimizer rule (SURVEY.md §4): any Filter containing a
  * point_in_polygon predicate over a FOLDABLE ring gains the ring's
  * bounding-box comparisons as extra conjuncts. The comparisons are
  * pushable to the parquet scan (row-group pruning!) and short-circuit
  * the O(ring) ray-cast — the reference hand-writes this prefilter
  * (atlxi_xover.py:110-114); here the optimizer injects it so user
  * queries get it for free.
  *
  * Idempotent: conjuncts already present (semantically) are not
  * re-added, so the fixed-point optimizer batch terminates.
  */
object PipBboxInjection extends Rule[LogicalPlan] with PredicateHelper {

  private def foldableDoubles(e: Expression): Option[Array[Double]] =
    if (e.foldable) {
      e.eval() match {
        case a: ArrayData if !a.array.contains(null) =>
          Some(a.toDoubleArray())
        case _ => None
      }
    } else None

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val additions = conjuncts.flatMap {
        case p @ PointInPolygon(xs, ys, px, py) =>
          (foldableDoubles(xs), foldableDoubles(ys)) match {
            case (Some(xa), Some(ya)) if xa.nonEmpty && ya.nonEmpty =>
              Seq(
                GreaterThanOrEqual(px, Literal(xa.min, DoubleType)),
                LessThanOrEqual(px, Literal(xa.max, DoubleType)),
                GreaterThanOrEqual(py, Literal(ya.min, DoubleType)),
                LessThanOrEqual(py, Literal(ya.max, DoubleType)))
            case _ => Nil
          }
        case _ => Nil
      }.filterNot(b => conjuncts.exists(_.semanticEquals(b)))
      if (additions.isEmpty) f
      else Filter(additions.foldLeft(cond)(And), child)
  }
}
